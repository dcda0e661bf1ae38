"""Map-algebra expression compiler + Spark hop: numpy parity, r.mapcalc
NULL semantics, and the security whitelist."""

import numpy as np
import pandas as pd
import pytest

from i_landsat8_swlst_spark import algebra, constants as C, pipeline, synth

WINDOW = 5


def _env(seed=71):
    rng = np.random.default_rng(seed)
    a = rng.uniform(250, 330, (9, 7))
    b = rng.uniform(0, 6, (9, 7))
    a[rng.random(a.shape) < 0.2] = np.nan
    b[rng.random(b.shape) < 0.2] = np.nan
    return {"a": a, "b": b}


@pytest.mark.parametrize("expr,ref", [
    ("a - 273.15", lambda e: e["a"] - 273.15),
    ("a * 2 + b / 3 - 1", lambda e: e["a"] * 2 + e["b"] / 3 - 1),
    # the compiler's ** is np.power with a float literal; ndarray.__pow__
    # special-cases small exponents (a * a), ~1 ulp apart — compare like
    # for like
    ("a ** 2 % 7", lambda e: np.power(e["a"], 2.0) % 7),
    ("-a + abs(b - 3)", lambda e: -e["a"] + np.abs(e["b"] - 3)),
    ("sqrt(abs(a)) + exp(b / 10) + log(a)", lambda e: np.sqrt(np.abs(e["a"])) + np.exp(e["b"] / 10) + np.log(e["a"])),
    ("min(a, 300.0) + max(b, 2.5)", lambda e: np.minimum(e["a"], 300.0) + np.maximum(e["b"], 2.5)),
    ("floor(a) + ceil(b) + round(a)", lambda e: np.floor(e["a"]) + np.ceil(e["b"]) + np.round(e["a"])),
    ("pow(b, 2)", lambda e: np.power(e["b"], 2)),
])
def test_expr_matches_numpy(expr, ref):
    env = _env()
    fn = algebra.compile_expr(expr, ["a", "b"])
    np.testing.assert_array_equal(fn(env), ref(env))


def test_comparison_and_if_null_semantics():
    env = _env()
    a, b = env["a"], env["b"]
    # comparisons: 0/1 planes, NULL where an operand is NULL
    fn = algebra.compile_expr("a > 300", ["a", "b"])
    got = fn(env)
    exp = np.where(np.isnan(a), np.nan, (a > 300).astype(float))
    np.testing.assert_array_equal(got, exp)
    # if_ treats NULL condition as false (nan_to_num) -> takes the else arm
    fn2 = algebra.compile_expr("if_(a > 300, a - 273.15, null())", ["a", "b"])
    got2 = fn2(env)
    sel = np.nan_to_num(exp) != 0
    exp2 = np.where(sel, a - 273.15, np.nan)
    np.testing.assert_array_equal(got2, exp2)
    # and/or combine 0/1 planes via min/max
    fn3 = algebra.compile_expr("(a > 300) and (b < 3)", ["a", "b"])
    ca = np.where(np.isnan(a), np.nan, (a > 300).astype(float))
    cb = np.where(np.isnan(b), np.nan, (b < 3).astype(float))
    np.testing.assert_array_equal(fn3(env), np.minimum(ca, cb))


@pytest.mark.parametrize("bad", [
    "__import__('os').system('x')",
    "a.__class__",
    "a[0]",
    "(lambda: 1)()",
    "unknown_raster + 1",
    "open('/etc/passwd')",
    "'str' + 'cat'",
    "a if b else a",
    "[x for x in a]",
])
def test_hostile_expressions_rejected(bad):
    with pytest.raises((ValueError, SyntaxError)):
        algebra.compile_expr(bad, ["a", "b"])


def test_map_algebra_spark_hop(spark):
    scenes = spark.createDataFrame(synth.scenes_pdf("tiny"))
    meta = spark.createDataFrame(synth.scene_meta_pdf("tiny"))
    emis = spark.createDataFrame(pd.DataFrame([e._asdict() for e in C.load_emissivities()]))
    tiles = pipeline.lst_tiles(pipeline.build_enriched(scenes, meta, emis),
                               window=WINDOW)
    expr = "if_((lst > 290) and (cwv < 5), lst - 273.15, null())"
    out = algebra.map_algebra(tiles, expr).filter("scene_id = 'LC08_00001'")
    src = tiles.filter("scene_id = 'LC08_00001'").select(
        "tile_x", "tile_y", "w", "h", "lst_bytes", "cwv_bytes")
    op = out.toPandas().merge(src.toPandas(), on=["tile_x", "tile_y"],
                              validate="1:1", suffixes=("", "_s"))
    assert len(op) > 0
    fn = algebra.compile_expr(expr, ["lst", "cwv"])
    for r in op.itertuples():
        lst = np.frombuffer(r.lst_bytes, dtype="<f4").reshape(r.h, r.w).astype(np.float64)
        cwv = np.frombuffer(r.cwv_bytes, dtype="<f4").reshape(r.h, r.w).astype(np.float64)
        exp = fn({"lst": lst, "cwv": cwv})
        got = np.frombuffer(r.out_bytes, dtype="<f4").reshape(r.h, r.w)
        np.testing.assert_array_equal(got, exp.astype(np.float32))
        assert r.n_valid == int(np.isfinite(exp).sum())
