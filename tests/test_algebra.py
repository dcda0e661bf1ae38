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
    # if_ propagates a NULL condition to NULL output (GRASS r.mapcalc:
    # if(null(), a, b) is null, never the else arm)
    fn2 = algebra.compile_expr("if_(a > 300, a - 273.15, b)", ["a", "b"])
    got2 = fn2(env)
    exp2 = np.where(np.isnan(exp), np.nan,
                    np.where(np.nan_to_num(exp) != 0, a - 273.15, b))
    np.testing.assert_array_equal(got2, exp2)
    assert np.isnan(got2[np.isnan(a)]).all()
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


# --- raster resampling ----------------------------------------------------------


def _resample_naive(x, oh, ow, method):
    h, w = x.shape
    out = np.empty((oh, ow))
    for i in range(oh):
        for j in range(ow):
            sy = (i + 0.5) * h / oh - 0.5
            sx = (j + 0.5) * w / ow - 0.5
            if method == "nearest":
                out[i, j] = x[min(max(int(round(sy)), 0), h - 1),
                              min(max(int(round(sx)), 0), w - 1)]
            else:
                y0 = min(max(int(np.floor(sy)), 0), h - 1)
                x0 = min(max(int(np.floor(sx)), 0), w - 1)
                y1 = min(y0 + 1, h - 1)
                x1 = min(x0 + 1, w - 1)
                fy = min(max(sy - y0, 0.0), 1.0)
                fx = min(max(sx - x0, 0.0), 1.0)
                out[i, j] = (x[y0, x0] * (1 - fy) * (1 - fx)
                             + x[y0, x1] * (1 - fy) * fx
                             + x[y1, x0] * fy * (1 - fx)
                             + x[y1, x1] * fy * fx)
    return out


@pytest.mark.parametrize("method", ["nearest", "bilinear"])
@pytest.mark.parametrize("shape", [(8, 6, 16, 12), (16, 12, 8, 6), (10, 10, 15, 7)])
def test_resample_plane_matches_naive(method, shape):
    h, w, oh, ow = shape
    rng = np.random.default_rng(81)
    x = rng.uniform(250, 330, (h, w))
    x[rng.random(x.shape) < 0.15] = np.nan
    got = algebra.resample_plane(x, oh, ow, method)
    exp = _resample_naive(x, oh, ow, method)
    np.testing.assert_allclose(got, exp, rtol=1e-12, equal_nan=True)


def test_resample_identity_and_null_propagation():
    rng = np.random.default_rng(82)
    x = rng.uniform(0, 1, (9, 9))
    # scale 1 with cell-center alignment is the identity for both methods
    for method in ("nearest", "bilinear"):
        np.testing.assert_array_equal(algebra.resample_plane(x, 9, 9, method), x)
    # bilinear: NaN corner poisons exactly the outputs that touch it
    x[4, 4] = np.nan
    up = algebra.resample_plane(x, 18, 18, "bilinear")
    assert np.isnan(up[8:10, 8:10]).all()
    assert np.isfinite(up[:7, :7]).all()


def test_resample_tiles_spark(spark):
    rng = np.random.default_rng(83)
    rows = []
    for tx in range(2):
        t = rng.uniform(250, 330, (16, 16))
        rows.append({"scene_id": "S", "tile_x": tx, "tile_y": 0,
                     "w": 16, "h": 16, "lst_bytes": t.astype("<f4").tobytes()})
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    out = algebra.resample_tiles(tiles, scale=0.5, method="bilinear").toPandas()
    assert len(out) == 2 and (out.w == 8).all() and (out.h == 8).all()
    src = {r["tile_x"]: np.frombuffer(r["lst_bytes"], dtype="<f4").reshape(16, 16).astype(np.float64)
           for r in rows}
    for r in out.itertuples():
        exp = algebra.resample_plane(src[r.tile_x], 8, 8, "bilinear")
        got = np.frombuffer(r.out_bytes, dtype="<f4").reshape(8, 8)
        np.testing.assert_array_equal(got, exp.astype(np.float32))


# ---- r.reclass -------------------------------------------------------------

def test_reclass_parser_and_plane():
    from i_landsat8_swlst_spark import algebra as A

    rules = A.parse_reclass_rules("""
        # comment line
        1 2 3 = 10 water bodies
        5 thru 8 = 20
        2 = 99       # shadowed: first match wins
        30 thru 40 = NULL
        * = 0
    """)
    x = np.array([[1., 2, 3, 4, 5, 8, 9, 35, np.nan]])
    got = A.reclass_plane(x, rules)
    want = np.array([[10., 10, 10, 0, 20, 20, 0, np.nan, np.nan]])
    assert np.array_equal(got, want, equal_nan=True)
    # without a star rule, unmatched categories go NULL (r.reclass)
    r2 = A.parse_reclass_rules("1 = 5")
    assert np.isnan(A.reclass_plane(np.array([[2.0]]), r2))[0, 0]
    for bad in ["", "1 2", "a = 5", "5 thru 2 = 1", "1 = "]:
        with pytest.raises(ValueError):
            A.parse_reclass_rules(bad)


def test_reclass_tiles_end_to_end(spark):
    from i_landsat8_swlst_spark import algebra as A

    rng = np.random.default_rng(3)
    plane = rng.integers(0, 50, (16, 16)).astype(np.float32)
    plane[0, 0] = np.nan
    rows = [{"image_id": "S0/0_0", "scene_id": "S0", "tile_x": 0,
             "tile_y": 0, "w": 16, "h": 16,
             "lst_bytes": plane.tobytes()}]
    df = spark.createDataFrame(pd.DataFrame(rows))
    text = "0 thru 9 = 1\n10 thru 29 = 2\n* = 3"
    out = A.reclass_tiles(df, text).toPandas()
    got = np.frombuffer(out.iloc[0].out_bytes, "<f4").reshape(16, 16)
    want = A.reclass_plane(plane.astype(np.float64),
                           A.parse_reclass_rules(text)).astype(np.float32)
    assert np.array_equal(got, want, equal_nan=True)
    assert out.iloc[0].n_valid == int(np.isfinite(want).sum())
    with pytest.raises(ValueError, match="exactly one"):
        A.reclass_tiles(df, text, inputs={"a": "x", "b": "y"})
