"""Distributed PCA (i.pca analog) vs the whole-scene numpy oracle.

The oracle recomputes everything serially from the mosaicked planes:
mask rows with any NaN, np.cov (ddof=1), eigh, identical sign convention.
Spark's cross-tile sum order is nondeterministic, so comparisons use
1e-8 relative tolerance (per-tile partials are exact f64)."""

import numpy as np
import pandas as pd
import pytest

from i_landsat8_swlst_spark import multiband

BANDS = ["b1_bytes", "b2_bytes", "b3_bytes", "b4_bytes"]


def _synth_tiles(spark, seed=7, scenes=("S0", "S1"), tw=16, th=12,
                 nx=3, ny=2):
    """Ragged multi-band tile table with NaN holes; returns (df, mosaics)
    where mosaics[scene] is the (H, W, B) whole-scene stack."""
    rng = np.random.default_rng(seed)
    rows, mosaics = [], {}
    for s in scenes:
        H, W = th * ny + 5, tw * nx + 7  # ragged right/bottom edges
        stack = rng.normal(300.0, 25.0, (H, W, len(BANDS)))
        # correlate bands so eigenvalues are distinct and loadings real
        for b in range(1, len(BANDS)):
            stack[:, :, b] = 0.6 * stack[:, :, 0] + (0.2 + 0.3 * b) * stack[:, :, b]
        stack[rng.random((H, W)) < 0.07] = np.nan  # all-band holes
        # single-band holes must also invalidate the pixel
        hole = rng.random((H, W)) < 0.04
        stack[hole, 2] = np.nan
        mosaics[s] = stack
        for ty in range(ny + 1):
            for tx in range(nx + 1):
                y0, x0 = ty * th, tx * tw
                t = stack[y0:y0 + th, x0:x0 + tw]
                if t.size == 0:
                    continue
                h, w = t.shape[:2]
                row = {"image_id": f"{s}-img", "scene_id": s,
                       "tile_x": tx, "tile_y": ty, "w": w, "h": h}
                for b, c in enumerate(BANDS):
                    row[c] = t[:, :, b].astype("<f4").tobytes()
                rows.append(row)
    return spark.createDataFrame(pd.DataFrame(rows)), mosaics


def _oracle(stack, k):
    x = stack.reshape(-1, stack.shape[2]).astype(np.float64)
    # f32-quantized exactly as the planes are stored
    x = x.astype(np.float32).astype(np.float64)
    x = x[np.isfinite(x).all(axis=1)]
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    for j in range(k):
        if vecs[np.argmax(np.abs(vecs[:, j])), j] < 0:
            vecs[:, j] = -vecs[:, j]
    return x.shape[0], mean, vecs, vals


def test_pca_matches_whole_scene_numpy(spark):
    df, mosaics = _synth_tiles(spark)
    out, model = multiband.pca_tiles(df, BANDS, k=3)
    pdf = out.toPandas()
    for s, stack in mosaics.items():
        n, mean, vecs, vals = _oracle(stack, 3)
        m = model[s]
        assert np.allclose(m["mean"], mean, rtol=1e-8)
        assert np.allclose(m["eigvals"], vals, rtol=1e-8)
        assert np.allclose(m["components"], vecs, rtol=1e-7, atol=1e-10)
        assert 0.0 < sum(m["explained"]) < 1.0 + 1e-12  # k=3 of 4 bands
        # projected planes: rebuild the mosaic from tiles, compare pixelwise
        sp = pdf[pdf.scene_id == s]
        assert int(sp.n_valid.sum()) == n
        H, W = stack.shape[:2]
        for i in (1, 2, 3):
            got = np.full((H, W), np.nan, dtype=np.float32)
            for _, r in sp.iterrows():
                p = np.frombuffer(r[f"pc{i}_bytes"], "<f4").reshape(r.h, r.w)
                got[r.tile_y * 12:r.tile_y * 12 + r.h,
                    r.tile_x * 16:r.tile_x * 16 + r.w] = p
            xs = stack.reshape(-1, 4).astype(np.float32).astype(np.float64)
            ok = np.isfinite(xs).all(axis=1)
            exp = np.full(H * W, np.nan)
            exp[ok] = (xs[ok] - mean) @ vecs[:, i - 1]
            exp = exp.reshape(H, W)
            assert np.array_equal(np.isnan(got), np.isnan(exp))
            assert np.allclose(got[~np.isnan(got)], exp[~np.isnan(exp)],
                               rtol=1e-4, atol=1e-3)  # f32 plane storage


def test_pca_explained_ordering_and_k(spark):
    df, _ = _synth_tiles(spark, seed=11, scenes=("Z",), nx=2, ny=1)
    _, model = multiband.pca_tiles(df, BANDS, k=4)
    e = model["Z"]["explained"]
    assert all(e[i] >= e[i + 1] for i in range(3))   # descending variance
    assert abs(sum(e) - 1.0) < 1e-9                  # full rank: sums to 1
    out2, m2 = multiband.pca_tiles(df, BANDS, k=2)
    assert [c for c in out2.columns if c.endswith("_bytes")] == \
        ["pc1_bytes", "pc2_bytes"]
    assert np.allclose(m2["Z"]["components"],
                       model["Z"]["components"][:, :2])


def test_pca_rejects_degenerate_scene(spark):
    import pyspark.sql.functions as F

    df, _ = _synth_tiles(spark, scenes=("A",), nx=1, ny=1)
    empty = np.full((12, 16), np.nan, dtype="<f4").tobytes()
    one = df.filter("tile_x = 0 and tile_y = 0")
    for c in BANDS:
        one = one.withColumn(c, F.lit(empty))
    with pytest.raises(Exception, match="PCA needs"):
        multiband.pca_components(one, BANDS, k=2)


# --------------------------------------------------------------------------
# Global-histogram stretch / equalization vs a whole-scene serial oracle.
# The binning formula is a shared contract (imported), so the comparison is
# EXACT byte equality of the u8 planes, not a tolerance.
# --------------------------------------------------------------------------


def _mosaic_u8(pdf, scene, H, W, col, th=12, tw=16):
    got = np.zeros((H, W), dtype=np.uint8)
    for _, r in pdf[pdf.scene_id == scene].iterrows():
        p = np.frombuffer(r[col], np.uint8).reshape(r.h, r.w)
        got[r.tile_y * th:r.tile_y * th + r.h,
            r.tile_x * tw:r.tile_x * tw + r.w] = p
    return got


def test_equalize_matches_serial_oracle_exactly(spark):
    from i_landsat8_swlst_spark.multiband import _bin_plane, stretch_tiles

    df, mosaics = _synth_tiles(spark, seed=3)
    bins = 512
    out, luts = stretch_tiles(df, "b1_bytes", mode="equalize", bins=bins)
    pdf = out.toPandas()
    for s, stack in mosaics.items():
        x = stack[:, :, 0].astype(np.float32).astype(np.float64)
        ok = np.isfinite(x)
        vmin, vmax = float(x[ok].min()), float(x[ok].max())
        h = np.bincount(_bin_plane(x[ok], vmin, vmax, bins), minlength=bins)
        lut = np.round(np.cumsum(h) / h.sum() * 255.0).astype(np.uint8)
        assert np.array_equal(lut, luts[s])
        exp = np.zeros(x.shape, dtype=np.uint8)
        exp[ok] = lut[_bin_plane(x[ok], vmin, vmax, bins)]
        got = _mosaic_u8(pdf, s, *x.shape, "out_bytes")
        assert np.array_equal(got, exp)
        mask = _mosaic_u8(pdf, s, *x.shape, "mask_bytes").astype(bool)
        assert np.array_equal(mask, ok)
        # equalization property: output CDF is ~linear (within bin width)
        vals = got[mask]
        q = np.quantile(vals, [0.25, 0.5, 0.75])
        assert np.all(np.abs(q - np.array([64, 128, 191])) < 8)


def test_linear_stretch_clips_at_percentiles(spark):
    from i_landsat8_swlst_spark.multiband import stretch_tiles

    df, mosaics = _synth_tiles(spark, seed=5, scenes=("L",))
    out, _ = stretch_tiles(df, "b2_bytes", mode="linear",
                           lo_pct=2.0, hi_pct=98.0, bins=4096)
    pdf = out.toPandas()
    stack = mosaics["L"][:, :, 1]
    ok = np.isfinite(stack)
    got = _mosaic_u8(pdf, "L", *stack.shape, "out_bytes")
    vals = got[_mosaic_u8(pdf, "L", *stack.shape, "mask_bytes").astype(bool)]
    # ~2% of pixels pinned at each end (within histogram-bin resolution)
    assert abs((vals == 0).mean() - 0.02) < 0.01
    assert abs((vals == 255).mean() - 0.02) < 0.01
    # interior is monotone in the source values
    src = stack[ok].astype(np.float32)
    order = np.argsort(src)
    v = vals[order]
    assert np.all(np.diff(v.astype(np.int16)) >= 0)


def test_stretch_rejects_unknown_mode(spark):
    from i_landsat8_swlst_spark.multiband import stretch_tiles

    df, _ = _synth_tiles(spark, scenes=("M",), nx=1, ny=1)
    with pytest.raises(ValueError, match="unknown stretch mode"):
        stretch_tiles(df, "b1_bytes", mode="log")


def test_many_scene_models_stay_off_the_driver(spark):
    """VERDICT-r4 item 4: 10^4 scenes must work with the model as a
    DataFrame join, and the fully-distributed path (pca_model_df ->
    pca_tiles(model=df), stretch_luts_df) must never materialize a
    per-scene dict on the driver. Spot-check correctness on two scenes."""
    import pyspark.sql.functions as F

    n_scenes = 10_000
    rng = np.random.default_rng(17)
    # one 8x8 tile per scene; two correlated bands
    b1 = rng.uniform(260, 330, (n_scenes, 64)).astype("<f4")
    b2 = (0.5 * b1 + rng.uniform(0, 30, (n_scenes, 64))).astype("<f4")
    pdf = pd.DataFrame({
        "image_id": [f"S{i}-i" for i in range(n_scenes)],
        "scene_id": [f"S{i}" for i in range(n_scenes)],
        "tile_x": 0, "tile_y": 0, "w": 8, "h": 8,
        "b1_bytes": [r.tobytes() for r in b1],
        "b2_bytes": [r.tobytes() for r in b2],
    })
    tiles = spark.createDataFrame(pdf).repartition(32)

    # fully-distributed PCA: model never leaves the cluster as a dict
    model_df = multiband.pca_model_df(tiles, ["b1_bytes", "b2_bytes"], k=1)
    out, ret = multiband.pca_tiles(tiles, ["b1_bytes", "b2_bytes"], k=1,
                                   model=model_df)
    assert ret is model_df  # no driver dict materialized on this path
    agg = out.agg(F.count("*").alias("n"),
                  F.sum("n_valid").alias("nv")).first()
    assert agg["n"] == n_scenes and agg["nv"] == n_scenes * 64

    # spot-check one scene against the serial oracle
    sid = "S1234"
    row = out.filter(F.col("scene_id") == sid).first()
    stack = np.stack([b1[1234].astype(np.float64),
                      b2[1234].astype(np.float64)], axis=1)
    _, mean, vecs, _ = _oracle(stack.reshape(8, 8, 2), 1)
    exp = ((stack - mean) @ vecs[:, 0]).astype("<f4")
    got = np.frombuffer(row["pc1_bytes"], "<f4")
    assert np.allclose(got, exp, rtol=1e-4, atol=1e-3)

    # distributed stretch LUTs: one tiny row per scene, applied via join
    luts_df = multiband.stretch_luts_df(tiles, "b1_bytes", bins=32)
    assert luts_df.count() == n_scenes
    r = luts_df.filter(F.col("scene_id") == sid).first()
    x = b1[1234].astype(np.float64)
    h = np.bincount(multiband._bin_plane(
        x, x.min(), x.max(), 32), minlength=32)
    exp_lut = np.round(np.cumsum(h) / h.sum() * 255.0).astype(np.uint8)
    assert np.array_equal(np.frombuffer(r["lut_bytes"], np.uint8), exp_lut)


# --------------------------------------------------------------------------
# Pan-sharpening (i.pansharpen analog) vs a serial numpy oracle.
# --------------------------------------------------------------------------


def _pansharp_fixture(spark, seed=19, scenes=("P0", "P1"), tw=10, th=8,
                      nx=2, ny=2, ratio=2):
    from i_landsat8_swlst_spark.algebra import resample_plane

    rng = np.random.default_rng(seed)
    rows, truth = [], {}
    for s in scenes:
        H, W = th * ny, tw * nx
        ms = rng.uniform(50.0, 200.0, (H, W, 3))
        ms[rng.random((H, W)) < 0.05] = np.nan
        pan = rng.uniform(40.0, 220.0, (H * ratio, W * ratio))
        pan[rng.random(pan.shape) < 0.03] = np.nan
        ms = ms.astype(np.float32).astype(np.float64)
        pan = pan.astype(np.float32).astype(np.float64)
        truth[s] = (ms, pan)
        for ty in range(ny):
            for tx in range(nx):
                row = {"image_id": f"{s}-i", "scene_id": s,
                       "tile_x": tx, "tile_y": ty, "w": tw, "h": th}
                for b in range(3):
                    t = ms[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw, b]
                    row[f"b{b+1}_bytes"] = t.astype("<f4").tobytes()
                tp = pan[ty * th * ratio:(ty + 1) * th * ratio,
                         tx * tw * ratio:(tx + 1) * tw * ratio]
                row["pan_bytes"] = tp.astype("<f4").tobytes()
                rows.append(row)
    return spark.createDataFrame(pd.DataFrame(rows)), truth


def _pansharp_oracle(ms_tile, pan_tile, method):
    """Per-tile oracle: the operator is tile-local by design, so the oracle
    replays the identical per-tile math (bilinear upsample is tile-local,
    exactly like resample_tiles)."""
    from i_landsat8_swlst_spark.algebra import resample_plane

    ph, pw = pan_tile.shape
    bands = np.stack([resample_plane(ms_tile[:, :, b], ph, pw, "bilinear")
                      for b in range(ms_tile.shape[2])])
    inten = bands.mean(axis=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        if method == "brovey":
            out = bands * np.where(inten == 0, np.nan, pan_tile / inten)
        else:
            out = bands + (pan_tile - inten)
    return out


@pytest.mark.parametrize("method", ["brovey", "ihs"])
def test_pansharpen_matches_numpy_oracle(spark, method):
    df, truth = _pansharp_fixture(spark)
    got = multiband.pansharpen_tiles(
        df, "pan_bytes", ["b1_bytes", "b2_bytes", "b3_bytes"],
        method=method).toPandas()
    assert len(got) == 8  # 2 scenes x 4 tiles
    tw, th, ratio = 10, 8, 2
    for r in got.itertuples():
        ms, pan = truth[r.scene_id]
        ms_t = ms[r.tile_y * th:(r.tile_y + 1) * th,
                  r.tile_x * tw:(r.tile_x + 1) * tw]
        pan_t = pan[r.tile_y * th * ratio:(r.tile_y + 1) * th * ratio,
                    r.tile_x * tw * ratio:(r.tile_x + 1) * tw * ratio]
        exp = _pansharp_oracle(ms_t, pan_t, method)
        assert (r.w, r.h) == (tw * ratio, th * ratio)
        for b in range(3):
            gp = np.frombuffer(getattr(r, f"ps{b+1}_bytes"),
                               "<f4").reshape(r.h, r.w)
            ep = exp[b].astype(np.float32)
            assert np.array_equal(np.isnan(gp), np.isnan(ep))
            np.testing.assert_allclose(gp[~np.isnan(gp)], ep[~np.isnan(ep)],
                                       rtol=1e-6)
        ok = np.isfinite(exp).all(axis=0)
        assert r.n_valid == int(ok.sum())


def test_pansharpen_brovey_preserves_band_ratios(spark):
    """Brovey invariant: out_i / out_j == band_i / band_j wherever valid."""
    df, truth = _pansharp_fixture(spark, scenes=("R0",), nx=1, ny=1)
    got = multiband.pansharpen_tiles(
        df, "pan_bytes", ["b1_bytes", "b2_bytes", "b3_bytes"]).toPandas()
    r = got.iloc[0]
    p1 = np.frombuffer(r.ps1_bytes, "<f4").reshape(r.h, r.w).astype(np.float64)
    p2 = np.frombuffer(r.ps2_bytes, "<f4").reshape(r.h, r.w).astype(np.float64)
    from i_landsat8_swlst_spark.algebra import resample_plane

    ms, _ = truth["R0"]
    b1 = resample_plane(ms[:, :, 0], r.h, r.w, "bilinear")
    b2 = resample_plane(ms[:, :, 1], r.h, r.w, "bilinear")
    ok = np.isfinite(p1) & np.isfinite(p2) & (np.abs(p2) > 1e-9)
    np.testing.assert_allclose((p1 / p2)[ok], (b1 / b2)[ok], rtol=1e-4)


def test_pansharpen_rejects_bad_args(spark):
    df, _ = _pansharp_fixture(spark, scenes=("B0",), nx=1, ny=1)
    with pytest.raises(ValueError, match="unknown pansharpen method"):
        multiband.pansharpen_tiles(df, "pan_bytes",
                                   ["b1_bytes", "b2_bytes"], method="pca2")
    with pytest.raises(ValueError, match="at least 2"):
        multiband.pansharpen_tiles(df, "pan_bytes", ["b1_bytes"])
    with pytest.raises(Exception, match="pan payload"):
        multiband.pansharpen_tiles(df, "pan_bytes",
                                   ["b1_bytes", "b2_bytes"],
                                   ratio=3).collect()


# --------------------------------------------------------------------------
# Histogram matching (i.histo.match analog) vs a serial numpy oracle.
# --------------------------------------------------------------------------


def test_histo_match_matches_serial_oracle(spark):
    from i_landsat8_swlst_spark.multiband import (_bin_plane,
                                                  histo_match_tiles)

    df, mosaics = _synth_tiles(spark, seed=21)
    bins = 512
    out, luts_df = histo_match_tiles(df, "S0", "b1_bytes", bins=bins)
    pdf = out.toPandas()

    # serial oracle: same binning contract, same center-rank CDF interp
    planes = {s: stack[:, :, 0].astype(np.float32).astype(np.float64)
              for s, stack in mosaics.items()}
    rh, rv = None, None
    xr = planes["S0"]
    okr = np.isfinite(xr)
    rmin, rmax = float(xr[okr].min()), float(xr[okr].max())
    rw = max(rmax - rmin, 1e-300) / bins
    rcent = rmin + (np.arange(bins) + 0.5) * rw
    rhist = np.bincount(_bin_plane(xr[okr], rmin, rmax, bins), minlength=bins)
    rcdf = np.cumsum(rhist) / rhist.sum()
    for s, x in planes.items():
        ok = np.isfinite(x)
        vmin, vmax = float(x[ok].min()), float(x[ok].max())
        h = np.bincount(_bin_plane(x[ok], vmin, vmax, bins), minlength=bins)
        cdf = (np.cumsum(h) - h / 2.0) / h.sum()
        lut = np.interp(cdf, rcdf, rcent, left=rcent[0], right=rcent[-1])
        exp = np.full(x.shape, np.nan, dtype=np.float32)
        exp[ok] = lut.astype("<f4")[_bin_plane(x[ok], vmin, vmax, bins)]
        got = np.full(x.shape, np.nan, dtype=np.float32)
        for _, r in pdf[pdf.scene_id == s].iterrows():
            p = np.frombuffer(r.out_bytes, "<f4").reshape(r.h, r.w)
            got[r.tile_y * 12:r.tile_y * 12 + r.h,
                r.tile_x * 16:r.tile_x * 16 + r.w] = p
        assert np.array_equal(got, exp, equal_nan=True), s
        # distribution actually matched: quantiles land near the ref's
        if s != "S0":
            q_got = np.nanquantile(got.astype(np.float64), [0.25, 0.5, 0.75])
            q_ref = np.nanquantile(xr, [0.25, 0.5, 0.75])
            assert np.all(np.abs(q_got - q_ref) < 4 * rw + 1e-6), s


def test_histo_match_unknown_ref_raises(spark):
    from i_landsat8_swlst_spark.multiband import histo_match_tiles

    df, _ = _synth_tiles(spark, scenes=("A",), nx=1, ny=1)
    with pytest.raises(ValueError, match="reference scene"):
        histo_match_tiles(df, "NOPE", "b1_bytes")


# ---- NDVI + NDVI-threshold emissivity (i.vi / i.emissivity analogs) --------

def _ndvi_fixture(spark, seed=79, nan_at=((2, 3),), zero_at=((4, 5),)):
    import pandas as pd

    rng = np.random.default_rng(seed)
    red = rng.uniform(0.02, 0.4, (12, 10)).astype(np.float32)
    nir = rng.uniform(0.05, 0.6, (12, 10)).astype(np.float32)
    for (y, x) in nan_at:
        red[y, x] = np.nan
    for (y, x) in zero_at:           # zero-sum pixel -> NaN NDVI
        red[y, x] = 0.0
        nir[y, x] = 0.0
    rows = []
    for ty in range(2):
        for tx in range(2):
            sl = np.s_[ty * 6:(ty + 1) * 6, tx * 5:(tx + 1) * 5]
            rows.append({"scene_id": "S0", "tile_x": tx, "tile_y": ty,
                         "w": 5, "h": 6,
                         "red_bytes": red[sl].astype("<f4").tobytes(),
                         "nir_bytes": nir[sl].astype("<f4").tobytes()})
    return (spark.createDataFrame(pd.DataFrame(rows)),
            red.astype(np.float64), nir.astype(np.float64))


def test_ndvi_emissivity_matches_numpy_oracle(spark):
    tiles, red, nir = _ndvi_fixture(spark)
    rows = multiband.ndvi_emissivity_tiles(
        tiles, "red_bytes", "nir_bytes").collect()
    nd_m = np.full((12, 10), np.nan, dtype=np.float32)
    ep_m = np.full((12, 10), np.nan, dtype=np.float32)
    for r in rows:
        sl = np.s_[r.tile_y * 6:r.tile_y * 6 + r.h,
                   r.tile_x * 5:r.tile_x * 5 + r.w]
        nd_m[sl] = np.frombuffer(r.ndvi_bytes, "<f4").reshape(r.h, r.w)
        ep_m[sl] = np.frombuffer(r.emis_bytes, "<f4").reshape(r.h, r.w)
        t = np.frombuffer(r.ndvi_bytes, "<f4").reshape(r.h, r.w)
        assert r.n_valid == int(np.isfinite(t).sum())
    want_nd = multiband.ndvi_plane(red, nir)
    want_ep = multiband.emissivity_from_ndvi_plane(want_nd)
    assert np.array_equal(np.isnan(nd_m), np.isnan(want_nd))
    m = np.isfinite(want_nd)
    assert np.array_equal(nd_m[m], want_nd.astype(np.float32)[m])
    assert np.array_equal(ep_m[m], want_ep.astype(np.float32)[m])
    # NaN red and zero-sum pixels are NaN in BOTH outputs
    assert np.isnan(nd_m[2, 3]) and np.isnan(ep_m[2, 3])
    assert np.isnan(nd_m[4, 5]) and np.isnan(ep_m[4, 5])


def test_emissivity_thresholds_and_fvc():
    nd = np.array([[-0.5, 0.1, 0.2, 0.35, 0.5, 0.9, np.nan]])
    ep = multiband.emissivity_from_ndvi_plane(nd)
    # below soil threshold: bare soil
    assert ep[0, 0] == 0.97 and ep[0, 1] == 0.97 and ep[0, 2] == 0.97
    # full vegetation: eps_veg + cavity
    assert np.isclose(ep[0, 4], 0.995) and np.isclose(ep[0, 5], 0.995)
    # mixed pixel: Carlson-Ripley FVC^2 blend + cavity*FVC
    fvc = ((0.35 - 0.2) / 0.3) ** 2
    assert np.isclose(ep[0, 3], 0.99 * fvc + 0.97 * (1 - fvc) + 0.005 * fvc)
    assert np.isnan(ep[0, 6])
    # emissivity is monotone in NDVI across the mixed range
    grid = np.linspace(0.2, 0.5, 100)[None, :]
    eg = multiband.emissivity_from_ndvi_plane(grid)
    assert (np.diff(eg[0]) >= 0).all()
    with pytest.raises(ValueError, match="exceed"):
        multiband.emissivity_from_ndvi_plane(nd, ndvi_soil=0.5, ndvi_veg=0.2)
