"""r.series / r.cross analogs vs whole-scene numpy oracles.

series_tiles: the oracle stacks the mosaicked revisit planes (same sorted
date order the kernel enforces) and runs the shared nan-stat formula on
the whole scene — the tiled output must mosaic back bit-identically
(same values, same op order, f32 cast at the same point).

crosstab_tiles: the oracle quantizes the mosaicked planes and counts
pairs with a dict — independent of the kernel's flattened bincount — and
the summed table must match exactly; the table must also partition the
raster (sum == H*W including the NaN classes).
"""

import numpy as np
import pandas as pd
import pytest

from i_landsat8_swlst_spark import series
from i_landsat8_swlst_spark.series import SERIES_STATS, series_stack_stats
from i_landsat8_swlst_spark.texture import _quantize


def _revisit_tiles(spark, k=4, H=23, W=29, th=9, tw=11, seed=3,
                   footprints=("FA", "FB")):
    """Ragged revisit tile table; returns (df, stacks) with
    stacks[footprint] = (k, H, W) f64 whole-scene stack (f32-quantized
    exactly as stored)."""
    rng = np.random.default_rng(seed)
    rows, stacks = [], {}
    for fp in footprints:
        planes = []
        for d in range(k):
            p = rng.uniform(260.0, 330.0, (H, W))
            p[rng.random((H, W)) < 0.15] = np.nan
            p[1, 2] = np.nan  # one pixel with ZERO observations, all dates
            planes.append(p.astype(np.float32).astype(np.float64))
        stacks[fp] = np.stack(planes)
        for d in range(k):
            p = stacks[fp][d]
            for ty in range((H + th - 1) // th):
                for tx in range((W + tw - 1) // tw):
                    t = p[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
                    rows.append({
                        "image_id": f"{fp}R{d}-i", "scene_id": f"{fp}R{d}",
                        "tile_x": tx, "tile_y": ty,
                        "w": t.shape[1], "h": t.shape[0],
                        "lst_bytes": t.astype("<f4").tobytes()})
    return spark.createDataFrame(pd.DataFrame(rows)), stacks


def _mosaic(pdf, col, H, W, th=9, tw=11):
    got = np.full((H, W), np.nan, dtype=np.float32)
    for _, r in pdf.iterrows():
        p = np.frombuffer(r[col], "<f4").reshape(r.h, r.w)
        got[r.tile_y * th:r.tile_y * th + r.h,
            r.tile_x * tw:r.tile_x * tw + r.w] = p
    return got


def test_series_matches_whole_scene_oracle(spark):
    H, W = 23, 29
    df, stacks = _revisit_tiles(spark, k=4, H=H, W=W)
    pdf = series.series_tiles(df).toPandas()
    assert set(pdf.footprint) == {"FA", "FB"}
    assert (pdf.n_dates == 4).all()
    for fp, stack in stacks.items():
        exp = series_stack_stats(stack)
        sub = pdf[pdf.footprint == fp]
        for s in SERIES_STATS:
            got = _mosaic(sub, f"{s}_bytes", H, W)
            want = exp[s].astype(np.float32)
            assert np.array_equal(got, want, equal_nan=True), (fp, s)
        # zero-obs pixel: count plane 0, every stat NaN there
        cnt = _mosaic(sub, "count_bytes", H, W)
        assert cnt[1, 2] == 0
        assert np.isnan(_mosaic(sub, "median_bytes", H, W)[1, 2])
        assert int(sub.n_px_any.sum()) == int((np.isfinite(stack).sum(0) > 0).sum())


def test_series_stat_subset_and_bad_stat(spark):
    df, _ = _revisit_tiles(spark, k=2, H=9, W=11, footprints=("FX",))
    pdf = series.series_tiles(df, stats=("mean", "max")).toPandas()
    assert {"mean_bytes", "max_bytes"} <= set(pdf.columns)
    assert "median_bytes" not in pdf.columns
    with pytest.raises(ValueError, match="unknown series stats"):
        series.series_tiles(df, stats=("mean", "mode"))


def test_series_misregistered_stack_raises(spark):
    rows = [{"image_id": "GR0-i", "scene_id": "GR0", "tile_x": 0, "tile_y": 0,
             "w": 4, "h": 3,
             "lst_bytes": np.ones((3, 4), "<f4").tobytes()},
            {"image_id": "GR1-i", "scene_id": "GR1", "tile_x": 0, "tile_y": 0,
             "w": 5, "h": 3,
             "lst_bytes": np.ones((3, 5), "<f4").tobytes()}]
    df = spark.createDataFrame(pd.DataFrame(rows))
    with pytest.raises(Exception, match="mis-registered"):
        series.series_tiles(df).toPandas()


def _two_plane_tiles(spark, H=21, W=26, th=8, tw=10, seed=11, scene="S0"):
    rng = np.random.default_rng(seed)
    a = rng.uniform(270.0, 330.0, (H, W))
    b = rng.uniform(0.5, 6.0, (H, W))
    a[rng.random((H, W)) < 0.1] = np.nan
    b[rng.random((H, W)) < 0.1] = np.nan
    a = a.astype(np.float32).astype(np.float64)
    b = b.astype(np.float32).astype(np.float64)
    rows = []
    for ty in range((H + th - 1) // th):
        for tx in range((W + tw - 1) // tw):
            ta = a[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            tb = b[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            rows.append({"image_id": f"{scene}-i", "scene_id": scene,
                         "tile_x": tx, "tile_y": ty,
                         "w": ta.shape[1], "h": ta.shape[0],
                         "lst_bytes": ta.astype("<f4").tobytes(),
                         "cwv_bytes": tb.astype("<f4").tobytes()})
    return spark.createDataFrame(pd.DataFrame(rows)), a, b


def test_crosstab_matches_whole_scene_oracle(spark):
    la, lb = 5, 7
    df, a, b = _two_plane_tiles(spark)
    got = {(r.class_a, r.class_b): r.n_px
           for r in series.crosstab_tiles(df, levels_a=la, levels_b=lb).collect()}
    fa = a[np.isfinite(a)]
    fb = b[np.isfinite(b)]
    qa = _quantize(a, fa.min(), fa.max(), la)
    qb = _quantize(b, fb.min(), fb.max(), lb)
    exp: dict = {}
    for ca, cb in zip(qa.ravel(), qb.ravel()):
        exp[(int(ca), int(cb))] = exp.get((int(ca), int(cb)), 0) + 1
    assert got == exp
    # complete partition of the raster, NaN classes included
    assert sum(got.values()) == a.size


def test_crosstab_rejects_bad_levels(spark):
    df, _, _ = _two_plane_tiles(spark, H=8, W=10)
    with pytest.raises(ValueError, match="levels must be"):
        series.crosstab_tiles(df, levels_a=1)


def test_crosstab_all_nan_plane_is_nan_class(spark):
    """One plane entirely NaN: every pixel lands in its class -1 slot and
    the table still partitions the raster (no range row exists for the
    all-NaN column — the kernel must not KeyError)."""
    rows = [{"image_id": "Z-i", "scene_id": "Z", "tile_x": 0, "tile_y": 0,
             "w": 6, "h": 4,
             "lst_bytes": np.full((4, 6), np.nan, "<f4").tobytes(),
             "cwv_bytes": np.arange(24, dtype="<f4").tobytes()}]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = series.crosstab_tiles(df, levels_a=3, levels_b=3).collect()
    assert all(r.class_a == -1 for r in got)
    assert sum(r.n_px for r in got) == 24
    assert {r.class_b for r in got} == {0, 1, 2}


def test_anomaly_matches_numpy_oracle(spark):
    """anomaly_tiles == numpy z-score from the same history stack; the
    spiked pixel flags, zero-spread semantics hold, and a thin history
    (n < min_obs) never scores."""
    df, stacks = _revisit_tiles(spark, k=4, H=23, W=29)
    H, W = 23, 29
    hist_stack = stacks["FA"][:3]
    cur = stacks["FA"][3].copy()
    cur[5, 6] = 500.0  # unambiguous thermal anomaly
    hist = df.filter("scene_id IN ('FAR0','FAR1','FAR2')")
    cur_rows = []
    for ty in range((H + 9 - 1) // 9):
        for tx in range((W + 11 - 1) // 11):
            t = cur[ty * 9:(ty + 1) * 9, tx * 11:(tx + 1) * 11]
            cur_rows.append({"image_id": "FAR3-i", "scene_id": "FAR3",
                             "tile_x": tx, "tile_y": ty,
                             "w": t.shape[1], "h": t.shape[0],
                             "lst_bytes": t.astype("<f4").tobytes()})
    cur_df = spark.createDataFrame(pd.DataFrame(cur_rows))
    got = series.anomaly_tiles(hist, cur_df, k=3.0).toPandas()
    assert (got.footprint == "FA").all() and (got.scene_id == "FAR3").all()
    z = _mosaic(got, "z_bytes", H, W).astype(np.float64)
    # oracle from the same stack (f32-stored planes, same op order)
    exp_stats = series_stack_stats(
        hist_stack, ("count", "median", "stddev"))
    n = exp_stats["count"].astype("<f4").astype(np.float64)
    med = exp_stats["median"].astype("<f4").astype(np.float64)
    std = exp_stats["stddev"].astype("<f4").astype(np.float64)
    c32 = cur.astype("<f4").astype(np.float64)
    ok = np.isfinite(c32) & (n >= 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        ez = np.where(std > 0, (c32 - med) / std,
                      np.where(c32 == med, 0.0, np.sign(c32 - med) * np.inf))
    exp = np.full((H, W), np.nan)
    exp[ok] = ez[ok]
    exp32 = exp.astype(np.float32)
    assert np.array_equal(z.astype(np.float32), exp32, equal_nan=True)
    # the spike is flagged; totals reconcile
    sy, sx = 5, 6
    if ok[sy, sx]:
        assert abs(exp32[sy, sx]) > 3.0
        assert int(got.n_anomaly.sum()) >= 1
    assert int(got.n_scored.sum()) == int(ok.sum())
    with pytest.raises(ValueError, match="k must be"):
        series.anomaly_tiles(hist, cur_df, k=0.0)


def test_median_approx_within_bin_width():
    """Property (VERDICT r4 item 8): |median_approx - exact median| <= one
    bin width = finite range / bins, on random NaN-holed stacks."""
    rng = np.random.default_rng(83)
    for trial in range(8):
        k = int(rng.integers(2, 40))
        stack = rng.uniform(200.0, 400.0, (k, 7, 9))
        stack[rng.random(stack.shape) < 0.2] = np.nan
        stack[:, 0, 0] = np.nan  # zero-obs pixel
        for bins in (16, 256):
            out = series_stack_stats(
                stack, ("median", "median_approx"), approx_bins=bins)
            fin = stack[np.isfinite(stack)]
            width = (fin.max() - fin.min()) / bins
            d = np.abs(out["median_approx"] - out["median"])
            ok = np.isfinite(out["median"])
            assert np.isnan(out["median_approx"][0, 0])
            assert (np.isnan(out["median_approx"]) == ~ok).all()
            assert float(np.nanmax(d[ok])) <= width + 1e-12, (trial, bins)


def test_series_tiles_deep_matches_exact_kernel(spark):
    """The streaming histogram fold (series_tiles_deep) vs the buffering
    kernel on the same revisit fixture: count/min/max bit-exact,
    median_approx EXACTLY equal (shared bin-center contract), mean/stddev
    to fp tolerance (one-pass vs two-pass moments), and median_approx
    within one bin width of the exact median."""
    H, W = 23, 29
    df, stacks = _revisit_tiles(spark, k=5, H=H, W=W, seed=9)
    exact = series.series_tiles(
        df, stats=("count", "mean", "stddev", "min", "max", "median",
                   "median_approx")).toPandas()
    deep = series.series_tiles_deep(df, bins=series.SERIES_APPROX_BINS) \
        .toPandas()
    assert set(deep.footprint) == set(stacks)
    assert (deep.n_dates == 5).all()
    for fp in stacks:
        e = exact[exact.footprint == fp]
        g = deep[deep.footprint == fp]
        assert int(g.n_px_any.sum()) == int(e.n_px_any.sum())
        for s, exact_eq in (("count", True), ("min", True), ("max", True),
                            ("median_approx", True),
                            ("mean", False), ("stddev", False)):
            em = _mosaic(e, f"{s}_bytes", H, W)
            gm = _mosaic(g, f"{s}_bytes", H, W)
            if exact_eq:
                assert np.array_equal(gm, em, equal_nan=True), (fp, s)
            else:
                assert np.array_equal(np.isnan(gm), np.isnan(em)), (fp, s)
                np.testing.assert_allclose(
                    gm[~np.isnan(gm)], em[~np.isnan(em)], rtol=2e-5,
                    err_msg=f"{fp}/{s}")
        # bin-width bound vs the exact median, per (footprint, tile) range
        med = _mosaic(e, "median_bytes", H, W).astype(np.float64)
        apx = _mosaic(g, "median_approx_bytes", H, W).astype(np.float64)
        for r in g.itertuples():
            y0, x0 = r.tile_y * 9, r.tile_x * 11
            sub = stacks[fp][:, y0:y0 + r.h, x0:x0 + r.w]
            fin = sub[np.isfinite(sub)]
            if not fin.size:
                continue
            width = (fin.max() - fin.min()) / series.SERIES_APPROX_BINS
            dm = np.abs(apx[y0:y0 + r.h, x0:x0 + r.w]
                        - med[y0:y0 + r.h, x0:x0 + r.w])
            assert np.nanmax(dm) <= width + 1e-9


def test_series_tiles_deep_misregistered_raises(spark):
    df, _ = _revisit_tiles(spark, k=2, H=9, W=11, footprints=("FZ",))
    bad = spark.createDataFrame(pd.DataFrame([{
        "image_id": "FZR9-i", "scene_id": "FZR9", "tile_x": 0, "tile_y": 0,
        "w": 5, "h": 5,
        "lst_bytes": np.ones((5, 5), "<f4").tobytes()}]))
    with pytest.raises(Exception, match="mis-registered"):
        series.series_tiles_deep(df.unionByName(bad)).toPandas()


# ---- temporal_aggregate_tiles (t.rast.aggregate analog) ----------------

def test_epoch_start_calendar_arithmetic(spark):
    from pyspark.sql import functions as F

    dates = ["1999-12-31", "2020-01-01", "2020-02-29", "2020-04-10",
             "1969-12-31", "1968-03-05", "2021-07-04"]
    df = spark.createDataFrame(pd.DataFrame({"t": pd.to_datetime(dates)}))
    out = df.select(
        F.date_format("t", "yyyy-MM-dd").alias("t"),
        series.epoch_start(F.col("t"), "3 months").alias("q"),
        series.epoch_start(F.col("t"), "1 year").alias("y"),
        series.epoch_start(F.col("t"), "16 days").alias("d16"),
    ).toPandas().set_index("t")
    exp_q = {"1999-12-31": "1999-10-01", "2020-01-01": "2020-01-01",
             "2020-02-29": "2020-01-01", "2020-04-10": "2020-04-01",
             "1969-12-31": "1969-10-01", "1968-03-05": "1968-01-01",
             "2021-07-04": "2021-07-01"}
    exp_y = {"1999-12-31": "1999-01-01", "2020-01-01": "2020-01-01",
             "2020-02-29": "2020-01-01", "2020-04-10": "2020-01-01",
             "1969-12-31": "1969-01-01", "1968-03-05": "1968-01-01",
             "2021-07-04": "2021-01-01"}
    for t, want in exp_q.items():
        assert str(out.loc[t, "q"]) == want, ("quarter", t)
    for t, want in exp_y.items():
        assert str(out.loc[t, "y"]) == want, ("year", t)
    # 16-day windows tile from 1970-01-01; day index floor-divides,
    # including negatives (1969-12-31 is day -1 -> window start day -16)
    import datetime as dt
    for t in dates:
        day = (dt.date.fromisoformat(t) - dt.date(1970, 1, 1)).days
        want = dt.date(1970, 1, 1) + dt.timedelta(days=(day // 16) * 16)
        assert str(out.loc[t, "d16"]) == str(want), ("d16", t)


def test_parse_granularity_rejects_garbage():
    for bad in ["3", "months", "3 fortnights", "0 months", "-2 days",
                "1.5 years", "3 months extra"]:
        with pytest.raises(ValueError):
            series.parse_granularity(bad)
    assert series.parse_granularity("1 YEAR") == (1, "year")
    assert series.parse_granularity(" 16 days ") == (16, "day")


def _revisit_meta(spark, dates_by_scene):
    return spark.createDataFrame(pd.DataFrame(
        [{"scene_id": s, "acquired_at": pd.Timestamp(d)}
         for s, d in dates_by_scene.items()]))


def test_temporal_aggregate_bit_matches_series_per_window(spark):
    """Each epoch's output planes must be BIT-IDENTICAL to series_tiles
    run on just that window's scenes (same kernel, same fold order)."""
    H, W = 23, 29
    df, _ = _revisit_tiles(spark, k=4, H=H, W=W)
    # R0,R1 land in 2020Q1; R2,R3 in 2020Q2 — for both footprints
    dates = {}
    for fp in ("FA", "FB"):
        dates[f"{fp}R0"] = "2020-01-15"
        dates[f"{fp}R1"] = "2020-02-20"
        dates[f"{fp}R2"] = "2020-04-10"
        dates[f"{fp}R3"] = "2020-05-05"
    meta = _revisit_meta(spark, dates)
    got = series.temporal_aggregate_tiles(df, meta, "3 months").toPandas()
    assert set(str(e) for e in got.epoch) == {"2020-01-01", "2020-04-01"}
    assert (got.n_dates == 2).all()
    for epoch, revs in [("2020-01-01", ("R0", "R1")),
                        ("2020-04-01", ("R2", "R3"))]:
        sub = df.filter(df.scene_id.rlike("|".join(f"{r}$" for r in revs)))
        want = series.series_tiles(sub).toPandas()
        g = got[got.epoch.astype(str) == epoch]
        assert len(g) == len(want)
        key = ["footprint", "tile_x", "tile_y"]
        g = g.sort_values(key).reset_index(drop=True)
        want = want.sort_values(key).reset_index(drop=True)
        for s in SERIES_STATS:
            assert (g[f"{s}_bytes"] == want[f"{s}_bytes"]).all(), (epoch, s)
        assert (g.n_px_any.values == want.n_px_any.values).all()


def test_temporal_aggregate_missing_meta_raises(spark):
    df, _ = _revisit_tiles(spark, k=2, H=9, W=11, footprints=("FZ",))
    meta = _revisit_meta(spark, {"FZR0": "2020-01-01"})  # FZR1 missing
    with pytest.raises(Exception, match="missing from meta"):
        series.temporal_aggregate_tiles(df, meta, "1 month").toPandas()


# ---- gapfill_tiles (t.rast.gapfill analog) ------------------------------

def _gapfill_oracle(stack, times, max_gap=None):
    """Independent per-pixel loop: for every NaN with a valid observation
    on both sides, linear interp in TIME between the nearest ones."""
    k, H, W = stack.shape
    out = stack.copy()
    for y in range(H):
        for x in range(W):
            col = stack[:, y, x]
            for i in range(k):
                if np.isfinite(col[i]):
                    continue
                prevs = [j for j in range(i) if np.isfinite(col[j])]
                nexts = [j for j in range(i + 1, k) if np.isfinite(col[j])]
                if not prevs or not nexts:
                    continue
                p, n = prevs[-1], nexts[0]
                span = times[n] - times[p]
                if max_gap is not None and span > max_gap:
                    continue
                wgt = (times[i] - times[p]) / span if span > 0 else 0.5
                out[i, y, x] = col[p] + (col[n] - col[p]) * wgt
    return out


def test_gapfill_kernel_matches_per_pixel_oracle():
    rng = np.random.default_rng(11)
    k, H, W = 6, 7, 9
    stack = rng.uniform(260, 330, (k, H, W))
    stack[rng.random((k, H, W)) < 0.35] = np.nan
    stack[:, 0, 0] = np.nan            # all-NaN pixel stays all-NaN
    stack[0, 1, 1] = np.nan           # leading gap never extrapolates
    stack[-1, 2, 2] = np.nan          # trailing gap never extrapolates
    times = np.array([0.0, 13.0, 16.0, 45.0, 46.5, 90.0])  # uneven!
    for mg in (None, 20.0):
        got = series.gapfill_stack(stack, times, mg)
        want = _gapfill_oracle(stack, times, mg)
        assert np.allclose(got, want, equal_nan=True, rtol=0, atol=1e-12), mg
    assert np.isnan(series.gapfill_stack(stack, times)[:, 0, 0]).all()
    assert np.isnan(series.gapfill_stack(stack, times)[0, 1, 1])
    assert np.isnan(series.gapfill_stack(stack, times)[-1, 2, 2])


def test_gapfill_tiles_end_to_end(spark):
    H, W = 23, 29
    df, stacks = _revisit_tiles(spark, k=4, H=H, W=W)
    days = [0, 13, 45, 60]
    dates = {f"{fp}R{d}": pd.Timestamp("2020-01-01")
             + pd.Timedelta(days=days[d])
             for fp in ("FA", "FB") for d in range(4)}
    meta = _revisit_meta(spark, dates)
    out = series.gapfill_tiles(df, meta).toPandas()
    assert len(out) == df.count()  # one row per input tile
    times = np.array(days, dtype=np.float64)
    for fp, stack in stacks.items():
        want = _gapfill_oracle(stack, times)
        for d in range(4):
            sub = out[out.scene_id == f"{fp}R{d}"]
            got = _mosaic(sub, "filled_bytes", H, W).astype(np.float64)
            assert np.allclose(got, want[d].astype(np.float32),
                               equal_nan=True, rtol=0, atol=0), (fp, d)
            n_filled = int(sub.n_filled.sum())
            assert n_filled == int((np.isfinite(want[d])
                                    & ~np.isfinite(stack[d])).sum())
    # holes were actually exercised
    assert out.n_filled.sum() > 0


def test_gapfill_missing_meta_raises(spark):
    df, _ = _revisit_tiles(spark, k=2, H=9, W=11, footprints=("FZ",))
    meta = _revisit_meta(spark, {"FZR0": "2020-01-01"})
    with pytest.raises(Exception, match="missing from meta"):
        series.gapfill_tiles(df, meta).toPandas()


# ---- regression_tiles (r.regression.line analog) -------------------------

def test_regression_matches_numpy_oracle(spark):
    rng = np.random.default_rng(17)
    H, W, th, tw = 23, 29, 9, 11
    rows = []
    planes = {}
    for sid, slope, icept in [("SA", 2.5, -3.0), ("SB", -0.7, 40.0)]:
        x = rng.uniform(1.0, 6.0, (H, W))
        y = icept + slope * x + rng.normal(0, 0.3, (H, W))
        x[rng.random((H, W)) < 0.1] = np.nan   # holes in either plane
        y[rng.random((H, W)) < 0.1] = np.nan
        x = x.astype(np.float32).astype(np.float64)
        y = y.astype(np.float32).astype(np.float64)
        planes[sid] = (x, y)
        for ty in range((H + th - 1) // th):
            for tx in range((W + tw - 1) // tw):
                xs = x[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
                ys = y[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
                rows.append({
                    "scene_id": sid, "tile_x": tx, "tile_y": ty,
                    "w": xs.shape[1], "h": xs.shape[0],
                    "cwv_bytes": xs.astype("<f4").tobytes(),
                    "lst_bytes": ys.astype("<f4").tobytes()})
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = series.regression_tiles(df).toPandas().set_index("scene_id")
    for sid, (x, y) in planes.items():
        ok = np.isfinite(x) & np.isfinite(y)
        xv, yv = x[ok], y[ok]
        b_w, a_w = np.polyfit(xv, yv, 1)
        r_w = np.corrcoef(xv, yv)[0, 1]
        n = int(ok.sum())
        f_w = r_w * r_w * (n - 2) / (1 - r_w * r_w)
        g = got.loc[sid]
        assert g.n == n
        np.testing.assert_allclose(g.b, b_w, rtol=1e-8)
        np.testing.assert_allclose(g.a, a_w, rtol=1e-8)
        np.testing.assert_allclose(g.r, r_w, rtol=1e-10)
        np.testing.assert_allclose(g.f, f_w, rtol=1e-8)
        # the synthetic truth is recovered to fit noise
        assert abs(g.b - (2.5 if sid == "SA" else -0.7)) < 0.1


def test_regression_degenerate_scenes_are_null(spark):
    const = np.full((4, 4), 2.0, np.float32)
    yv = np.arange(16, dtype=np.float32).reshape(4, 4)
    one = np.full((4, 4), np.nan, np.float32)
    one[0, 0] = 1.0
    rows = [
        {"scene_id": "CONSTX", "tile_x": 0, "tile_y": 0, "w": 4, "h": 4,
         "cwv_bytes": const.tobytes(), "lst_bytes": yv.tobytes()},
        {"scene_id": "ONEPX", "tile_x": 0, "tile_y": 0, "w": 4, "h": 4,
         "cwv_bytes": one.tobytes(), "lst_bytes": yv.tobytes()},
    ]
    got = (series.regression_tiles(spark.createDataFrame(pd.DataFrame(rows)))
           .toPandas().set_index("scene_id"))
    assert got.loc["CONSTX"].n == 16 and pd.isna(got.loc["CONSTX"].b)
    assert got.loc["ONEPX"].n == 1 and pd.isna(got.loc["ONEPX"].b)


# ---- accumulate_tiles (t.rast.accumulate analog) --------------------------

def test_accumulate_kernel_semantics():
    stack = np.array([
        [[10.0, np.nan]],
        [[20.0, 5.0]],
        [[np.nan, 30.0]],
    ])
    # lower=8, upper=25: contribs plane0 (2, nan), plane1 (12, 0), plane2 (nan, 17)
    got = series.accumulate_stack(stack, lower=8.0, upper=25.0)
    want = np.array([[[2.0, 0.0]], [[14.0, 0.0]], [[14.0, 17.0]]])
    assert np.array_equal(got, want)
    # poison mode: NaN propagates from its step on
    got_p = series.accumulate_stack(stack, lower=8.0, upper=25.0,
                                    skip_nulls=False)
    assert got_p[0, 0, 0] == 2.0 and got_p[1, 0, 0] == 14.0
    assert np.isnan(got_p[2, 0, 0])            # NaN at step 2 poisons
    assert np.isnan(got_p[:, 0, 1]).all()      # NaN at step 0 poisons all
    with pytest.raises(ValueError, match="upper"):
        series.accumulate_stack(stack, lower=5.0, upper=5.0)


def test_accumulate_tiles_matches_whole_scene(spark):
    H, W = 23, 29
    df, stacks = _revisit_tiles(spark, k=4, H=H, W=W)
    days = [0, 10, 40, 55]
    dates = {f"{fp}R{d}": pd.Timestamp("2021-05-01")
             + pd.Timedelta(days=days[d])
             for fp in ("FA", "FB") for d in range(4)}
    out = series.accumulate_tiles(df, _revisit_meta(spark, dates),
                                  lower=280.0).toPandas()
    assert len(out) == df.count()
    for fp, stack in stacks.items():
        want = series.accumulate_stack(stack, lower=280.0)
        for d in range(4):
            sub = out[out.scene_id == f"{fp}R{d}"]
            assert (sub.step == d).all()
            got = _mosaic(sub, "accum_bytes", H, W)
            assert np.array_equal(got, want[d].astype(np.float32),
                                  equal_nan=True), (fp, d)
