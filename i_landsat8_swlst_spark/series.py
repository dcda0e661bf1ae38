"""Temporal raster series and raster cross-tabulation.

Two classic map-stack products over the tile table, kept at PLANE
granularity so pixels never explode into rows:

``series_tiles`` — the r.series analog: per-pixel statistics (count,
mean, stddev, min, max, median) across the revisits of one footprint.
``composite_pixels``/``trend_pixels`` (pipeline.py) already cover the
pixel-ROW path; this is the plane path — ONE shuffle of the plane bytes
on the (footprint, tile) key, then a vectorized nan-stat over the
k-deep stack per group. Group size is the revisit count k (bounded,
~tens), and the exact per-pixel median inherently needs all k values at
once, so the grouped-map buffering is the honest minimum — mean/min/
max/count alone could stream through partial plane aggregates, but
Spark has no binary-plane partial agg and k rows per group make the
buffering moot. Shuffle bytes = the input planes, once.

``crosstab_tiles`` — the r.cross / r.stats analog: the co-occurrence
area table of two globally-quantized planes (e.g. LST class x CWV
class). Quantization bins come from the per-scene finite ranges
(`multiband.scene_ranges`, one scan + one tiny agg) exactly like
texture/stretch, so every tile bins identically; then each tile folds
to at most levels_a x levels_b tiny (scene, ca, cb, count) rows via one
2-D ``np.bincount`` and the scene table is ONE map-side-combining SUM —
the rows reaching the exchange are bounded by tiles x occupied cells,
not pixels.

Both are deterministic (within-group date order is sorted before any
fp fold) and NaN-aware (a NaN observation simply doesn't count at that
pixel; a pixel NaN in either crosstab plane lands in that plane's
class ``-1`` row, so the table still partitions the raster exactly).
"""

from __future__ import annotations

import warnings
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, DateType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from . import codecs
from .multiband import scene_ranges_df
from .pipeline import _batch_from_cols, _batch_rows
from .texture import _quantize

SERIES_STATS = ("count", "mean", "stddev", "min", "max", "median")
# median_approx: fixed-bin histogram median (same binning contract as
# multiband stretch/texture — multiband._bin_plane over the group's finite
# range). |median_approx - median| <= bin width = (vmax - vmin) / bins by
# construction; the default 256 bins bound the error at range/256.
SERIES_ALL_STATS = SERIES_STATS + ("median_approx",)
SERIES_APPROX_BINS = 256


def _quantize_to_centers(stack: np.ndarray, bins: int) -> np.ndarray:
    """Snap every finite value to the CENTER of its fixed bin over the
    stack's own finite range (the multiband._bin_plane contract). The
    approximate median is then simply the exact median of the snapped
    values — identical to the histogram-CDF median and within one bin
    width of the true median."""
    from .multiband import _bin_plane

    ok = np.isfinite(stack)
    if not ok.any():
        return np.full(stack.shape, np.nan)
    vmin, vmax = float(stack[ok].min()), float(stack[ok].max())
    width = max(vmax - vmin, 1e-300) / bins
    out = np.full(stack.shape, np.nan)
    out[ok] = vmin + (_bin_plane(stack[ok], vmin, vmax, bins) + 0.5) * width
    return out


def series_stack_stats(stack: np.ndarray,
                       stats: tuple[str, ...] = SERIES_STATS,
                       approx_bins: int = SERIES_APPROX_BINS,
                       ) -> dict[str, np.ndarray]:
    """Nan-aware per-pixel stats over a (k, h, w) f64 stack — shared
    verbatim with the whole-scene oracle in tests/test_series.py so
    parity is exact. ``count`` is the finite-observation count;
    ``stddev`` is the population stddev (ddof=0, the r.series
    convention); pixels with zero observations get NaN everywhere
    (count 0)."""
    n = np.isfinite(stack).sum(axis=0).astype(np.float64)
    out: dict[str, np.ndarray] = {}
    with np.errstate(invalid="ignore", divide="ignore"):
        for s in stats:
            if s == "count":
                out[s] = n
                continue
            if s == "median_approx":
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore", RuntimeWarning)
                    v = np.nanmedian(_quantize_to_centers(stack, approx_bins),
                                     axis=0)
                v[n == 0] = np.nan
                out[s] = v
                continue
            fn = {"mean": np.nanmean, "stddev": np.nanstd,
                  "min": np.nanmin, "max": np.nanmax,
                  "median": np.nanmedian}[s]
            # nan* warn on all-NaN pixel columns; the warning is the
            # expected zero-obs case, mapped to NaN below anyway
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                v = fn(stack, axis=0)
            v[n == 0] = np.nan
            out[s] = v
    return out


def _series_schema(stats: tuple[str, ...]) -> StructType:
    fields = [
        StructField("footprint", StringType()),
        StructField("tile_x", IntegerType()),
        StructField("tile_y", IntegerType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("n_dates", IntegerType()),
        StructField("n_px_any", LongType()),
    ]
    for s in stats:
        fields.append(StructField(f"{s}_bytes", BinaryType()))
        fields.append(StructField(f"{s}_mean", DoubleType()))
    return StructType(fields)


def series_tiles(tiles: DataFrame, src_col: str = "lst_bytes",
                 footprint=None,
                 stats: tuple[str, ...] = SERIES_STATS) -> DataFrame:
    """r.series analog: per-pixel temporal statistics across the revisits
    of each footprint, at tile granularity.

    ``footprint`` is the Column grouping revisits of one geographic
    footprint; the default strips the ``R<k>`` revisit suffix from
    ``scene_id`` (the same convention trend_pixels parses). Revisits of
    one footprint are grid-aligned, so each (footprint, tile_x, tile_y)
    group holds k same-shape planes; a shape mismatch inside a group
    raises (mis-registered stacks must not silently truncate).

    Plan: ONE hash shuffle of the plane bytes on the group key ->
    grouped-map stat kernel. No pixel-row explosion, no join.
    """
    unknown = set(stats) - set(SERIES_ALL_STATS)
    if unknown:
        raise ValueError(f"unknown series stats {sorted(unknown)}")
    fp = (footprint if footprint is not None
          else F.regexp_replace("scene_id", r"R\d+$", ""))
    schema = _series_schema(tuple(stats))
    stats_t = tuple(stats)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic fp fold order regardless of shuffle arrival
        pdf = pdf.sort_values("scene_id", kind="mergesort")
        w, h = int(pdf.w.iloc[0]), int(pdf.h.iloc[0])
        if (pdf.w != w).any() or (pdf.h != h).any():
            fpv, tx, ty = (pdf.footprint.iloc[0], int(pdf.tile_x.iloc[0]),
                           int(pdf.tile_y.iloc[0]))
            raise ValueError(
                f"series_tiles: mis-registered revisit stack for "
                f"footprint={fpv!r} tile=({tx},{ty}): shapes "
                f"{sorted(set(zip(pdf.w, pdf.h)))}")
        stack = np.stack([codecs.decode_f32bt(b, w, h)
                          for b in pdf[src_col]])
        out = series_stack_stats(stack, stats_t)
        row = {
            "footprint": [pdf.footprint.iloc[0]],
            "tile_x": [int(pdf.tile_x.iloc[0])],
            "tile_y": [int(pdf.tile_y.iloc[0])],
            "w": [w], "h": [h], "n_dates": [len(pdf)],
            "n_px_any": [int((out["count"] > 0).sum())
                         if "count" in out
                         else int((np.isfinite(stack).sum(0) > 0).sum())],
        }
        for s in stats_t:
            plane = out[s].astype("<f4")
            row[f"{s}_bytes"] = [plane.tobytes()]
            any_ok = bool(np.isfinite(plane).any())
            row[f"{s}_mean"] = [float(np.nanmean(plane)) if any_ok else None]
        return pd.DataFrame(row)

    keyed = tiles.withColumn("footprint", fp)
    return (keyed.select("footprint", "tile_x", "tile_y", "w", "h",
                         "scene_id", src_col)
            .groupBy("footprint", "tile_x", "tile_y")
            .applyInPandas(fn, schema))


_DEEP_STATS = ("count", "mean", "stddev", "min", "max", "median_approx")

_DEEP_RANGE_PART = StructType([
    StructField("footprint", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("vmin", DoubleType()),
    StructField("vmax", DoubleType()),
])


def series_tiles_deep(tiles: DataFrame, src_col: str = "lst_bytes",
                      footprint=None,
                      bins: int = SERIES_APPROX_BINS) -> DataFrame:
    """Deep-archive r.series (VERDICT r4 item 8): the exact median in
    ``series_tiles`` honestly buffers all k revisit planes per group —
    fine at k ~ tens, heavy at k in the hundreds. This variant STREAMS
    the sorted revisit stream per tile key and folds O(bins) state planes
    (count / sum / sumsq / min / max / fixed-bin histogram) instead, so
    per-group memory is O(bins x h x w), constant in k.

    Stats are fixed to (count, mean, stddev, min, max, median_approx).
    ``median_approx`` uses the multiband._bin_plane fixed-bin contract
    over the group's finite range: |median_approx - exact median| <= one
    bin width = (vmax - vmin) / bins, and it equals EXACTLY what
    ``series_tiles(stats=(..., "median_approx"))`` computes (both snap to
    identical bin centers). mean/stddev are one-pass moment folds, so they
    agree with the two-pass exact kernel to fp tolerance, not bit-exactly;
    count/min/max are exact.

    Plan: one range scan (tiny per-tile rows, one agg), then ONE hash
    shuffle of the plane bytes with an in-partition sort on
    (key, scene_id) for a deterministic fold order; the per-group range
    broadcast-joins back on the tile key (one row per OUTPUT tile — at
    extreme output counts feed a pre-aggregated range table instead).
    """
    fp = (footprint if footprint is not None
          else F.regexp_replace("scene_id", r"R\d+$", ""))
    keyed = tiles.withColumn("footprint", fp).select(
        "footprint", "tile_x", "tile_y", "w", "h", "scene_id", src_col)
    key = ["footprint", "tile_x", "tile_y"]

    def range_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in _DEEP_RANGE_PART}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                x = codecs.decode_f32bt(getattr(row, src_col),
                                        int(row.w), int(row.h))
                x = x[np.isfinite(x)]
                if x.size:
                    ap["footprint"](row.footprint)
                    ap["tile_x"](row.tile_x); ap["tile_y"](row.tile_y)
                    ap["vmin"](float(x.min())); ap["vmax"](float(x.max()))
            if cols["footprint"]:
                yield _batch_from_cols(cols, _DEEP_RANGE_PART)

    rngs = (keyed.mapInArrow(range_fn, _DEEP_RANGE_PART)
            .groupBy(*key)
            .agg(F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax")))

    schema = _series_schema(_DEEP_STATS)

    def fold_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        state: dict = {}

        def flush(cols, ap):
            st = state
            n = st["n"]
            nz = n == 0
            nf = n.astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                mean = st["s"] / nf
                var = st["s2"] / nf - mean * mean
                std = np.sqrt(np.maximum(var, 0.0))
            mean[nz] = np.nan; std[nz] = np.nan
            if st["vmin"] is None:
                med = np.full(n.shape, np.nan)
            else:
                width = max(st["vmax"] - st["vmin"], 1e-300) / bins
                centers = st["vmin"] + (np.arange(bins) + 0.5) * width
                cum = np.cumsum(st["hist"], axis=0)
                r1 = (n + 1) // 2
                r2 = n // 2 + 1
                i1 = np.minimum((cum < r1).sum(axis=0), bins - 1)
                i2 = np.minimum((cum < r2).sum(axis=0), bins - 1)
                med = (centers[i1] + centers[i2]) / 2.0
                med[nz] = np.nan
            out = {"count": nf, "mean": mean, "stddev": std,
                   "min": st["mn"], "max": st["mx"], "median_approx": med}
            ap["footprint"](st["key"][0])
            ap["tile_x"](st["key"][1]); ap["tile_y"](st["key"][2])
            ap["w"](st["w"]); ap["h"](st["h"])
            ap["n_dates"](st["n_dates"])
            ap["n_px_any"](int((n > 0).sum()))
            for s in _DEEP_STATS:
                plane = out[s].astype("<f4")
                ap[f"{s}_bytes"](plane.tobytes())
                any_ok = bool(np.isfinite(plane).any())
                ap[f"{s}_mean"](float(np.nanmean(plane)) if any_ok else None)
            state.clear()

        from .multiband import _bin_plane

        cols: dict[str, list] = {f.name: [] for f in schema}
        ap = {k: v.append for k, v in cols.items()}
        for batch in batches:
            for row in _batch_rows(batch):
                kk = (row.footprint, int(row.tile_x), int(row.tile_y))
                w, h = int(row.w), int(row.h)
                if state and state["key"] != kk:
                    flush(cols, ap)
                if not state:
                    state.update(
                        key=kk, w=w, h=h, n_dates=0,
                        n=np.zeros((h, w), dtype=np.int64),
                        s=np.zeros((h, w)), s2=np.zeros((h, w)),
                        mn=np.full((h, w), np.nan),
                        mx=np.full((h, w), np.nan),
                        vmin=row.vmin, vmax=row.vmax,
                        hist=(None if row.vmin is None
                              else np.zeros((bins, h, w), dtype=np.int32)))
                elif (w, h) != (state["w"], state["h"]):
                    raise ValueError(
                        f"series_tiles_deep: mis-registered revisit stack "
                        f"for footprint={kk[0]!r} tile=({kk[1]},{kk[2]}): "
                        f"shapes {(state['w'], state['h'])} vs {(w, h)}")
                x = codecs.decode_f32bt(getattr(row, src_col), w, h) \
                    .astype(np.float64)
                ok = np.isfinite(x)
                st = state
                st["n_dates"] += 1
                st["n"] += ok
                xv = np.where(ok, x, 0.0)
                st["s"] += xv
                st["s2"] += xv * xv
                st["mn"] = np.fmin(st["mn"], x)
                st["mx"] = np.fmax(st["mx"], x)
                if st["hist"] is not None and ok.any():
                    yy, xx = np.nonzero(ok)
                    idx = _bin_plane(x[ok], st["vmin"], st["vmax"], bins)
                    np.add.at(st["hist"], (idx, yy, xx), 1)
        if state:
            flush(cols, ap)
        if cols["footprint"]:
            yield _batch_from_cols(cols, schema)

    # left join: an all-NaN group has no range row but still reports its
    # zero counts. Join BEFORE the repartition so the in-partition sort is
    # the last thing the fold sees.
    src = (keyed.join(F.broadcast(rngs), on=key, how="left")
           .repartition(*[F.col(c) for c in key])
           .sortWithinPartitions(*key, "scene_id"))
    return src.mapInArrow(fold_fn, schema)


_GRAN_UNIT_ALIASES = {
    "day": "day", "days": "day",
    "month": "month", "months": "month",
    "year": "year", "years": "year",
}


def parse_granularity(granularity: str) -> tuple[int, str]:
    """Parse a GRASS-style granularity string ``"<n> <unit>"`` (e.g.
    ``"3 months"``, ``"1 year"``, ``"16 days"``) to ``(n, unit)`` with
    unit canonicalized to day/month/year. Raises on anything else —
    t.rast.aggregate's sub-day granularities (hours/minutes) are out of
    scope for a 16-day-revisit archive."""
    parts = str(granularity).strip().lower().split()
    if len(parts) != 2 or not parts[0].lstrip("-").isdigit():
        raise ValueError(
            f"granularity must look like '3 months', got {granularity!r}")
    n, unit = int(parts[0]), _GRAN_UNIT_ALIASES.get(parts[1])
    if n <= 0 or unit is None:
        raise ValueError(
            f"granularity must be a positive count of days/months/years, "
            f"got {granularity!r}")
    return n, unit


def epoch_start(t, granularity: str):
    """Column: the start DATE of the granularity window containing ``t``
    (a timestamp/date Column). Windows tile the calendar from the Unix
    epoch (1970-01-01), the t.rast.aggregate convention when no explicit
    origin is given: e.g. '3 months' yields Jan/Apr/Jul/Oct quarter
    starts. Pure Catalyst integer arithmetic — floor-division bucketing
    is exact and handles pre-1970 dates (negative buckets) correctly."""
    n, unit = parse_granularity(granularity)
    t = F.to_timestamp(t)
    if unit == "day":
        d = F.datediff(F.to_date(t), F.to_date(F.lit("1970-01-01")))
        b = (F.floor(d / n) * n).cast("int")
        return F.date_add(F.to_date(F.lit("1970-01-01")), b)
    months = n if unit == "month" else n * 12
    m = (F.year(t) - F.lit(1970)) * 12 + F.month(t) - F.lit(1)
    b = F.floor(m / months) * months
    yr = F.floor(b / 12)
    return F.make_date(F.lit(1970) + yr, b - yr * 12 + F.lit(1), F.lit(1))


def temporal_aggregate_tiles(tiles: DataFrame, meta: DataFrame,
                             granularity: str,
                             src_col: str = "lst_bytes",
                             footprint=None,
                             stats: tuple[str, ...] = SERIES_STATS,
                             t_col: str = "acquired_at") -> DataFrame:
    """t.rast.aggregate analog: collapse the revisit archive into one
    stat map per (footprint, granularity window) — monthly means, annual
    maxima, 16-day composites — at PLANE granularity.

    ``meta`` carries the acquisition instant per scene (``scene_id``,
    ``t_col``); it broadcast-joins onto the tiles (tiny side), the
    window-start date comes from ``epoch_start`` (pure Catalyst), and
    each (footprint, epoch, tile) group runs the exact ``series_tiles``
    stat kernel. Output rows therefore match ``series_tiles`` run on the
    window's scenes BIT-FOR-BIT (the parity test's oracle).

    Plan: one broadcast join + ONE hash shuffle of the plane bytes on the
    output key — identical shape to series_tiles, the epoch merely widens
    the key. Loud failures: a scene missing from ``meta`` surfaces as a
    NULL epoch group and raises (never silently drops or mis-buckets);
    mis-registered revisit shapes inside a window raise as in
    series_tiles.
    """
    unknown = set(stats) - set(SERIES_ALL_STATS)
    if unknown:
        raise ValueError(f"unknown series stats {sorted(unknown)}")
    fp = (footprint if footprint is not None
          else F.regexp_replace("scene_id", r"R\d+$", ""))
    stats_t = tuple(stats)
    flds = _series_schema(stats_t).fields
    schema = StructType([flds[0], StructField("epoch", DateType())]
                        + flds[1:])

    at = meta.select("scene_id", F.col(t_col).alias("__t"))
    keyed = (tiles.withColumn("footprint", fp)
             .join(F.broadcast(at), on="scene_id", how="left")
             .withColumn("epoch", epoch_start(F.col("__t"), granularity))
             .select("footprint", "epoch", "tile_x", "tile_y", "w", "h",
                     "scene_id", src_col))

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.epoch.isna().any():
            bad = sorted(pdf.scene_id[pdf.epoch.isna()].unique())
            raise ValueError(
                f"temporal_aggregate_tiles: scenes missing from meta "
                f"(no {t_col}): {bad}")
        pdf = pdf.sort_values("scene_id", kind="mergesort")
        w, h = int(pdf.w.iloc[0]), int(pdf.h.iloc[0])
        if (pdf.w != w).any() or (pdf.h != h).any():
            fpv, ep = pdf.footprint.iloc[0], pdf.epoch.iloc[0]
            tx, ty = int(pdf.tile_x.iloc[0]), int(pdf.tile_y.iloc[0])
            raise ValueError(
                f"temporal_aggregate_tiles: mis-registered revisit stack "
                f"for footprint={fpv!r} epoch={ep} tile=({tx},{ty}): "
                f"shapes {sorted(set(zip(pdf.w, pdf.h)))}")
        stack = np.stack([codecs.decode_f32bt(b, w, h)
                          for b in pdf[src_col]])
        out = series_stack_stats(stack, stats_t)
        row = {
            "footprint": [pdf.footprint.iloc[0]],
            "epoch": [pdf.epoch.iloc[0]],
            "tile_x": [int(pdf.tile_x.iloc[0])],
            "tile_y": [int(pdf.tile_y.iloc[0])],
            "w": [w], "h": [h], "n_dates": [len(pdf)],
            "n_px_any": [int((np.isfinite(stack).sum(0) > 0).sum())],
        }
        for s in stats_t:
            plane = out[s].astype("<f4")
            row[f"{s}_bytes"] = [plane.tobytes()]
            any_ok = bool(np.isfinite(plane).any())
            row[f"{s}_mean"] = [float(np.nanmean(plane)) if any_ok else None]
        return pd.DataFrame(row)

    return (keyed.groupBy("footprint", "epoch", "tile_x", "tile_y")
            .applyInPandas(fn, schema))


_CROSSTAB_PART = StructType([
    StructField("scene_id", StringType()),
    StructField("class_a", IntegerType()),
    StructField("class_b", IntegerType()),
    StructField("n_px", LongType()),
])


def crosstab_tiles(tiles: DataFrame, col_a: str = "lst_bytes",
                   col_b: str = "cwv_bytes", levels_a: int = 16,
                   levels_b: int = 16) -> DataFrame:
    """r.cross / r.stats analog: per-scene co-occurrence area table of two
    globally-quantized planes.

    Classes are linear bins over the per-scene finite (min, max) of each
    plane (`multiband.scene_ranges` — one extra scan + tiny agg per
    plane, the same global-quantization contract as texture/stretch).
    Class -1 collects pixels NaN in either plane, so the table is a
    complete partition of the raster: ``sum(n_px)`` == total pixels.

    Plan: one mapInArrow fold (2-D bincount per tile -> at most
    (levels_a+1)(levels_b+1) rows) then ONE map-side-combining SUM on
    (scene, ca, cb). Pixels never reach the exchange.
    """
    if levels_a < 2 or levels_b < 2:
        raise ValueError("levels must be >= 2")
    # per-scene ranges as tiny DataFrames broadcast-joined on scene_id (a
    # closure dict would grow O(scenes) and ship per task)
    ra = scene_ranges_df(tiles, col_a).select(
        "scene_id", F.col("vmin").alias("vmin_a"), F.col("vmax").alias("vmax_a"))
    rb = scene_ranges_df(tiles, col_b).select(
        "scene_id", F.col("vmin").alias("vmin_b"), F.col("vmax").alias("vmax_b"))

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in _CROSSTAB_PART}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                a = codecs.decode_f32bt(getattr(row, col_a), w, h)
                b = codecs.decode_f32bt(getattr(row, col_b), w, h)
                # all-NaN planes have no range row (NULL after the left
                # join); any range quantizes them identically (class -1)
                qa = _quantize(a, *((0.0, 1.0) if row.vmin_a is None
                                    else (row.vmin_a, row.vmax_a)), levels_a)
                qb = _quantize(b, *((0.0, 1.0) if row.vmin_b is None
                                    else (row.vmin_b, row.vmax_b)), levels_b)
                # -1 (NaN) folds into the 0 slot of a (levels+1)-wide grid
                idx = ((qa.ravel() + 1).astype(np.int64) * (levels_b + 1)
                       + (qb.ravel() + 1))
                cnt = np.bincount(idx, minlength=(levels_a + 1) * (levels_b + 1))
                for k in np.flatnonzero(cnt):
                    ap["scene_id"](row.scene_id)
                    ap["class_a"](int(k // (levels_b + 1)) - 1)
                    ap["class_b"](int(k % (levels_b + 1)) - 1)
                    ap["n_px"](int(cnt[k]))
            if cols["scene_id"]:
                yield _batch_from_cols(cols, _CROSSTAB_PART)

    # mapInArrow cannot column-prune: select only what the kernel reads so
    # unrelated plane columns never serialize through Arrow
    src = (tiles.select("scene_id", "w", "h", col_a, col_b)
           .join(F.broadcast(ra), on="scene_id", how="left")
           .join(F.broadcast(rb), on="scene_id", how="left"))
    return (src.mapInArrow(fn, _CROSSTAB_PART)
            .groupBy("scene_id", "class_a", "class_b")
            .agg(F.sum("n_px").alias("n_px")))


_ANOM_SCHEMA = StructType([
    StructField("footprint", StringType()),
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("z_bytes", BinaryType()),       # f32 LE robust z planes
    StructField("n_scored", LongType()),
    StructField("n_anomaly", LongType()),
    StructField("max_abs_z", DoubleType()),
])


def anomaly_tiles(history: DataFrame, current: DataFrame, k: float = 3.0,
                  src_col: str = "lst_bytes", footprint=None,
                  min_obs: int = 2) -> DataFrame:
    """Per-pixel thermal anomaly detection — THE consumer product of an
    LST revisit series (fire/heat-event flagging): score each pixel of
    the ``current`` revisit by z = (current - median_history) /
    stddev_history and count |z| > k.

    ``history`` and ``current`` are tile tables (the caller splits, so
    the baseline is never contaminated by the scored revisit). Plan:
    `series_tiles` folds the history (ONE shuffle of the history planes
    on the tile key), then ONE equi join attaches the current plane and
    a vectorized Arrow kernel scores it — every plane crosses the
    exchange exactly once.

    Semantics: a pixel scores only if it is finite in ``current`` AND
    its history has >= ``min_obs`` observations; zero-spread history
    (stddev == 0) gives z = 0 when current equals the median and
    +/-inf otherwise (an always-anomaly — a change from a perfectly
    stable baseline); unscored pixels are NaN in the z plane.
    """
    if not np.isfinite(k) or k <= 0:
        raise ValueError(f"k must be finite and > 0, got {k}")
    ser = series_tiles(history, src_col=src_col, footprint=footprint,
                       stats=("count", "median", "stddev"))
    fp = (footprint if footprint is not None
          else F.regexp_replace("scene_id", r"R\d+$", ""))
    cur = current.select(
        fp.alias("footprint"), "scene_id", "tile_x", "tile_y", "w", "h",
        F.col(src_col).alias("cur_bytes"))
    joined = cur.join(
        ser.select("footprint", "tile_x", "tile_y",
                   "count_bytes", "median_bytes", "stddev_bytes"),
        on=["footprint", "tile_x", "tile_y"])

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in _ANOM_SCHEMA}
            ap = {kk: v.append for kk, v in cols.items()}
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                c = codecs.decode_f32bt(row.cur_bytes, w, h)
                n = codecs.decode_f32bt(row.count_bytes, w, h)
                med = codecs.decode_f32bt(row.median_bytes, w, h)
                std = codecs.decode_f32bt(row.stddev_bytes, w, h)
                ok = np.isfinite(c) & (n >= min_obs)
                z = np.full((h, w), np.nan)
                with np.errstate(divide="ignore", invalid="ignore"):
                    zs = np.where(std > 0, (c - med) / std,
                                  np.where(c == med, 0.0,
                                           np.sign(c - med) * np.inf))
                z[ok] = zs[ok]
                anom = ok & (np.abs(z) > k)
                ap["footprint"](row.footprint)
                ap["scene_id"](row.scene_id)
                ap["tile_x"](int(row.tile_x)); ap["tile_y"](int(row.tile_y))
                ap["w"](w); ap["h"](h)
                ap["z_bytes"](z.astype("<f4").tobytes())
                ap["n_scored"](int(ok.sum()))
                ap["n_anomaly"](int(anom.sum()))
                fin = np.isfinite(z)
                ap["max_abs_z"](float(np.abs(z[fin]).max()) if fin.any()
                                else None)
            if cols["footprint"]:
                yield _batch_from_cols(cols, _ANOM_SCHEMA)

    return joined.mapInArrow(fn, _ANOM_SCHEMA)


_GAPFILL_FIELDS = [
    StructField("footprint", StringType()),
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("filled_bytes", BinaryType()),
    StructField("n_filled", LongType()),
]


def gapfill_stack(stack: np.ndarray, times: np.ndarray,
                  max_gap_days: float | None = None) -> np.ndarray:
    """Time-weighted linear interpolation of INTERIOR NaN gaps along axis 0
    of a (k, h, w) stack observed at ``times`` (float days, ascending).
    Leading/trailing NaNs stay NaN (no extrapolation — the t.rast.gapfill
    convention); an all-NaN pixel stays all-NaN. ``max_gap_days`` skips
    gaps whose bracketing valid observations are further apart than that.
    Fully vectorized: running prev/next valid-index scans + one gather,
    no per-pixel loop. Shared verbatim with the tests' per-pixel oracle's
    counterpart assertions."""
    k = stack.shape[0]
    valid = np.isfinite(stack)
    idx = np.arange(k, dtype=np.int64)[:, None, None]
    prev = np.maximum.accumulate(np.where(valid, idx, -1), axis=0)
    nxt = np.flip(np.minimum.accumulate(
        np.flip(np.where(valid, idx, k), axis=0), axis=0), axis=0)
    fill = (~valid) & (prev >= 0) & (nxt < k)
    if not fill.any():
        return stack.copy()
    pi = np.clip(prev, 0, k - 1)
    ni = np.clip(nxt, 0, k - 1)
    pv = np.take_along_axis(stack, pi, axis=0)
    nv = np.take_along_axis(stack, ni, axis=0)
    tp = times[pi]
    tn = times[ni]
    span = tn - tp
    if max_gap_days is not None:
        fill &= span <= float(max_gap_days)
    with np.errstate(invalid="ignore", divide="ignore"):
        wgt = np.where(span > 0, (times[:, None, None] - tp) / span, 0.5)
        est = pv + (nv - pv) * wgt
    out = stack.copy()
    out[fill] = est[fill]
    return out


def gapfill_tiles(tiles: DataFrame, meta: DataFrame,
                  src_col: str = "lst_bytes",
                  footprint=None, t_col: str = "acquired_at",
                  max_gap_days: float | None = None) -> DataFrame:
    """t.rast.gapfill analog: fill per-pixel temporal NaN gaps (cloud
    holes, QA-masked pixels) by time-weighted linear interpolation between
    the nearest valid observation before and after, per footprint stack.

    Emits ONE row per input tile (k planes in, k planes out — the revisit
    keeps its ``scene_id``) with the filled plane and the count of filled
    pixels. Leading/trailing gaps never extrapolate; ``max_gap_days``
    bounds how wide a gap may be bridged.

    Plan: broadcast join of the acquisition instants + ONE hash shuffle of
    the plane bytes on the (footprint, tile) key — the series_tiles shape.
    Loud failures: scenes missing from ``meta`` raise (never mis-fill with
    a fabricated order); mis-registered shapes inside a stack raise.
    """
    fp = (footprint if footprint is not None
          else F.regexp_replace("scene_id", r"R\d+$", ""))
    at = meta.select("scene_id", F.col(t_col).alias("__t"))
    keyed = (tiles.withColumn("footprint", fp)
             .join(F.broadcast(at), on="scene_id", how="left")
             .select("footprint", "scene_id", "tile_x", "tile_y",
                     "w", "h", "__t", src_col))
    schema = StructType(_GAPFILL_FIELDS)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["__t"].isna().any():
            bad = sorted(pdf.scene_id[pdf["__t"].isna()].unique())
            raise ValueError(
                f"gapfill_tiles: scenes missing from meta (no {t_col}): "
                f"{bad}")
        pdf = pdf.sort_values(["__t", "scene_id"],
                              kind="mergesort").reset_index(drop=True)
        w, h = int(pdf.w.iloc[0]), int(pdf.h.iloc[0])
        if (pdf.w != w).any() or (pdf.h != h).any():
            raise ValueError(
                f"gapfill_tiles: mis-registered revisit stack for "
                f"footprint={pdf.footprint.iloc[0]!r} tile="
                f"({int(pdf.tile_x.iloc[0])},{int(pdf.tile_y.iloc[0])}): "
                f"shapes {sorted(set(zip(pdf.w, pdf.h)))}")
        stack = np.stack([codecs.decode_f32bt(b, w, h)
                          for b in pdf[src_col]])
        times = (pd.to_datetime(pdf["__t"]).astype("int64").to_numpy()
                 / 86_400_000_000_000.0)  # ns -> days
        filled = gapfill_stack(stack, times, max_gap_days)
        n_filled = (np.isfinite(filled) & ~np.isfinite(stack)).reshape(
            len(pdf), -1).sum(axis=1)
        return pd.DataFrame({
            "footprint": pdf.footprint,
            "scene_id": pdf.scene_id,
            "tile_x": pdf.tile_x.astype(int),
            "tile_y": pdf.tile_y.astype(int),
            "w": w, "h": h,
            "filled_bytes": [p.astype("<f4").tobytes() for p in filled],
            "n_filled": n_filled.astype(np.int64),
        })

    return (keyed.groupBy("footprint", "tile_x", "tile_y")
            .applyInPandas(fn, schema))


_REGR_PART = StructType([
    StructField("scene_id", StringType()),
    StructField("n", LongType()),
    StructField("sx", DoubleType()),
    StructField("sy", DoubleType()),
    StructField("sxx", DoubleType()),
    StructField("syy", DoubleType()),
    StructField("sxy", DoubleType()),
])


def regression_tiles(tiles: DataFrame, col_x: str = "cwv_bytes",
                     col_y: str = "lst_bytes") -> DataFrame:
    """r.regression.line analog: per-scene ordinary least squares between
    two co-registered planes (y = a + b*x over pixels where BOTH are
    finite), with correlation R and the F statistic — the classic
    LST-vs-CWV / band-vs-band calibration check.

    Every statistic is closed-form in the six partial sums (n, Σx, Σy,
    Σx², Σy², Σxy), each a tile-local numpy fold emitted as ONE tiny row
    per tile — so the whole product is one mapInArrow pass + ONE
    map-side-combining SUM per scene: rows reaching the exchange are
    bounded by the tile count, never pixels. Scenes with < 2 paired
    pixels (or zero x-variance) report NULL slope/intercept/R/F.
    """
    src = tiles.select("scene_id", "w", "h", col_x, col_y)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in _REGR_PART}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                x = codecs.decode_f32bt(getattr(row, col_x), w, h)
                y = codecs.decode_f32bt(getattr(row, col_y), w, h)
                ok = np.isfinite(x) & np.isfinite(y)
                if not ok.any():
                    continue
                xv, yv = x[ok], y[ok]
                ap["scene_id"](row.scene_id)
                ap["n"](int(ok.sum()))
                ap["sx"](float(xv.sum())); ap["sy"](float(yv.sum()))
                ap["sxx"](float((xv * xv).sum()))
                ap["syy"](float((yv * yv).sum()))
                ap["sxy"](float((xv * yv).sum()))
            if cols["scene_id"]:
                yield _batch_from_cols(cols, _REGR_PART)

    agg = (src.mapInArrow(fn, _REGR_PART)
           .groupBy("scene_id")
           .agg(F.sum("n").alias("n"),
                F.sum("sx").alias("sx"), F.sum("sy").alias("sy"),
                F.sum("sxx").alias("sxx"), F.sum("syy").alias("syy"),
                F.sum("sxy").alias("sxy")))
    n = F.col("n").cast("double")
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vary = F.col("syy") - F.col("sy") * F.col("sy") / n
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    usable = (F.col("n") >= 2) & (varx > 0.0)
    b = F.when(usable, cov / varx)
    a = (F.col("sy") - F.col("b") * F.col("sx")) / n
    r = F.when(vary > 0.0, F.col("cov_") / F.sqrt(F.col("varx_") * vary))
    return (agg
            .withColumn("varx_", varx).withColumn("cov_", cov)
            .withColumn("b", b)
            .withColumn("a", F.when(F.col("b").isNotNull(), a))
            .withColumn("r", F.when(usable, r))
            .withColumn("f", F.when(
                usable & (F.col("n") > 2) & (F.col("r") < 1.0)
                & (F.col("r") > -1.0),
                F.col("r") * F.col("r") * (n - 2)
                / (1.0 - F.col("r") * F.col("r"))))
            .select("scene_id", "n", "a", "b", "r", "f"))


_ACCUM_FIELDS = [
    StructField("footprint", StringType()),
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("accum_bytes", BinaryType()),
    StructField("step", IntegerType()),
]


def accumulate_stack(stack: np.ndarray, lower: float = 0.0,
                     upper: float | None = None,
                     skip_nulls: bool = True) -> np.ndarray:
    """t.rast.accumulate kernel: running per-pixel accumulation of
    clip(v, lower, upper) - lower along axis 0 (the growing-degree-day
    form: lower = base temperature, upper = optional cap).

    skip_nulls=True (the GRASS -n convention): a NaN observation
    contributes 0 and the accumulation continues. skip_nulls=False: a NaN
    poisons that pixel's series from that step on (plain cumsum NaN
    propagation — the GRASS default where null input yields null
    accumulation)."""
    hi = np.inf if upper is None else float(upper)
    if hi <= lower:
        raise ValueError(f"upper ({upper}) must exceed lower ({lower})")
    contrib = np.clip(stack, lower, hi) - lower
    if skip_nulls:
        contrib = np.nan_to_num(contrib, nan=0.0)
    return np.cumsum(contrib, axis=0)


def accumulate_tiles(tiles: DataFrame, meta: DataFrame,
                     src_col: str = "lst_bytes",
                     footprint=None, t_col: str = "acquired_at",
                     lower: float = 0.0, upper: float | None = None,
                     skip_nulls: bool = True) -> DataFrame:
    """t.rast.accumulate analog: per-pixel running accumulation across the
    time-sorted revisits of each footprint (growing degree days, cumulative
    exceedance). Emits one plane per revisit (k in, k out, each keeping its
    ``scene_id`` plus its 0-based ``step`` in time order).

    Plan: broadcast join of the acquisition instants + ONE hash shuffle of
    the plane bytes on the (footprint, tile) key — the gapfill_tiles shape.
    Scenes missing from ``meta`` raise; mis-registered shapes raise.
    """
    accumulate_stack(np.zeros((1, 1, 1)), lower, upper, skip_nulls)  # args
    fp = (footprint if footprint is not None
          else F.regexp_replace("scene_id", r"R\d+$", ""))
    at = meta.select("scene_id", F.col(t_col).alias("__t"))
    keyed = (tiles.withColumn("footprint", fp)
             .join(F.broadcast(at), on="scene_id", how="left")
             .select("footprint", "scene_id", "tile_x", "tile_y",
                     "w", "h", "__t", src_col))
    schema = StructType(_ACCUM_FIELDS)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["__t"].isna().any():
            bad = sorted(pdf.scene_id[pdf["__t"].isna()].unique())
            raise ValueError(
                f"accumulate_tiles: scenes missing from meta (no {t_col}): "
                f"{bad}")
        pdf = pdf.sort_values(["__t", "scene_id"],
                              kind="mergesort").reset_index(drop=True)
        w, h = int(pdf.w.iloc[0]), int(pdf.h.iloc[0])
        if (pdf.w != w).any() or (pdf.h != h).any():
            raise ValueError(
                f"accumulate_tiles: mis-registered revisit stack for "
                f"footprint={pdf.footprint.iloc[0]!r} tile="
                f"({int(pdf.tile_x.iloc[0])},{int(pdf.tile_y.iloc[0])}): "
                f"shapes {sorted(set(zip(pdf.w, pdf.h)))}")
        stack = np.stack([codecs.decode_f32bt(b, w, h)
                          for b in pdf[src_col]])
        acc = accumulate_stack(stack, lower, upper, skip_nulls)
        return pd.DataFrame({
            "footprint": pdf.footprint,
            "scene_id": pdf.scene_id,
            "tile_x": pdf.tile_x.astype(int),
            "tile_y": pdf.tile_y.astype(int),
            "w": w, "h": h,
            "accum_bytes": [p.astype("<f4").tobytes() for p in acc],
            "step": np.arange(len(pdf), dtype=np.int32),
        })

    return (keyed.groupBy("footprint", "tile_x", "tile_y")
            .applyInPandas(fn, schema))
