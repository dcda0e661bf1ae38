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
    BinaryType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from . import codecs
from .multiband import scene_ranges_df
from .pipeline import _batch_from_cols, _batch_rows
from .texture import _quantize

SERIES_STATS = ("count", "mean", "stddev", "min", "max", "median")


def series_stack_stats(stack: np.ndarray,
                       stats: tuple[str, ...] = SERIES_STATS,
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
    unknown = set(stats) - set(SERIES_STATS)
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
