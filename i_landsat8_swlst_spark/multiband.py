"""Multi-band raster statistics — the i.pca / i.landsat.rgb analogs.

Principal-component transform over co-registered raster planes (GRASS
``i.pca``; SURVEY.md §2 imagery-group surface) and global-histogram
contrast operations, structured for the 100 TB execution model:

- **Moments pass** (``band_moments``): per-tile partial sums of the
  cross-moment matrix — ``n``, ``Σx_i``, ``Σx_i·x_j`` over pixels valid in
  EVERY band — in one mapInArrow hop, then ONE map-side-combining groupBy.
  What reaches the driver is B + B(B+1)/2 + 1 doubles per scene, never
  pixels, so the pass costs one scan regardless of scale.
- **Eigendecomposition on the driver**: the covariance matrix is B×B
  (bands, not pixels); ``np.linalg.eigh`` plus a deterministic sign
  convention (the largest-|loading| element of every component is
  positive, ties to the lower band index by eigh's ordering).
- **Projection pass** (``pca_tiles``): components are a closure constant
  (a few hundred bytes), applied per tile in a second mapInArrow hop —
  embarrassingly parallel, no shuffle at all.

Float caveat, stated rather than hidden: Spark's cross-tile ``sum`` order
is nondeterministic, so moments (hence eigenvectors) can differ from a
serial fold by ~1 ulp per tile. Tests therefore compare against the
whole-scene numpy oracle with 1e-8 relative tolerance; the per-tile
partials themselves are exact f64 sums over f32 planes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from . import codecs
from .pipeline import _batch_from_cols, _batch_rows

_MOMENT_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("n", LongType()),
    StructField("sums", ArrayType(DoubleType())),  # B means, then upper-tri Σx_i·x_j
])


def _decode_stack(row, band_cols: list[str]) -> np.ndarray:
    """(h*w, B) float64 stack of one tile's planes."""
    w, h = int(row.w), int(row.h)
    return np.stack(
        [codecs.decode_f32bt(getattr(row, c), w, h).astype(np.float64).ravel()
         for c in band_cols], axis=1)


def band_moments(tiles: DataFrame, band_cols: list[str]) -> DataFrame:
    """Per-scene cross-moments of the band stack: one tiny row per scene
    holding n (pixels valid in every band), ΣX (B values) and the
    upper-triangular ΣX·Xᵀ (B(B+1)/2 values). Pixels never shuffle: the
    tile pass emits one (scene, partials) row per tile, and the positional
    sum is a single map-side-combining aggregation."""
    b = len(band_cols)
    # _batch_from_cols only maps scalar field types; arrays need an
    # explicit Arrow schema
    arrow = pa.schema([pa.field("scene_id", pa.string()),
                       pa.field("n", pa.int64()),
                       pa.field("sums", pa.list_(pa.float64()))])

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in _MOMENT_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}
            iu = np.triu_indices(b)
            for row in _batch_rows(batch):
                x = _decode_stack(row, band_cols)
                x = x[np.isfinite(x).all(axis=1)]
                cross = x.T @ x  # exact f64 partials within the tile
                ap["scene_id"](row.scene_id)
                ap["n"](int(x.shape[0]))
                ap["sums"](list(x.sum(axis=0)) + list(cross[iu]))
            if cols["scene_id"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(cols[f.name], type=f.type) for f in arrow],
                    schema=arrow)

    parts = tiles.mapInArrow(fn, _MOMENT_SCHEMA)
    return (
        parts.select("scene_id", "n", F.posexplode("sums").alias("pos", "v"))
        .groupBy("scene_id", "pos")
        .agg(F.sum("v").alias("v"),
             # n repeats across a tile's B(B+3)/2 positions; fold it once
             F.sum(F.when(F.col("pos") == 0, F.col("n"))).alias("n_part"))
        .groupBy("scene_id")
        .agg(F.max("n_part").alias("n"),
             F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("sv"))
        .select("scene_id", "n", F.expr("transform(sv, s -> s.v)").alias("sums"))
    )


def _eig_components(n: int, sums: list[float], b: int, k: int):
    """Covariance (ddof=1) from the moment vector, then the top-k
    eigen-system with the deterministic sign convention."""
    mean = np.asarray(sums[:b])
    if n < 2:
        raise ValueError(f"PCA needs >= 2 valid pixels per scene, got {n}")
    mean = mean / n
    cov = np.zeros((b, b))
    iu = np.triu_indices(b)
    cov[iu] = sums[b:]
    cov = cov + np.triu(cov, 1).T
    cov = (cov - n * np.outer(mean, mean)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    for j in range(vecs.shape[1]):  # largest-|loading| positive
        if vecs[np.argmax(np.abs(vecs[:, j])), j] < 0:
            vecs[:, j] = -vecs[:, j]
    total = max(float(np.trace(cov)), 1e-300)
    return mean, vecs, vals, [float(v) / total for v in vals]


def pca_components(tiles: DataFrame, band_cols: list[str],
                   k: int | None = None) -> dict[str, dict]:
    """Collect the per-scene PCA model: {scene_id: {mean, components (B,k),
    eigvals, explained}} — the only driver-side materialization is
    scene-count × B(B+3)/2 doubles."""
    b = len(band_cols)
    k = b if k is None else min(k, b)
    out = {}
    for r in band_moments(tiles, band_cols).collect():
        mean, vecs, vals, expl = _eig_components(int(r["n"]), list(r["sums"]), b, k)
        out[r["scene_id"]] = {"mean": mean, "components": vecs,
                              "eigvals": vals, "explained": expl}
    return out


def _pca_schema(k: int) -> StructType:
    fields = [
        StructField("image_id", StringType()),
        StructField("scene_id", StringType()),
        StructField("tile_x", IntegerType()),
        StructField("tile_y", IntegerType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("n_valid", LongType()),
    ]
    for i in range(1, k + 1):
        fields.append(StructField(f"pc{i}_bytes", BinaryType()))
        fields.append(StructField(f"pc{i}_mean", DoubleType()))
    return StructType(fields)


def pca_tiles(tiles: DataFrame, band_cols: list[str], k: int | None = None,
              model: dict[str, dict] | None = None):
    """i.pca analog: project every tile's band stack onto the per-scene
    principal components. Returns (DataFrame of pc planes, model dict).

    The projection pass broadcasts nothing but the model closure (per
    scene: B doubles + B×k doubles) and emits k f32 planes per tile with
    NaN wherever ANY input band is NaN — the same all-bands validity rule
    the moments pass used, so projected stats and moments agree."""
    b = len(band_cols)
    k = b if k is None else min(k, b)
    model = pca_components(tiles, band_cols, k) if model is None else model
    schema = _pca_schema(k)
    slim = {s: (m["mean"], m["components"]) for s, m in model.items()}

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in schema}
            ap = {kk: v.append for kk, v in cols.items()}
            for row in _batch_rows(batch):
                mean, vecs = slim[row.scene_id]
                w, h = int(row.w), int(row.h)
                x = _decode_stack(row, band_cols)
                ok = np.isfinite(x).all(axis=1)
                proj = (np.nan_to_num(x) - mean) @ vecs
                proj[~ok] = np.nan
                ap["image_id"](getattr(row, "image_id", None))
                ap["scene_id"](row.scene_id)
                ap["tile_x"](row.tile_x); ap["tile_y"](row.tile_y)
                ap["w"](w); ap["h"](h)
                ap["n_valid"](int(ok.sum()))
                for i in range(k):
                    plane = proj[:, i].reshape(h, w)
                    ap[f"pc{i+1}_bytes"](plane.astype("<f4").tobytes())
                    ap[f"pc{i+1}_mean"](
                        float(np.nanmean(plane)) if ok.any() else None)
            if cols["scene_id"]:
                yield _batch_from_cols(cols, schema)

    return tiles.mapInArrow(fn, schema), model


# --------------------------------------------------------------------------
# Global-histogram contrast operations — the r.colors -e (histogram
# equalization) / i.landsat.rgb percentile-stretch analog.
#
# Both need GLOBAL per-scene order statistics, which at 100 TB can't come
# from a sort: instead a fixed-bin histogram is folded in one scan (per-tile
# np.bincount -> tiny (scene, bin, count) rows -> ONE map-side-combining
# agg), the driver derives the cut points / CDF LUT from <= `bins` counts,
# and a second shuffle-free pass applies the LUT per tile. The binning
# formula is shared verbatim with the numpy oracle in tests, so results are
# bit-identical to a whole-scene serial computation (histogram methods are
# exact given the same bins — the approximation is the bin width itself,
# which is the documented contract, not a divergence).
# --------------------------------------------------------------------------

_RANGE_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("vmin", DoubleType()),
    StructField("vmax", DoubleType()),
])

_HIST_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("bin", IntegerType()),
    StructField("cnt", LongType()),
])


def _plane64(row, src_col: str) -> np.ndarray:
    return codecs.decode_f32bt(
        getattr(row, src_col), int(row.w), int(row.h)).astype(np.float64)


def scene_ranges(tiles: DataFrame, src_col: str) -> dict[str, tuple]:
    """Per-scene finite (min, max) of one plane column — one scan, one agg."""
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in _RANGE_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                x = _plane64(row, src_col)
                x = x[np.isfinite(x)]
                if x.size:
                    ap["scene_id"](row.scene_id)
                    ap["vmin"](float(x.min())); ap["vmax"](float(x.max()))
            if cols["scene_id"]:
                yield _batch_from_cols(cols, _RANGE_SCHEMA)

    # mapInArrow cannot column-prune: select only what the scan reads so
    # sibling plane columns never serialize through Arrow for a range agg
    agg = (tiles.select("scene_id", "w", "h", src_col)
           .mapInArrow(fn, _RANGE_SCHEMA)
           .groupBy("scene_id")
           .agg(F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax")))
    return {r["scene_id"]: (float(r["vmin"]), float(r["vmax"]))
            for r in agg.collect()}


def _bin_plane(x: np.ndarray, vmin: float, vmax: float, bins: int) -> np.ndarray:
    """The shared binning formula (tests replicate it verbatim): linear in
    [vmin, vmax], right-edge value lands in the last bin."""
    span = max(vmax - vmin, 1e-300)
    return np.clip(((x - vmin) * (bins / span)).astype(np.int64), 0, bins - 1)


def scene_histograms(tiles: DataFrame, src_col: str,
                     ranges: dict[str, tuple], bins: int) -> dict[str, np.ndarray]:
    """Per-scene fixed-bin histogram: per-tile np.bincount, tiny
    (scene, bin, cnt) rows, ONE map-side-combining agg."""
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in _HIST_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                vmin, vmax = ranges[row.scene_id]
                x = _plane64(row, src_col)
                x = x[np.isfinite(x)]
                if not x.size:
                    continue
                c = np.bincount(_bin_plane(x, vmin, vmax, bins), minlength=bins)
                for b in np.nonzero(c)[0]:
                    ap["scene_id"](row.scene_id)
                    ap["bin"](int(b)); ap["cnt"](int(c[b]))
            if cols["scene_id"]:
                yield _batch_from_cols(cols, _HIST_SCHEMA)

    agg = (tiles.mapInArrow(fn, _HIST_SCHEMA)
           .groupBy("scene_id", "bin").agg(F.sum("cnt").alias("cnt")))
    out = {s: np.zeros(bins, dtype=np.int64) for s in ranges}
    for r in agg.collect():
        out[r["scene_id"]][int(r["bin"])] = int(r["cnt"])
    return out


STRETCH_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("out_bytes", BinaryType()),   # uint8 plane; 0 also = NULL cell
    StructField("mask_bytes", BinaryType()),  # uint8 validity plane (1 = valid)
    StructField("n_valid", LongType()),
    StructField("out_mean", DoubleType()),
])


def stretch_tiles(tiles: DataFrame, src_col: str = "lst_bytes",
                  mode: str = "equalize", lo_pct: float = 2.0,
                  hi_pct: float = 98.0, bins: int = 4096):
    """Render a float plane to display-ready uint8 with GLOBAL per-scene
    contrast: ``mode="equalize"`` maps each pixel to 255*CDF(bin(x))
    (histogram equalization, r.colors -e); ``mode="linear"`` clips at the
    lo/hi percentile cuts (interpolated within their bin — the standard
    2-98% satellite stretch) and scales linearly. Three scans total (range,
    histogram, apply), zero pixel shuffles; the LUT rides as a closure
    constant. Returns (DataFrame, luts) where luts[scene] is the bins->u8
    mapping used (test oracle replays it serially)."""
    if mode not in ("equalize", "linear"):
        raise ValueError(f"unknown stretch mode {mode!r}")
    ranges = scene_ranges(tiles, src_col)
    hists = scene_histograms(tiles, src_col, ranges, bins)
    luts: dict[str, np.ndarray] = {}
    for s, h in hists.items():
        n = int(h.sum())
        if n == 0:
            luts[s] = np.zeros(bins, dtype=np.uint8)
            continue
        if mode == "equalize":
            cdf = np.cumsum(h) / n
            luts[s] = np.round(cdf * 255.0).astype(np.uint8)
        else:
            vmin, vmax = ranges[s]
            width = max(vmax - vmin, 1e-300) / bins
            edges = vmin + width * np.arange(bins + 1)
            cum = np.concatenate([[0], np.cumsum(h)]) / n * 100.0
            cut_lo = float(np.interp(lo_pct, cum, edges))
            cut_hi = float(np.interp(hi_pct, cum, edges))
            centers = edges[:-1] + width / 2
            scaled = (centers - cut_lo) / max(cut_hi - cut_lo, 1e-300)
            luts[s] = np.round(np.clip(scaled, 0.0, 1.0) * 255.0).astype(np.uint8)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in STRETCH_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                vmin, vmax = ranges[row.scene_id]
                lut = luts[row.scene_id]
                x = _plane64(row, src_col)
                ok = np.isfinite(x)
                out = np.zeros(x.shape, dtype=np.uint8)
                out[ok] = lut[_bin_plane(x[ok], vmin, vmax, bins)]
                ap["image_id"](getattr(row, "image_id", None))
                ap["scene_id"](row.scene_id)
                ap["tile_x"](row.tile_x); ap["tile_y"](row.tile_y)
                ap["w"](int(row.w)); ap["h"](int(row.h))
                ap["out_bytes"](out.tobytes())
                ap["mask_bytes"](ok.astype(np.uint8).tobytes())
                ap["n_valid"](int(ok.sum()))
                ap["out_mean"](float(out[ok].mean()) if ok.any() else None)
            if cols["scene_id"]:
                yield _batch_from_cols(cols, STRETCH_SCHEMA)

    return tiles.mapInArrow(fn, STRETCH_SCHEMA), luts
