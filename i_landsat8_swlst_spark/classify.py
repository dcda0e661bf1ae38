"""Unsupervised classification — the i.cluster / i.maxlik analogs.

GRASS's imagery classification pipeline is ``i.cluster`` (unsupervised
k-means over an imagery group, producing a signature file of per-class
means and covariances) followed by ``i.maxlik`` (per-pixel Gaussian
maximum-likelihood classification against those signatures). Reference:
no file can be cited (the /root/reference mount is empty every round —
SURVEY.md §0); the behavioral spec is the published GRASS module pair
applied to this engine's tiled multi-band data model.

Spark-first restatement, per-scene models (GRASS's "current region" is a
scene here, like every other multiband op):

- **Init** (``i.cluster``'s spread seeding): one `band_moments` pass gives
  per-scene mean/stddev per band; the k initial centers sit evenly spaced
  on the mean ± stddev diagonal (center_j = mean + (2j/(k-1) - 1)·std,
  k=1 → the mean). Deterministic — no RNG, no data-order dependence.
- **Lloyd iterations**: each iteration is ONE tile scan. Current centers
  ride as a TINY DataFrame broadcast-joined on ``scene_id`` (never a
  closure dict — O(scenes) state must not re-serialize per task, VERDICT
  r4 item 4). The kernel assigns each valid pixel to its nearest center
  (exact elementwise squared distance, lowest-index tie-break) and emits
  per-(scene, class) partial sums; a positional map-side-combining SUM
  reduces them to k·B doubles per scene, and the new centers derive
  DISTRIBUTED (applyInPandas per scene). An empty class keeps its previous
  center — deterministic, matches the serial oracle's rule. The tiny
  centers frame localCheckpoints per iteration so lineage stays flat
  (iters × scan otherwise re-derives every previous iteration).
- **Signatures** (``i.gensig``-shaped output of i.cluster): one more scan
  accumulates per-class n, ΣX, ΣX·Xᵀ under the converged assignment; per
  scene the B×B class covariances (ddof=1), their inverses and log-dets
  derive distributed. A class too small or singular for a stable inverse
  gets an escalating ridge (ε·mean(diag)·I, ε doubling from 1e-9) —
  documented determinism where GRASS i.gensig would refuse the class.
- **Classification** (``i.maxlik``): equal-prior Gaussian discriminant
  g_c(x) = -½·logdet_c - ½·(x-μ_c)ᵀΣ_c⁻¹(x-μ_c), argmax with
  lowest-index tie-break (GRASS sig files carry no priors). ``nearest``
  classifies by the k-means metric instead (argmin squared distance) —
  the i.cluster assignment itself. Either way: broadcast model join +
  ONE mapInArrow hop; pixels never shuffle. NaN-in-any-band pixels get
  class 255 and a NaN score (the reject/NULL class; r.mapcalc NULL
  semantics).

Float caveat, stated like multiband's: cross-tile partial-sum order is
nondeterministic, so centers/covariances differ from a serial fold by
~1 ulp; tests compare models at 1e-8 relative tolerance and assert EXACT
assignment equality only on margin-separated synthetic blobs.

Scale: every pass is one scan + one tiny-row shuffle; what crosses an
exchange is O(scenes · k · B²) doubles, never pixels. At 10⁶ scenes the
model table is still only megabytes and stays a broadcast join.
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

from .multiband import _decode_stack, band_moments
from .pipeline import _batch_rows

_KM_MODEL_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("k", IntegerType()),
    StructField("b", IntegerType()),
    StructField("centers", ArrayType(DoubleType())),   # (k, B) row-major
    StructField("counts", ArrayType(LongType())),      # last-iteration sizes
])

_ML_MODEL_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("k", IntegerType()),
    StructField("b", IntegerType()),
    StructField("means", ArrayType(DoubleType())),     # (k, B) row-major
    StructField("invcov", ArrayType(DoubleType())),    # (k, B, B) row-major
    StructField("logdet", ArrayType(DoubleType())),    # k values
    StructField("counts", ArrayType(LongType())),
])

_PART_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("cls", IntegerType()),
    StructField("n", LongType()),
    StructField("sums", ArrayType(DoubleType())),      # ΣX (+ triu ΣX·Xᵀ)
])

CLASSIFY_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("class_bytes", BinaryType()),   # u8 plane; 255 = NULL/reject
    StructField("score_bytes", BinaryType()),   # f32 LE: -d² or log-lik
    StructField("n_valid", LongType()),
    StructField("counts", ArrayType(LongType())),  # per-class pixels, len k
])


_FEAT_SCHEMA = StructType([
    StructField("scene_id", StringType()),
    StructField("n", LongType()),                      # valid pixels in tile
    StructField("xflat", ArrayType(DoubleType())),     # (n, B) row-major
])


def class_features(tiles: DataFrame, band_cols: list[str]) -> DataFrame:
    """Decode-once feature frame for model fitting: one row per tile holding
    the finite-in-every-band pixel stack as a flat double array. Lloyd runs
    ``iters`` scans over its input; persisting THIS frame (instead of
    re-reading + re-decoding the f32 tile bytes every iteration) makes the
    fit one decode per tile total (VERDICT-r5 item 10). The trade is
    explicit: the cached stack is 8 B/pixel/band (~2x the f32 tile bytes),
    so callers persist MEMORY_AND_DISK and it spills rather than OOMs —
    at 100 TB that is iters x (scan+decode) traded for 1 x decode + spill
    reads of a columnar-compact array column."""

    arrow = pa.schema([pa.field("scene_id", pa.string()),
                       pa.field("n", pa.int64()),
                       pa.field("xflat", pa.list_(pa.float64()))])

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            sids: list[str] = []
            ns: list[int] = []
            chunks: list[np.ndarray] = []
            offs = [0]
            for row in _batch_rows(batch):
                x = _decode_stack(row, band_cols)
                x = x[np.isfinite(x).all(axis=1)]
                if x.shape[0] == 0:
                    continue
                sids.append(row.scene_id)
                ns.append(int(x.shape[0]))
                chunks.append(x.ravel())
                offs.append(offs[-1] + x.size)
            if sids:
                # Arrow-native list assembly: one concatenated values buffer,
                # no per-element Python boxing (a list(...) here costs more
                # than the decode it replaces)
                vals = pa.array(np.concatenate(chunks), type=pa.float64())
                xarr = pa.ListArray.from_arrays(
                    pa.array(offs, type=pa.int32()), vals)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(sids, type=pa.string()),
                     pa.array(ns, type=pa.int64()), xarr], schema=arrow)

    return tiles.select("scene_id", "w", "h", *band_cols).mapInArrow(
        fn, _FEAT_SCHEMA)


def _list_views(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(values, offsets) numpy views of an Arrow list<double> column —
    per-row slices reshape without to_pylist boxing."""
    flat = col.values.to_numpy(zero_copy_only=False)
    offs = col.offsets.to_numpy()
    return flat, offs


def _moments_from_features(feats: DataFrame, b: int) -> DataFrame:
    """band_moments' (scene_id, n, sums) tiny frame, sourced from a
    class_features frame instead of raw tile bytes — same positional
    map-side-combining reduction, zero additional decodes."""
    arrow = pa.schema([pa.field("scene_id", pa.string()),
                       pa.field("n", pa.int64()),
                       pa.field("sums", pa.list_(pa.float64()))])

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        iu = np.triu_indices(b)
        for batch in batches:
            cols: dict[str, list] = {"scene_id": [], "n": [], "sums": []}
            ap = {k: v.append for k, v in cols.items()}
            names = batch.schema.names
            sid = batch.column(names.index("scene_id")).to_pylist()
            flat, offs = _list_views(batch.column(names.index("xflat")))
            for i in range(batch.num_rows):
                x = flat[offs[i]:offs[i + 1]].reshape(-1, b)
                cross = x.T @ x
                ap["scene_id"](sid[i])
                ap["n"](int(x.shape[0]))
                ap["sums"](list(x.sum(axis=0)) + list(cross[iu]))
            if cols["scene_id"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(cols[f.name], type=f.type) for f in arrow],
                    schema=arrow)

    parts = feats.mapInArrow(fn, StructType([
        StructField("scene_id", StringType()),
        StructField("n", LongType()),
        StructField("sums", ArrayType(DoubleType()))]))
    return (
        parts.select("scene_id", "n", F.posexplode("sums").alias("pos", "v"))
        .groupBy("scene_id", "pos")
        .agg(F.sum("v").alias("v"),
             F.sum(F.when(F.col("pos") == 0, F.col("n"))).alias("n_part"))
        .groupBy("scene_id")
        .agg(F.max("n_part").alias("n"),
             F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("sv"))
        .select("scene_id", "n", F.expr("transform(sv, s -> s.v)").alias("sums"))
    )


def _assign(x: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """Nearest-center index per row of x — exact elementwise squared
    distance (NOT the x²-2xc+c² expansion: the expansion's cancellation
    makes assignment depend on magnitude, breaking oracle bit-parity),
    argmin lowest-index tie-break."""
    d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)


def _class_partials(tiles: DataFrame, band_cols: list[str],
                    centers_df: DataFrame, with_cross: bool,
                    decoded: bool = False) -> DataFrame:
    """Per-(scene, class) partial moments under nearest-center assignment:
    n and ΣX, plus the upper-tri ΣX·Xᵀ when ``with_cross``. One tile scan
    (centers broadcast-joined), one positional map-side-combining SUM —
    the band_moments reduction shape, keyed by (scene, cls). With
    ``decoded`` the source is a class_features frame (xflat arrays, no
    decode) instead of raw tile bytes."""
    b = len(band_cols)
    arrow = pa.schema([pa.field("scene_id", pa.string()),
                       pa.field("cls", pa.int32()),
                       pa.field("n", pa.int64()),
                       pa.field("sums", pa.list_(pa.float64()))])

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        iu = np.triu_indices(b)
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in _PART_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}

            def emit(sid, x, k, centers_flat):
                centers = np.asarray(
                    centers_flat, dtype=np.float64).reshape(k, b)
                a = _assign(x, centers)
                for cls in range(k):
                    sel = x[a == cls]
                    if sel.shape[0] == 0:
                        continue
                    s = list(sel.sum(axis=0))
                    if with_cross:
                        s += list((sel.T @ sel)[iu])
                    ap["scene_id"](sid)
                    ap["cls"](cls)
                    ap["n"](int(sel.shape[0]))
                    ap["sums"](s)

            if decoded:
                # Arrow-native views (no to_pylist of the big value buffer)
                names = batch.schema.names
                sid = batch.column(names.index("scene_id")).to_pylist()
                kk = batch.column(names.index("k")).to_pylist()
                cen = batch.column(names.index("centers")).to_pylist()
                flat, offs = _list_views(batch.column(names.index("xflat")))
                for i in range(batch.num_rows):
                    if cen[i] is None:       # scene with no model row
                        continue
                    x = flat[offs[i]:offs[i + 1]].reshape(-1, b)
                    if x.shape[0]:
                        emit(sid[i], x, int(kk[i]), cen[i])
            else:
                for row in _batch_rows(batch):
                    if row.centers is None:  # scene with no model row
                        continue
                    x = _decode_stack(row, band_cols)
                    x = x[np.isfinite(x).all(axis=1)]
                    if x.shape[0]:
                        emit(row.scene_id, x, int(row.k), row.centers)
            if cols["scene_id"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(cols[f.name], type=f.type) for f in arrow],
                    schema=arrow)

    proj = (tiles.select("scene_id", "xflat") if decoded
            else tiles.select("scene_id", "w", "h", *band_cols))
    src = proj.join(F.broadcast(centers_df.select("scene_id", "k", "centers")),
                    on="scene_id", how="left")
    parts = src.mapInArrow(fn, _PART_SCHEMA)
    return (
        parts.select("scene_id", "cls", "n", F.posexplode("sums").alias("pos", "v"))
        .groupBy("scene_id", "cls", "pos")
        .agg(F.sum("v").alias("v"),
             F.sum(F.when(F.col("pos") == 0, F.col("n"))).alias("n_part"))
        .groupBy("scene_id", "cls")
        .agg(F.max("n_part").alias("n"),
             F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("sv"))
        .select("scene_id", "cls", "n",
                F.expr("transform(sv, s -> s.v)").alias("sums"))
    )


def _init_from_moments(moments: DataFrame, band_cols: list[str],
                       k: int) -> DataFrame:
    """kmeans_init_df's spread seeding from an already-computed
    (scene_id, n, sums) moments frame — shared by the raw-tiles and the
    decode-once class_features paths."""
    import pandas as pd

    b = len(band_cols)

    def mk(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["scene_id"].iloc[0]
        n = int(pdf["n"].iloc[0])
        sums = np.asarray(pdf["sums"].iloc[0], dtype=np.float64)
        if n < 2:
            raise ValueError(f"k-means needs >= 2 valid pixels, scene {s!r} has {n}")
        mean = sums[:b] / n
        iu = np.triu_indices(b)
        # diagonal of ΣX·Xᵀ sits where triu row == col
        sq = sums[b:][iu[0] == iu[1]]
        var = np.maximum((sq - n * mean ** 2) / (n - 1), 0.0)
        std = np.sqrt(var)
        f = (np.zeros(1) if k == 1
             else 2.0 * np.arange(k) / (k - 1) - 1.0)
        centers = mean[None, :] + f[:, None] * std[None, :]
        return pd.DataFrame([{"scene_id": s, "k": k, "b": b,
                              "centers": list(centers.ravel()),
                              "counts": [0] * k}])

    return moments.groupBy("scene_id").applyInPandas(mk, _KM_MODEL_SCHEMA)


def kmeans_init_df(tiles: DataFrame, band_cols: list[str], k: int) -> DataFrame:
    """Deterministic i.cluster-style seeding: k centers evenly spaced on
    the per-scene mean ± stddev diagonal, from one band_moments pass."""
    return _init_from_moments(band_moments(tiles, band_cols), band_cols, k)


def kmeans_model_df(tiles: DataFrame, band_cols: list[str], k: int = 5,
                    iters: int = 10) -> DataFrame:
    """i.cluster: per-scene Lloyd k-means model as a TINY DataFrame
    (scene_id, k, b, centers, counts). The decoded finite-pixel feature
    stack is computed ONCE (class_features) and persisted MEMORY_AND_DISK
    across the init pass + ``iters`` Lloyd scans — one decode per tile per
    fit, the remaining iterations re-read the columnar cache (VERDICT-r5
    item 10; previously each iteration re-read and re-decoded the tile
    bytes). Returns a localCheckpointed frame (the loop has already
    materialized it; callers join it broadcast)."""
    import pandas as pd

    from pyspark import StorageLevel

    if k < 1 or k > 254:
        raise ValueError("k must be in [1, 254] (255 is the NULL class)")
    b = len(band_cols)
    feats = class_features(tiles, band_cols).persist(
        StorageLevel.MEMORY_AND_DISK)
    centers = _init_from_moments(
        _moments_from_features(feats, b), band_cols, k).localCheckpoint()

    def step(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["scene_id"].iloc[0]
        old = np.asarray(pdf["centers"].iloc[0], dtype=np.float64).reshape(k, b)
        new = old.copy()
        counts = np.zeros(k, dtype=np.int64)
        for _, r in pdf.iterrows():
            if r["cls"] is None or (isinstance(r["cls"], float) and np.isnan(r["cls"])):
                continue        # scene had a model but zero valid pixels
            c, n = int(r["cls"]), int(r["n"])
            counts[c] = n
            new[c] = np.asarray(r["sums"], dtype=np.float64)[:b] / n
        return pd.DataFrame([{"scene_id": s, "k": k, "b": b,
                              "centers": list(new.ravel()),
                              "counts": [int(c) for c in counts]}])

    try:
        for _ in range(iters):
            parts = _class_partials(feats, band_cols, centers,
                                    with_cross=False, decoded=True)
            joined = centers.join(parts, on="scene_id", how="left")
            centers = joined.groupBy("scene_id").applyInPandas(
                step, _KM_MODEL_SCHEMA).localCheckpoint()
        return centers
    finally:
        # every localCheckpoint above is eager, so the cache has served all
        # its scans by the time we land here
        feats.unpersist()


def maxlik_model_df(tiles: DataFrame, band_cols: list[str],
                    kmeans_df: DataFrame) -> DataFrame:
    """i.gensig-shaped signatures from a converged k-means model: one scan
    accumulates per-class cross-moments, then per-scene covariance inverse
    + log-det derive distributed (applyInPandas over tiny rows)."""
    import pandas as pd

    def mk(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf["scene_id"].iloc[0]
        k, b = int(pdf["k"].iloc[0]), int(pdf["b"].iloc[0])
        centers = np.asarray(pdf["centers"].iloc[0], dtype=np.float64).reshape(k, b)
        iu = np.triu_indices(b)
        means = centers.copy()                    # empty class: center, I
        invcov = np.tile(np.eye(b), (k, 1, 1))
        logdet = np.zeros(k)
        counts = np.zeros(k, dtype=np.int64)
        for _, r in pdf.iterrows():
            if r["cls"] is None or (isinstance(r["cls"], float) and np.isnan(r["cls"])):
                continue
            c, n = int(r["cls"]), int(r["n"])
            counts[c] = n
            sums = np.asarray(r["sums"], dtype=np.float64)
            mu = sums[:b] / n
            means[c] = mu
            cov = np.zeros((b, b))
            cov[iu] = sums[b:]
            cov = cov + np.triu(cov, 1).T
            cov = (cov - n * np.outer(mu, mu)) / max(n - 1, 1)
            # escalating ridge until the covariance is invertible with a
            # positive determinant AND a finite inverse (deterministic
            # where i.gensig refuses); the scale floor of 1.0 keeps a
            # zero-variance (constant) class from a subnormal epsilon
            # whose inverse overflows to inf
            eps = 1e-9 * max(float(np.trace(cov)) / b, 1.0)
            while True:
                sign, ld = np.linalg.slogdet(cov)
                if sign > 0 and np.isfinite(ld):
                    inv = np.linalg.inv(cov)
                    if np.isfinite(inv).all():
                        break
                cov = cov + eps * np.eye(b)
                eps *= 2.0
            invcov[c] = inv
            logdet[c] = ld
        return pd.DataFrame([{"scene_id": s, "k": k, "b": b,
                              "means": list(means.ravel()),
                              "invcov": list(invcov.ravel()),
                              "logdet": list(logdet),
                              "counts": [int(c) for c in counts]}])

    parts = _class_partials(tiles, band_cols, kmeans_df, with_cross=True)
    joined = kmeans_df.join(parts, on="scene_id", how="left")
    return joined.groupBy("scene_id").applyInPandas(mk, _ML_MODEL_SCHEMA)


def classify_tiles(tiles: DataFrame, band_cols: list[str],
                   model_df: DataFrame, method: str = "nearest") -> DataFrame:
    """Per-pixel classification against a per-scene model: ``nearest``
    takes a `kmeans_model_df` frame (argmin squared distance — the
    i.cluster assignment), ``maxlik`` a `maxlik_model_df` frame (argmax
    equal-prior Gaussian discriminant — i.maxlik). Broadcast model join +
    ONE mapInArrow hop; class 255 + NaN score marks NaN-in-any-band
    pixels, and a scene absent from the model yields an all-255 plane."""
    b = len(band_cols)
    if method not in ("nearest", "maxlik"):
        raise ValueError(f"unknown classify method {method!r}")
    if method == "nearest":
        model = model_df.select("scene_id", "k", "centers")
    else:
        model = model_df.select("scene_id", "k", "means", "invcov", "logdet")

    # _batch_from_cols only maps scalar field types; counts needs an
    # explicit Arrow schema (the band_moments pattern)
    arrow = pa.schema([
        pa.field("image_id", pa.string()), pa.field("scene_id", pa.string()),
        pa.field("tile_x", pa.int32()), pa.field("tile_y", pa.int32()),
        pa.field("w", pa.int32()), pa.field("h", pa.int32()),
        pa.field("class_bytes", pa.binary()), pa.field("score_bytes", pa.binary()),
        pa.field("n_valid", pa.int64()), pa.field("counts", pa.list_(pa.int64())),
    ])

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in CLASSIFY_SCHEMA}
            ap = {k_: v.append for k_, v in cols.items()}
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                x = _decode_stack(row, band_cols)
                ok = np.isfinite(x).all(axis=1)
                cls_plane = np.full(w * h, 255, dtype=np.uint8)
                score = np.full(w * h, np.nan, dtype=np.float32)
                has_model = getattr(row, "k", None) is not None
                k = int(row.k) if has_model else 0
                counts = np.zeros(k, dtype=np.int64)
                if has_model and ok.any():
                    xv = x[ok]
                    if getattr(row, "centers", None) is not None:
                        centers = np.asarray(row.centers,
                                             dtype=np.float64).reshape(k, b)
                        d = ((xv[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
                        a = d.argmin(axis=1)
                        sc = -d[np.arange(d.shape[0]), a]
                    else:
                        means = np.asarray(row.means,
                                           dtype=np.float64).reshape(k, b)
                        invcov = np.asarray(row.invcov,
                                            dtype=np.float64).reshape(k, b, b)
                        logdet = np.asarray(row.logdet, dtype=np.float64)
                        g = np.empty((xv.shape[0], k))
                        for c in range(k):
                            dx = xv - means[c]
                            g[:, c] = (-0.5 * logdet[c]
                                       - 0.5 * np.einsum(
                                           "nb,nb->n", dx @ invcov[c], dx))
                        a = g.argmax(axis=1)
                        sc = g[np.arange(g.shape[0]), a]
                    cls_plane[ok] = a.astype(np.uint8)
                    score[ok] = sc.astype(np.float32)
                    counts = np.bincount(a, minlength=k)
                ap["image_id"](getattr(row, "image_id", None))
                ap["scene_id"](row.scene_id)
                ap["tile_x"](int(row.tile_x)); ap["tile_y"](int(row.tile_y))
                ap["w"](w); ap["h"](h)
                ap["class_bytes"](cls_plane.tobytes())
                ap["score_bytes"](score.tobytes())
                ap["n_valid"](int(ok.sum()))
                ap["counts"]([int(c) for c in counts])
            if cols["scene_id"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(cols[f.name], type=f.type) for f in arrow],
                    schema=arrow)

    from .pipeline import spread_tiles

    keep = ["image_id", "scene_id", "tile_x", "tile_y", "w", "h", *band_cols]
    keep = [c for c in keep if c in tiles.columns]
    src = spread_tiles(tiles.select(*keep)) \
        .join(F.broadcast(model), on="scene_id", how="left")
    return src.mapInArrow(fn, CLASSIFY_SCHEMA)


def kappa_stats(crosstab: DataFrame, col_a: str = "class_a",
                col_b: str = "class_b", n_col: str = "n_px") -> DataFrame:
    """r.kappa analog: per-scene agreement statistics from a confusion
    table shaped like `series.crosstab_tiles` output (or any
    (scene_id, class_a, class_b, n) frame — e.g. classify_tiles outputs
    of two epochs cross-tabbed). Class -1 (NULL-in-either) rows are
    excluded, matching r.kappa's treatment of no-data cells.

    Returns (scene_id, n, observed_agree, chance_agree, kappa, n_classes).
    kappa = (N·Σn_ii − Σ r_i·c_i) / (N² − Σ r_i·c_i): one division of
    exact integer folds, so the result is bit-deterministic regardless of
    partitioning. All shuffles move O(classes²) rows per scene."""
    ct = (crosstab.filter((F.col(col_a) >= 0) & (F.col(col_b) >= 0))
          .select("scene_id", F.col(col_a).alias("ca"),
                  F.col(col_b).alias("cb"), F.col(n_col).alias("n")))
    rows = ct.groupBy("scene_id", "ca").agg(F.sum("n").alias("rn"))
    colsums = ct.groupBy("scene_id", "cb").agg(F.sum("n").alias("cn"))
    marg = (rows.join(colsums,
                      (rows.scene_id == colsums.scene_id) & (rows.ca == colsums.cb))
            .select(rows.scene_id, (F.col("rn") * F.col("cn")).alias("rc"))
            .groupBy("scene_id").agg(F.sum("rc").alias("sum_rc")))
    diag = (ct.groupBy("scene_id")
            .agg(F.sum(F.when(F.col("ca") == F.col("cb"), F.col("n"))
                       .otherwise(F.lit(0))).alias("n_agree"),
                 F.sum("n").alias("n"),
                 F.count_distinct(F.col("ca")).alias("n_classes")))
    out = diag.join(marg, on="scene_id", how="left").select(
        "scene_id", "n", "n_classes",
        (F.col("n_agree") / F.col("n")).alias("observed_agree"),
        (F.col("sum_rc") / (F.col("n") * F.col("n"))).alias("chance_agree"),
        ((F.col("n") * F.col("n_agree") - F.col("sum_rc"))
         / (F.col("n") * F.col("n") - F.col("sum_rc"))).alias("kappa"))
    return out
