"""The LST pipeline — Spark-first restatement of the reference's 5 stages.

Logical plan (SURVEY.md §3.4):

    scan(scenes)                          # parquet/Iceberg; bytes pruned away
      -> parse image_id                   # Catalyst column algebra
      -> pair band 10 x band 11           # equi-join on (scene, tile_x, tile_y)
      -> broadcast-join scene_meta (MTL)  # C1
      -> broadcast-join emissivities      # C5 (dict lookup == broadcast join)
      -> ONE fused mapInArrow kernel      # C2+C3+C4+C6+C7+C8+C9+C10+C11
      -> tile stats / pixel rows

Key physical decisions (SURVEY.md §4): Catalyst cannot fuse across two
Python-UDF nodes, so the whole array path is a single ``mapInArrow`` — one
JVM->Python Arrow hop per tile, exactly analogous to the reference's "one
big mapcalc expression" ([U] i.landsat8.swlst.py :: estimate_lst /
estimate_cwv_big_expression). Metadata-only aggregations never touch the
``bytes`` column, so parquet column pruning keeps them cheap at 100 TB.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

from . import codecs
from . import constants as C
from . import kernels as K

_ID_RE = r"^([^/]+)/B(\d+)/(\d+)_(\d+)$"

META_COLS = ["ml_b10", "al_b10", "ml_b11", "al_b11", "k1_b10", "k2_b10", "k1_b11", "k2_b11"]


def parse_scenes(scenes: DataFrame) -> DataFrame:
    """Derive (scene_id, band, tile_x, tile_y, landcover) from image_id/caption.

    Pure Catalyst projections — whole-stage codegen, no Python. Columns the
    input already carries are REUSED, not re-derived: re-deriving would
    replace the stored column with a new expression and throw away the
    table's bucketing metadata — the documented 100-TB layout (pre-parsed,
    bucketed+sorted on (scene_id, tile_x, tile_y)) keeps `pair_bands`
    zero-shuffle precisely because the stored key columns survive here.
    """
    derive = {
        "scene_id": F.regexp_extract("image_id", _ID_RE, 1),
        "band": F.regexp_extract("image_id", _ID_RE, 2).cast("int"),
        "tile_x": F.regexp_extract("image_id", _ID_RE, 3).cast("int"),
        "tile_y": F.regexp_extract("image_id", _ID_RE, 4).cast("int"),
        "landcover": F.regexp_extract("caption", r"landcover=(\w+)", 1),
    }
    # fail fast on a reused column of the wrong type (ADVICE r6): a stale
    # or mis-typed stored column (band as string, float tile_x) would flow
    # into downstream pairing/joins silently; the bucketing-preservation
    # benefit only applies to correctly-typed stored keys
    want = {"scene_id": ("string",), "band": ("int", "bigint"),
            "tile_x": ("int", "bigint"), "tile_y": ("int", "bigint"),
            "landcover": ("string",)}
    have = dict(scenes.dtypes)
    for name, ok_types in want.items():
        if name in have and have[name] not in ok_types:
            raise TypeError(
                f"parse_scenes: reused column {name!r} has dtype "
                f"{have[name]!r}, expected one of {ok_types}; drop or "
                "re-derive it before calling")
    out = scenes
    for name, col in derive.items():
        if name not in scenes.columns:
            out = out.withColumn(name, col)
    return out


def pair_bands(parsed: DataFrame, with_qa: bool = False) -> DataFrame:
    """Join band-10 rows to band-11 rows on the tile key.

    At 100 TB this is the one unavoidable big shuffle; co-locating both bands
    by bucketing/sorting the table on (scene_id, tile_x, tile_y) at write
    time turns it into a zero-shuffle sort-merge join (README scaling notes).
    AQE handles skewed scenes at runtime; run_lst_job adds explicit salting.
    """
    key = ["scene_id", "tile_x", "tile_y"]
    b10 = parsed.filter(F.col("band") == 10).select(
        *key,
        F.col("image_id").alias("image_id_b10"),
        F.col("bytes").alias("bytes_b10"),
        F.col("fmt").alias("fmt_b10"),
        "w", "h",
        F.col("caption").alias("caption_b10"),
        "landcover",
    )
    b11 = parsed.filter(F.col("band") == 11).select(
        *key,
        F.col("image_id").alias("image_id_b11"),
        F.col("bytes").alias("bytes_b11"),
        F.col("fmt").alias("fmt_b11"),
        F.col("caption").alias("caption_b11"),
    )
    paired = b10.join(b11, on=key, how="inner")
    if with_qa:
        qa = parsed.filter(F.col("band") == 0).select(
            *key, F.col("bytes").alias("bytes_qa"))
        paired = paired.join(qa, on=key, how="left")  # QA optional per tile
    return paired


def with_meta(paired: DataFrame, scene_meta: DataFrame) -> DataFrame:
    """Broadcast MTL constants (C1): tiny dim table, never shuffled."""
    return paired.join(F.broadcast(scene_meta), on="scene_id", how="inner")


def with_emissivity(df: DataFrame, emissivities: DataFrame) -> DataFrame:
    """C5 — the reference's namedtuple dict lookup IS a broadcast hash join."""
    return df.join(
        F.broadcast(emissivities), df["landcover"] == emissivities["landcover_class"], "left"
    ).drop("landcover_class")


def scene_grids(parsed: DataFrame) -> DataFrame:
    """Tiles-per-scene grid (ntx, nty) used to geocode pixel centroids.

    Metadata-only aggregation — parquet column pruning means the bytes
    column is never read for this pass.
    """
    return parsed.groupBy("scene_id").agg(
        (F.max("tile_x") + 1).alias("ntx"), (F.max("tile_y") + 1).alias("nty")
    )


TILE_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("caption", StringType()),
    StructField("lst_bytes", BinaryType()),   # float32 LE, NaN = NULL cell
    StructField("cwv_bytes", BinaryType()),   # float32 LE
    StructField("n_valid", LongType()),
    StructField("lst_min", DoubleType()),
    StructField("lst_max", DoubleType()),
    StructField("lst_mean", DoubleType()),
    StructField("cwv_mean", DoubleType()),
    StructField("bt10_mean", DoubleType()),
    StructField("bt11_mean", DoubleType()),
])

PIXEL_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("px", IntegerType()),
    StructField("py", IntegerType()),
    StructField("lon", DoubleType()),
    StructField("lat", DoubleType()),
    StructField("bt10", DoubleType()),
    StructField("bt11", DoubleType()),
    StructField("cwv", DoubleType()),
    StructField("subrange", StringType()),
    StructField("emissivity_avg", DoubleType()),
    StructField("emissivity_delta", DoubleType()),
    StructField("lst_k", DoubleType()),
    StructField("lst_c", DoubleType()),
])

_SUBRANGE_NAMES = np.array(C.SUBRANGE_ORDER + [""], dtype=object)  # idx -1 -> ""

_PA_TYPES = {
    "string": pa.string(), "binary": pa.binary(), "int": pa.int32(),
    "bigint": pa.int64(), "double": pa.float64(), "boolean": pa.bool_(),
}


def _arrow_schema(spark_schema: StructType) -> pa.Schema:
    return pa.schema([pa.field(f.name, _PA_TYPES[f.dataType.simpleString()]) for f in spark_schema])


def _to_batch(pdf: pd.DataFrame, spark_schema: StructType) -> pa.RecordBatch:
    """Build an Arrow batch with exactly the declared schema (explicit casts
    so pandas dtype drift can never change the UDF contract)."""
    schema = _arrow_schema(spark_schema)
    arrays = [pa.array(pdf[f.name], type=f.type) for f in schema]
    return pa.RecordBatch.from_arrays(arrays, schema=schema)


def _batch_from_cols(cols: dict[str, list], spark_schema: StructType) -> pa.RecordBatch:
    """Arrow batch straight from per-column Python lists — skips the
    pandas.DataFrame detour in the hot tile loop."""
    schema = _arrow_schema(spark_schema)
    return pa.RecordBatch.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in schema], schema=schema)


def spread_tiles(tiles: DataFrame) -> DataFrame:
    """Round-robin repartition a tile table up to the core count when the
    incoming layout cannot scan with enough effective parallelism.

    A tile table written as one or two parquet files (a limit() write, a
    small export) holds a handful of row groups, so no matter how many
    byte-range splits the scheduler creates, only the 2-3 tasks whose
    range covers a row-group midpoint read ANY data — every decode-pass
    operator fed from it then runs near-serially regardless of cluster
    size (measured: 4.2 s wall for 7.7 core-seconds of work on the
    classify assignment pass; guide §2.5: unsplittable input ->
    repartition after the read). The partition COUNT is useless for
    detecting this (the empty splits still count), so the test is the
    plan's size estimate: a source whose bytes cannot fill half the
    cluster's cores at one split per core gets spread; bigger inputs —
    production tables, bucketed layouts — pass through UNTOUCHED and
    never pay a shuffle. Per-tile operator outputs are row-wise and do
    not depend on placement."""
    spark = tiles.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        split = spark.conf.get("spark.sql.files.maxPartitionBytes")
        split_b = int("".join(c for c in split if c.isdigit()) or 0)
        if split.lower().endswith(("m", "mb")):
            split_b *= 1024 * 1024
        elif split.lower().endswith(("g", "gb")):
            split_b *= 1024 * 1024 * 1024
        split_b = split_b or 128 * 1024 * 1024
        plan = tiles._jdf.queryExecution().optimizedPlan()
        pstr = plan.toString()
        if "Repartition" in pstr:
            return tiles          # caller already chose a distribution
        if "parquet" not in pstr:
            # in-memory state (iteration rounds, test fixtures, checkpoint
            # RDDs) is already placed by whatever produced it; spreading
            # it would add one exchange PER ROUND to iterative operators
            return tiles
        size_b = int(plan.stats().sizeInBytes())
    except Exception:
        return tiles
    if size_b >= (target // 2) * split_b:
        return tiles
    return tiles.repartition(target)


def _coalesce_batches(batches, min_rows: int = 8192):
    """Re-chunk an Arrow batch stream to >= min_rows rows per batch.

    The session-wide maxRecordsPerBatch is sized for ~65 KB binary tile
    rows (64/batch); point-row operators fed through the same hop would see
    thousands of 64-row batches, and their per-batch numpy setup dominates
    the kernel (guide §4.2: keep batches large enough for vectorization to
    pay off). Row order is preserved — consecutive batches concatenate —
    so operator output is row-identical, only batch boundaries move."""
    buf: list[pa.RecordBatch] = []
    n = 0
    for b in batches:
        if b.num_rows == 0:
            continue
        if b.num_rows >= min_rows and not buf:
            yield b
            continue
        buf.append(b)
        n += b.num_rows
        if n >= min_rows:
            yield from pa.Table.from_batches(buf).combine_chunks() \
                .to_batches(max_chunksize=None)
            buf, n = [], 0
    if buf:
        yield from pa.Table.from_batches(buf).combine_chunks() \
            .to_batches(max_chunksize=None)


def _batch_rows(batch: pa.RecordBatch):
    """Iterate an Arrow batch as attribute-access rows without converting to
    pandas (object boxing of 17 columns per tile showed up in the profile)."""
    import collections

    Row = collections.namedtuple("Row", batch.schema.names, rename=True)
    return map(Row._make, zip(*(batch.column(i).to_pylist()
                                for i in range(batch.num_columns))))


def _finite_stats(a: np.ndarray) -> tuple[int, float | None, float | None, float | None]:
    """(n_finite, min, max, mean) in one compaction pass — np.nanmin/nanmean
    each copy the full array internally; for 128^2 tiles the four of them
    cost as much as the LST polynomial itself."""
    v = a.ravel()
    v = v[np.isfinite(v)]
    if v.size == 0:
        return 0, None, None, None
    return int(v.size), float(v.min()), float(v.max()), float(v.mean())


_CLOUD_VALUES = np.array(C.DEFAULT_CLOUD_QA_VALUES, dtype=np.float64)


# Max tiles stacked per fused-kernel call. Round-3 interleaved A/B
# (jobs/bench_kernel_sweep.py: ALL arms round-robin in ONE process, 5
# passes/arm, 32 workers, sf0.1-scale input — the only protocol that puts
# every arm in the same host-steal weather): per-arm minima
# stack1 4.56s / stack4 4.42s / stack8 4.65s / stack16 4.69s / stack64 4.83s
# (88.3 / 91.1 / 86.5 / 85.9 / 83.4 Mpx/s) — the arms sit within 9%, so the
# earlier cross-session swings (5.1s -> 8.2s -> 13.6s for ONE config) were
# environmental steal, not tuning. 4 wins on both min and median: enough
# stacking to amortize numpy dispatch while the (4, 4, h, w) float64 plane
# family stays cache-resident per worker. Full table: BENCH/KERNEL_SWEEP.md.
_KERNEL_STACK = 4


def _run_array_kernel_batch(items: list, window: int) -> list[dict]:
    """Stacked fused-kernel dispatch over already-decoded arrays.

    items: list of (a10, a11, meta_tuple, e10, e11, qa_or_None, bt_input);
    rows are grouped by (shape, dtype, MTL constants, emissivity pair, QA
    presence, bt_input), each group stacked into one (k, h, w) kernel call
    (bit-identical to per-tile — see _run_tile_kernel_batch). Returns result
    dicts in input order.
    """
    groups: dict[tuple, list[int]] = {}
    for i, (a10, _a11, meta_vals, e10, e11, qa, bt_in) in enumerate(items):
        key = (a10.shape, a10.dtype.str, meta_vals, e10, e11, qa is not None, bt_in)
        groups.setdefault(key, []).append(i)
    out: list[dict | None] = [None] * len(items)
    for (_shape, _dt, meta_vals, e10, e11, has_qa, bt_in), gidxs in groups.items():
        meta = dict(zip(META_COLS, meta_vals))
        for s in range(0, len(gidxs), _KERNEL_STACK):
            idxs = gidxs[s : s + _KERNEL_STACK]
            a10 = np.stack([items[i][0] for i in idxs])
            a11 = np.stack([items[i][1] for i in idxs])
            qa = np.stack([items[i][5] for i in idxs]) if has_qa else None
            r = K.fused_lst_kernel(
                a10, a11, meta, e10=e10, e11=e11, window=window,
                qa=qa, cloud_values=_CLOUD_VALUES if has_qa else None,
                bt_input=bt_in,
            )
            for j, i in enumerate(idxs):
                out[i] = {k: v[j] for k, v in r.items()}
    return out  # type: ignore[return-value]


def _run_tile_kernel_batch(rows: list, window: int,
                           stack: int | None = None) -> list[dict]:
    """Run the fused kernel over a whole Arrow batch of tile rows.

    Rows are grouped by (w, h, fmt pair, MTL constants, emissivity pair,
    QA presence); each homogeneous group is decoded into ONE (k, h, w)
    stack and pushed through kernels.fused_lst_kernel in a single call —
    bit-identical to the per-tile form (cwv_ratio is leading-dim generic;
    every other stage is elementwise or a gather) while the ~86 numpy
    dispatches per tile collapse to ~86 per group. Returns per-row result
    dicts in input order; rows a group can't absorb (heterogeneous shapes
    within a 1-row remainder etc.) still work — a group of one is just the
    old path with an extra leading axis of 1.
    """
    stack = _KERNEL_STACK if stack is None else stack
    groups: dict[tuple, list[int]] = {}
    for i, row in enumerate(rows):
        qa_bytes = getattr(row, "bytes_qa", None)
        key = (int(row.w), int(row.h), row.fmt_b10, row.fmt_b11,
               tuple(float(getattr(row, k)) for k in META_COLS),
               float(row.emissivity_b10), float(row.emissivity_b11),
               qa_bytes is not None)
        groups.setdefault(key, []).append(i)
    out: list[dict | None] = [None] * len(rows)
    for (w, h, fmt10, fmt11, meta_vals, e10, e11, has_qa), gidxs in groups.items():
        meta = dict(zip(META_COLS, meta_vals))
        bt_in = fmt10 == codecs.FMT_BT
        if bt_in != (fmt11 == codecs.FMT_BT):
            raise ValueError(f"mixed DN/BT band pair: fmt_b10={fmt10!r} fmt_b11={fmt11!r}")
        for s in range(0, len(gidxs), stack):
            idxs = gidxs[s : s + stack]
            dn10 = np.stack([codecs.decode_tile_dn(rows[i].bytes_b10, w, h, fmt10) for i in idxs])
            dn11 = np.stack([codecs.decode_tile_dn(rows[i].bytes_b11, w, h, fmt11) for i in idxs])
            qa = (np.stack([codecs.decode_u16le(rows[i].bytes_qa, w, h) for i in idxs])
                  if has_qa else None)
            r = K.fused_lst_kernel(
                dn10, dn11, meta, e10=e10, e11=e11, window=window,
                qa=qa, cloud_values=_CLOUD_VALUES if has_qa else None,
                bt_input=bt_in,
            )
            for j, i in enumerate(idxs):
                out[i] = {k: v[j] for k, v in r.items()}
    return out  # type: ignore[return-value]


def lst_tiles(enriched: DataFrame, window: int = C.DEFAULT_CWV_WINDOW,
              emit_arrays: bool = True, celsius: bool = False,
              kernel_stack: int | None = None) -> DataFrame:
    """Fused raster kernel -> tile-level LST/CWV arrays + stats (C11).

    emit_arrays=False keeps the byte columns empty for stats-only consumers:
    Catalyst cannot prune columns *through* a Python UDF node, so the UDF
    offers the projection control itself (3.4 GB less Arrow traffic per
    6k-tile batch in the bench job).

    celsius=True emits the lst arrays + stats in deg C instead of K — the
    reference's ``-c`` flag ([U] i.landsat8.swlst.py); conversion happens in
    the kernel (C10), not as a post-pass."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in TILE_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}
            rows = list(_batch_rows(batch))
            for row, r in zip(rows, _run_tile_kernel_batch(rows, window,
                                                           stack=kernel_stack)):
                lst = r["lst_c"] if celsius else r["lst_k"]
                n_valid, lst_min, lst_max, lst_mean = _finite_stats(lst)
                _, _, _, cwv_mean = _finite_stats(r["cwv"])
                _, _, _, bt10_mean = _finite_stats(r["bt10"])
                _, _, _, bt11_mean = _finite_stats(r["bt11"])
                ap["image_id"](row.image_id_b10)
                ap["scene_id"](row.scene_id)
                ap["tile_x"](row.tile_x); ap["tile_y"](row.tile_y)
                ap["w"](row.w); ap["h"](row.h)
                ap["caption"](row.caption_b10)
                ap["lst_bytes"](lst.astype("<f4").tobytes() if emit_arrays else b"")
                ap["cwv_bytes"](r["cwv"].astype("<f4").tobytes() if emit_arrays else b"")
                ap["n_valid"](n_valid)
                ap["lst_min"](lst_min); ap["lst_max"](lst_max); ap["lst_mean"](lst_mean)
                ap["cwv_mean"](cwv_mean)
                ap["bt10_mean"](bt10_mean); ap["bt11_mean"](bt11_mean)
            if cols["image_id"]:
                yield _batch_from_cols(cols, TILE_SCHEMA)

    return enriched.mapInArrow(fn, TILE_SCHEMA)


def lst_tiles_pixel_emissivity(enriched: DataFrame, emis_tiles: DataFrame,
                               window: int = C.DEFAULT_CWV_WINDOW,
                               celsius: bool = False,
                               e10_col: str = "emis_bytes",
                               e11_col: str | None = None,
                               emit_arrays: bool = True) -> DataFrame:
    """C5 alternative source: per-PIXEL emissivity planes (e.g. the
    NDVI-threshold method, multiband.ndvi_emissivity_tiles) instead of the
    scalar landcover-class values — the same fused physics through
    lst_from_bt's ARRAY branch, which the kernel documents as bit-identical
    in IEEE op order to the folded scalar path (tests assert byte equality
    on constant planes).

    ``emis_tiles``: (scene_id, tile_x, tile_y, e10_col [, e11_col]) f32
    planes co-registered with the band tiles; ``e11_col=None`` reuses the
    one plane for both bands (the single-plane NDVI-threshold output).
    The join is the co-keyed tile equi join (the pair_bands class — the
    bucketed layout makes it shuffle-free). Semantics: a NaN emissivity
    PIXEL poisons that pixel's LST to NaN while its BT/CWV (emissivity-
    independent) stay valid; a tile with a MISSING emissivity plane (no
    join match for e10, or a null e11 when ``e11_col`` is set) is refused
    wholesale — every output plane of that tile, including BT/CWV, is NaN
    (the tile never reaches the kernel, so nothing is computed for it).
    """
    ecols = [e10_col] + ([e11_col] if e11_col else [])
    joined = enriched.join(
        emis_tiles.select("scene_id", "tile_x", "tile_y", *ecols),
        on=["scene_id", "tile_x", "tile_y"], how="left")

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in TILE_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}
            rows = list(_batch_rows(batch))
            # group by everything the stacked kernel requires to be
            # homogeneous; emissivity is per-row array data, not a key
            groups: dict[tuple, list[int]] = {}
            for i, row in enumerate(rows):
                qa_bytes = getattr(row, "bytes_qa", None)
                key = (int(row.w), int(row.h), row.fmt_b10, row.fmt_b11,
                       tuple(float(getattr(row, k)) for k in META_COLS),
                       qa_bytes is not None,
                       getattr(row, e10_col) is None
                       or (e11_col is not None
                           and getattr(row, e11_col) is None))
                groups.setdefault(key, []).append(i)
            out: list[dict | None] = [None] * len(rows)
            for (w, h, fmt10, fmt11, meta_vals, has_qa,
                 no_emis), gidxs in groups.items():
                if no_emis:
                    continue          # NaN planes emitted below
                meta = dict(zip(META_COLS, meta_vals))
                bt_in = fmt10 == codecs.FMT_BT
                if bt_in != (fmt11 == codecs.FMT_BT):
                    raise ValueError(
                        f"mixed DN/BT band pair: fmt_b10={fmt10!r} "
                        f"fmt_b11={fmt11!r}")
                for s in range(0, len(gidxs), _KERNEL_STACK):
                    idxs = gidxs[s : s + _KERNEL_STACK]
                    dn10 = np.stack([codecs.decode_tile_dn(
                        rows[i].bytes_b10, w, h, fmt10) for i in idxs])
                    dn11 = np.stack([codecs.decode_tile_dn(
                        rows[i].bytes_b11, w, h, fmt11) for i in idxs])
                    qa = (np.stack([codecs.decode_u16le(
                        rows[i].bytes_qa, w, h) for i in idxs])
                        if has_qa else None)
                    e10 = np.stack([codecs.decode_f32bt(
                        getattr(rows[i], e10_col), w, h) for i in idxs])
                    e11 = (np.stack([codecs.decode_f32bt(
                        getattr(rows[i], e11_col), w, h) for i in idxs])
                        if e11_col else e10)
                    r = K.fused_lst_kernel(
                        dn10, dn11, meta, e10=e10, e11=e11, window=window,
                        qa=qa, cloud_values=_CLOUD_VALUES if has_qa else None,
                        bt_input=bt_in)
                    for j, i in enumerate(idxs):
                        out[i] = {k: v[j] for k, v in r.items()}
            for i, row in enumerate(rows):
                r = out[i]
                w, h = int(row.w), int(row.h)
                if r is None:         # no emissivity tile: LST refused
                    nanp = np.full((h, w), np.nan)
                    r = {"lst_k": nanp, "lst_c": nanp, "cwv": nanp,
                         "bt10": nanp, "bt11": nanp}
                lst = r["lst_c"] if celsius else r["lst_k"]
                n_valid, lst_min, lst_max, lst_mean = _finite_stats(lst)
                _, _, _, cwv_mean = _finite_stats(r["cwv"])
                _, _, _, bt10_mean = _finite_stats(r["bt10"])
                _, _, _, bt11_mean = _finite_stats(r["bt11"])
                ap["image_id"](row.image_id_b10)
                ap["scene_id"](row.scene_id)
                ap["tile_x"](row.tile_x); ap["tile_y"](row.tile_y)
                ap["w"](row.w); ap["h"](row.h)
                ap["caption"](row.caption_b10)
                ap["lst_bytes"](lst.astype("<f4").tobytes()
                                if emit_arrays else b"")
                ap["cwv_bytes"](r["cwv"].astype("<f4").tobytes()
                                if emit_arrays else b"")
                ap["n_valid"](n_valid)
                ap["lst_min"](lst_min); ap["lst_max"](lst_max)
                ap["lst_mean"](lst_mean)
                ap["cwv_mean"](cwv_mean)
                ap["bt10_mean"](bt10_mean); ap["bt11_mean"](bt11_mean)
            if cols["image_id"]:
                yield _batch_from_cols(cols, TILE_SCHEMA)

    return joined.mapInArrow(fn, TILE_SCHEMA)


def lst_pixels(
    enriched_with_grid: DataFrame,
    window: int = C.DEFAULT_CWV_WINDOW,
    valid_only: bool = True,
) -> DataFrame:
    """Raster -> vector: explode each tile into geocoded pixel rows.

    Input must carry scene bbox (lon0/lat0/lon1/lat1 from scene_meta) and the
    scene grid (ntx, nty from scene_grids). Pixel centroid geocoding is the
    north-up affine over the scene footprint.
    """

    pa_schema = _arrow_schema(PIXEL_SCHEMA)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # one output RecordBatch per tile (mapInArrow may yield many per
        # input batch): numpy-native columns go to Arrow zero-copy, no
        # pandas detour, no per-batch concat
        for batch in batches:
            rows = list(_batch_rows(batch))
            for row, r in zip(rows, _run_tile_kernel_batch(rows, window)):
                w, h = int(row.w), int(row.h)
                lst = r["lst_k"].ravel()
                keep = np.isfinite(lst) if valid_only else np.ones(lst.size, bool)
                n = int(np.count_nonzero(keep))
                if n == 0:
                    continue
                py, px = np.divmod(np.arange(w * h, dtype=np.int64)[keep], w)
                dlon = (row.lon1 - row.lon0) / row.ntx
                dlat = (row.lat1 - row.lat0) / row.nty
                lon = row.lon0 + (row.tile_x + (px + 0.5) / w) * dlon
                lat = row.lat1 - (row.tile_y + (py + 0.5) / h) * dlat
                idx = r["subrange_idx"].ravel()[keep]
                e10 = float(row.emissivity_b10)
                e11 = float(row.emissivity_b11)
                arrays = [
                    pa.array([row.image_id_b10] * n, type=pa.string()),
                    pa.array([row.scene_id] * n, type=pa.string()),
                    pa.array(np.full(n, row.tile_x, np.int32)),
                    pa.array(np.full(n, row.tile_y, np.int32)),
                    pa.array(px.astype(np.int32)),
                    pa.array(py.astype(np.int32)),
                    pa.array(lon), pa.array(lat),
                    pa.array(r["bt10"].ravel()[keep]),
                    pa.array(r["bt11"].ravel()[keep]),
                    pa.array(r["cwv"].ravel()[keep]),
                    pa.array(_SUBRANGE_NAMES[idx], type=pa.string()),
                    pa.array(np.full(n, (e10 + e11) / 2.0)),
                    pa.array(np.full(n, e10 - e11)),
                    pa.array(lst[keep]),
                    pa.array(r["lst_c"].ravel()[keep]),
                ]
                yield pa.RecordBatch.from_arrays(arrays, schema=pa_schema)

    return enriched_with_grid.mapInArrow(fn, PIXEL_SCHEMA)


def build_enriched(
    scenes: DataFrame, scene_meta: DataFrame, emissivities: DataFrame,
    with_qa: bool = False,
) -> DataFrame:
    """scan -> parse -> pair -> broadcast meta -> broadcast emissivity."""
    parsed = parse_scenes(scenes)
    return with_emissivity(
        with_meta(pair_bands(parsed, with_qa=with_qa), scene_meta), emissivities)


def build_enriched_with_grid(
    scenes: DataFrame, scene_meta: DataFrame, emissivities: DataFrame
) -> DataFrame:
    parsed = parse_scenes(scenes)
    enriched = with_emissivity(with_meta(pair_bands(parsed), scene_meta), emissivities)
    return enriched.join(F.broadcast(scene_grids(parsed)), on="scene_id", how="inner")


def full_pixel_pipeline(
    scenes: DataFrame,
    scene_meta: DataFrame,
    emissivities: DataFrame,
    aoi_pdf,
    stations_pdf,
    window: int = C.DEFAULT_CWV_WINDOW,
    knn_k: int = 3,
    s2_level: int = 14,
) -> DataFrame:
    """The complete north-star flow (BASELINE.json:6) in one logical plan:

    decode -> BT -> CWV -> LST (fused kernel) -> pixel rows -> batched
    H3-role/S2 cell-encode -> broadcast R-tree PIP join to AOIs (left) ->
    kNN match to CWV stations -> FIXTURES.md §7 lst_pixels shape.

    Everything after the kernel is embarrassingly parallel (broadcast-only
    joins), so the plan has exactly two exchanges end-to-end: the band-pair
    join and none after — and exactly TWO Python hops: the fused raster
    kernel, then spatial.enrich_pixels fusing cells+PIP+kNN (chaining the
    composable ops instead costs 3 extra full-row Arrow round trips; the
    fused op is row-for-row identical and each stage keeps its own oracle
    tests).
    """
    from . import spatial

    pixels = lst_pixels(
        build_enriched_with_grid(scenes, scene_meta, emissivities), window=window
    )
    return spatial.enrich_pixels(pixels, aoi_pdf, stations_pdf,
                                 k=knn_k, s2_level=s2_level, how="left")


HALO_TILE_SCHEMA = TILE_SCHEMA  # same output contract as lst_tiles


def lst_tiles_halo(enriched: DataFrame, window: int = C.DEFAULT_CWV_WINDOW) -> DataFrame:
    """Fused kernel with cross-tile halo exchange: scene-mosaic semantics.

    ``lst_tiles`` reproduces the reference exactly at tile-as-scene
    granularity (windows hanging off a tile -> NULL). For seamless scene
    mosaics the CWV window must see r = window//2 pixels of the 8 neighbor
    tiles. Implemented as the classic halo exchange, Spark-style:

      pass 1 (mapInArrow):   decode once, emit the center tile plus the 8
                             r-wide DN edge strips each neighbor needs
                             (shuffle volume ~ (1 + 2r(w+h)/(wh))x, NOT 9x);
      shuffle:               hash on the receiving tile key;
      pass 2 (applyInPandas): assemble the (h+2r, w+2r) padded arrays
                             (missing neighbors = NaN = true scene edge),
                             run the same fused kernel, crop the halo.

    Catalyst sees a plain groupBy — AQE/salting applies as usual.
    """
    r = window // 2
    strip_schema = StructType([
        StructField("scene_id", StringType()),
        StructField("rx", IntegerType()),        # receiving tile key
        StructField("ry", IntegerType()),
        StructField("dx", IntegerType()),        # where the piece sits
        StructField("dy", IntegerType()),
        StructField("piece10", BinaryType()),    # u16le DN pieces (f32le when bt=1)
        StructField("piece11", BinaryType()),
        StructField("pw", IntegerType()),
        StructField("ph", IntegerType()),
        StructField("bt", IntegerType()),        # 1 = pieces are Kelvin BT f32le
        # center-only passthrough (None on strips)
        StructField("image_id", StringType()),
        StructField("caption", StringType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("emissivity_b10", DoubleType()),
        StructField("emissivity_b11", DoubleType()),
    ] + [StructField(k, DoubleType()) for k in META_COLS])

    s_names = [f.name for f in strip_schema]

    def emit_strips(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {n: [] for n in s_names}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                bt_in = row.fmt_b10 == codecs.FMT_BT
                if bt_in != (row.fmt_b11 == codecs.FMT_BT):
                    raise ValueError(
                        f"mixed DN/BT band pair: fmt_b10={row.fmt_b10!r} "
                        f"fmt_b11={row.fmt_b11!r}")
                # BT tiles carry float Kelvin: pieces travel as f32le and the
                # bt flag tells assembly to skip DN->BT (same contract as the
                # batch path's bt_input)
                piece_dt = "<f4" if bt_in else "<u2"
                # u16le and f32bt whole-tile center pieces ARE the stored payload
                passthrough = (row.fmt_b10 == codecs.FMT_RAW
                               and row.fmt_b11 == codecs.FMT_RAW) or bt_in
                dn10 = np.asarray(codecs.decode_tile_dn(row.bytes_b10, w, h, row.fmt_b10), dtype=piece_dt)
                dn11 = np.asarray(codecs.decode_tile_dn(row.bytes_b11, w, h, row.fmt_b11), dtype=piece_dt)
                meta = {k: float(getattr(row, k)) for k in META_COLS}
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        rx, ry = row.tile_x + dx, row.tile_y + dy
                        if rx < 0 or ry < 0:
                            continue
                        center = dx == 0 and dy == 0
                        if center and passthrough:
                            b10, b11, pw, ph = row.bytes_b10, row.bytes_b11, w, h
                        else:
                            # slice of THIS tile that tile (rx, ry) needs
                            xs = slice(None) if dx == 0 else (slice(w - r, w) if dx == 1 else slice(0, r))
                            ys = slice(None) if dy == 0 else (slice(h - r, h) if dy == 1 else slice(0, r))
                            p10 = np.ascontiguousarray(dn10[ys, xs])
                            b10, b11 = p10.tobytes(), np.ascontiguousarray(dn11[ys, xs]).tobytes()
                            ph, pw = p10.shape
                        ap["scene_id"](row.scene_id); ap["rx"](rx); ap["ry"](ry)
                        ap["dx"](dx); ap["dy"](dy)
                        ap["piece10"](b10); ap["piece11"](b11)
                        ap["pw"](pw); ap["ph"](ph)
                        ap["bt"](1 if bt_in else 0)
                        ap["image_id"](row.image_id_b10 if center else None)
                        ap["caption"](row.caption_b10 if center else None)
                        ap["w"](w); ap["h"](h)
                        ap["emissivity_b10"](float(row.emissivity_b10) if center else None)
                        ap["emissivity_b11"](float(row.emissivity_b11) if center else None)
                        for k in META_COLS:
                            ap[k](meta[k] if center else None)
            if cols["scene_id"]:
                yield _batch_from_cols(cols, strip_schema)

    strips = enriched.mapInArrow(emit_strips, strip_schema)

    # assemble: shuffle on the receiving tile key, sort within partitions so
    # each tile's strips are contiguous, then stream-assemble in mapInArrow —
    # no per-group pandas machinery (FlatMapGroupsInPandas paid ~1 ms/group
    # of 9 rows), output batched 64 tiles at a time like lst_tiles.
    parts = strips.repartition(F.col("scene_id"), F.col("rx"), F.col("ry")) \
                  .sortWithinPartitions("scene_id", "rx", "ry")

    def assemble_stream(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pending: list = []  # (center_row, pad10, pad11, bt_input) awaiting a stacked kernel run

        def assemble(acc: list):
            """Mosaic one tile's 9 strips into NaN-padded planes (no kernel)."""
            center = next((s for s in acc if s.dx == 0 and s.dy == 0
                           and s.image_id is not None), None)
            if center is None:
                return None  # halo strips for a tile outside the input (scene edge)
            for s in acc:
                # cross-tile analog of the per-tile mixed DN/BT guard in
                # emit_strips: a neighbor strip whose bt flag differs from
                # the center would mosaic raw DN counts into a Kelvin plane
                # (or vice versa), silently corrupting CWV/LST at borders.
                if bool(s.bt) != bool(center.bt):
                    raise ValueError(
                        f"mixed DN/BT strips for tile "
                        f"({center.scene_id}, {center.rx}, {center.ry}): "
                        f"center bt={bool(center.bt)} but strip from "
                        f"d=({s.dx},{s.dy}) has bt={bool(s.bt)}")
            w, h = int(center.w), int(center.h)
            pad10 = np.full((h + 2 * r, w + 2 * r), np.nan)
            pad11 = np.full((h + 2 * r, w + 2 * r), np.nan)
            for s in acc:
                # sender = receiver - (dx,dy): a dx=+1 piece came from the
                # left neighbor, so it lands on the padded-left strip, etc.
                x0 = 0 if s.dx == 1 else (r + w if s.dx == -1 else r)
                y0 = 0 if s.dy == 1 else (r + h if s.dy == -1 else r)
                dt = "<f4" if s.bt else "<u2"
                pad10[y0:y0 + s.ph, x0:x0 + s.pw] = \
                    np.frombuffer(s.piece10, dtype=dt).reshape(s.ph, s.pw)
                pad11[y0:y0 + s.ph, x0:x0 + s.pw] = \
                    np.frombuffer(s.piece11, dtype=dt).reshape(s.ph, s.pw)
            return (center, pad10, pad11, bool(center.bt))

        def emit_pending() -> pa.RecordBatch:
            # one stacked kernel family per flush (same bit-identity argument
            # as _run_tile_kernel_batch; pads are float so BT takes the
            # arithmetic path, stacked elementwise)
            cols: dict[str, list] = {f.name: [] for f in TILE_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}
            items = [
                (p10, p11,
                 tuple(float(getattr(c, k)) for k in META_COLS),
                 float(c.emissivity_b10), float(c.emissivity_b11), None, bt_in)
                for c, p10, p11, bt_in in pending
            ]
            for (center, _p10, _p11, _bt), res in zip(
                    pending, _run_array_kernel_batch(items, window)):
                w, h = int(center.w), int(center.h)
                lst = res["lst_k"][r:r + h, r:r + w]
                cwv = res["cwv"][r:r + h, r:r + w]
                n_valid, lst_min, lst_max, lst_mean = _finite_stats(lst)
                _, _, _, cwv_mean = _finite_stats(cwv)
                _, _, _, bt10_mean = _finite_stats(res["bt10"][r:r + h, r:r + w])
                _, _, _, bt11_mean = _finite_stats(res["bt11"][r:r + h, r:r + w])
                ap["image_id"](center.image_id); ap["scene_id"](center.scene_id)
                ap["tile_x"](int(center.rx)); ap["tile_y"](int(center.ry))
                ap["w"](w); ap["h"](h); ap["caption"](center.caption)
                ap["lst_bytes"](lst.astype("<f4").tobytes())
                ap["cwv_bytes"](cwv.astype("<f4").tobytes())
                ap["n_valid"](n_valid)
                ap["lst_min"](lst_min); ap["lst_max"](lst_max); ap["lst_mean"](lst_mean)
                ap["cwv_mean"](cwv_mean)
                ap["bt10_mean"](bt10_mean); ap["bt11_mean"](bt11_mean)
            pending.clear()
            return _batch_from_cols(cols, TILE_SCHEMA)

        cur_key = None
        acc: list = []
        for batch in batches:
            for s in _batch_rows(batch):
                k = (s.scene_id, s.rx, s.ry)
                if k != cur_key:
                    if acc:
                        t = assemble(acc)
                        if t is not None:
                            pending.append(t)
                        acc = []
                    cur_key = k
                    if len(pending) >= _KERNEL_STACK:
                        yield emit_pending()
                acc.append(s)
        if acc:
            t = assemble(acc)
            if t is not None:
                pending.append(t)
        if pending:
            yield emit_pending()

    return parts.mapInArrow(assemble_stream, TILE_SCHEMA)


def composite_pixels(pixels: DataFrame,
                     keys: tuple[str, ...] = ("tile_x", "tile_y", "px", "py",
                                              "lon", "lat"),
                     ) -> DataFrame:
    """Per-pixel temporal composite across revisits of one footprint — the
    classic cloud-free LST product (median of the valid observations at each
    pixel; clouds/NaN were already dropped by lst_pixels(valid_only=True),
    so n_obs varies per pixel exactly like a real compositing stack).

    lon/lat are part of the default key: revisits of one footprint are
    grid-aligned (bit-identical centroids), while same-index pixels from a
    DIFFERENT footprint have different centroids and land in their own
    groups instead of silently merging into one composite.

    One shuffle on the pixel key, partial counts map-side. ``percentile`` is
    the exact aggregate; at 100 TB swap it for ``approx_percentile`` (GK
    sketch, merge-able — q_sketch_stats attests that path's error bound).
    """
    return pixels.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.expr("percentile(lst_k, 0.5)").alias("lst_median"),
        F.min("lst_k").alias("lst_lo"),
        F.max("lst_k").alias("lst_hi"),
    )


def mosaic_pixels(pixels: DataFrame,
                  keys: tuple[str, ...] = ("tile_x", "tile_y", "px", "py",
                                           "lon", "lat"),
                  priority=None) -> DataFrame:
    """Priority mosaic across revisits (r.patch analog): at each pixel keep
    the single BEST valid observation instead of a median — the default
    priority is ascending CWV (the driest atmosphere gives the most
    reliable split-window retrieval), tie-broken by scene_id so the result
    is deterministic.

    Implemented as ONE min-over-struct aggregate: lexicographic struct min
    is partial-aggregable, so the whole mosaic is a single map-side-
    combining shuffle with no per-group buffering (cheaper than the
    composite's exact percentile). ``priority`` accepts any Column; NaN
    priorities sort last under Spark ordering, so cloud-degraded
    observations lose to clean ones automatically. A SQL NULL priority is
    coalesced to NaN first — a bare NULL sorts FIRST in a struct min, which
    would make the degraded observation beat every valid one.
    """
    pr = priority if priority is not None else F.col("cwv")
    pr = F.coalesce(pr.cast("double"), F.lit(float("nan")))
    chosen = F.min(F.struct(pr.alias("p"), F.col("scene_id").alias("s"),
                            F.col("lst_k").alias("v")))
    agg = pixels.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"), chosen.alias("ch"))
    return agg.select(
        *keys, "n_obs",
        F.col("ch.v").alias("lst_mosaic"),
        F.col("ch.s").alias("src_scene"),
        F.col("ch.p").alias("src_priority"),
    )


def rasterize_pixels(
    pixels: DataFrame, w: int, h: int, value_col: str = "lst_k"
) -> DataFrame:
    """Vector -> raster: scatter pixel rows back into per-tile float32 arrays
    ("rasterized back tile-by-tile", BASELINE.json:6). Inverse of lst_pixels
    up to dropped-NULL cells (which come back as NaN). One shuffle on the
    tile key, then an embarrassingly-parallel grouped scatter."""
    out_schema = StructType([
        StructField("image_id", StringType()),
        StructField("scene_id", StringType()),
        StructField("tile_x", IntegerType()),
        StructField("tile_y", IntegerType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("raster_bytes", BinaryType()),
        StructField("n_valid", LongType()),
    ])

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        grid = np.full((h, w), np.nan, dtype=np.float32)
        grid[pdf["py"].to_numpy(), pdf["px"].to_numpy()] = pdf[value_col].to_numpy()
        return pd.DataFrame([{
            "image_id": pdf["image_id"].iloc[0],
            "scene_id": key[0], "tile_x": key[1], "tile_y": key[2],
            "w": w, "h": h,
            "raster_bytes": grid.tobytes(),
            "n_valid": int(np.isfinite(grid).sum()),
        }])

    return pixels.groupBy("scene_id", "tile_x", "tile_y").applyInPandas(fn, out_schema)


FOCAL_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("mean_bytes", BinaryType()),   # float32 LE planes
    StructField("std_bytes", BinaryType()),
    StructField("min_bytes", BinaryType()),
    StructField("max_bytes", BinaryType()),
    StructField("n_valid", LongType()),        # pixels with >= 1 valid cell
])


def focal_stats_tiles(tiles: DataFrame, window: int = 5,
                      src_col: str = "lst_bytes",
                      halo: bool = False) -> DataFrame:
    """Neighborhood (focal) statistics over a tile raster column — the
    r.neighbors companion product: smooth/roughness/extreme maps of the
    LST (or CWV) plane produced by ``lst_tiles``.

    Raster in, raster out: decodes the f32 plane per tile, runs
    kernels.focal_stats (valid-cell semantics; see its docstring for how
    this differs from the CWV poison window), emits f32 mean/std/min/max
    planes. One mapInArrow hop, embarrassingly parallel per tile.

    ``halo=False`` is tile-LOCAL (windows do not cross borders).
    ``halo=True`` routes through halo_plane_tiles first: windows see
    window//2 pixels of the 8 neighbor tiles, making the output EXACTLY
    equal to running the kernel on the assembled whole-scene plane
    (tests pin this tile-for-tile) at ~(1 + 2r(w+h)/(wh))x shuffle cost.
    """
    m = window // 2 if halo else 0
    src = halo_plane_tiles(tiles, r=m, src_col=src_col) if halo else tiles
    col = "pad_bytes" if halo else src_col

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in FOCAL_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                plane = codecs.decode_f32bt(getattr(row, col), w + 2 * m, h + 2 * m)
                r = K.focal_stats(plane, window=window)
                crop = (slice(m, m + h), slice(m, m + w)) if m else (slice(None), slice(None))
                r = {k: v[crop] for k, v in r.items()}
                ap["image_id"](row.image_id)
                ap["scene_id"](row.scene_id)
                ap["tile_x"](row.tile_x); ap["tile_y"](row.tile_y)
                ap["w"](w); ap["h"](h)
                ap["mean_bytes"](np.ascontiguousarray(r["mean"]).astype("<f4").tobytes())
                ap["std_bytes"](np.ascontiguousarray(r["std"]).astype("<f4").tobytes())
                ap["min_bytes"](np.ascontiguousarray(r["min"]).astype("<f4").tobytes())
                ap["max_bytes"](np.ascontiguousarray(r["max"]).astype("<f4").tobytes())
                ap["n_valid"](int((r["count"] > 0).sum()))
            if cols["image_id"]:
                yield _batch_from_cols(cols, FOCAL_SCHEMA)

    return src.mapInArrow(fn, FOCAL_SCHEMA)


def trend_pixels(pixels: DataFrame,
                 keys: tuple[str, ...] = ("tile_x", "tile_y", "px", "py",
                                          "lon", "lat"),
                 t_col: str | None = None) -> DataFrame:
    """Per-pixel linear LST trend across revisits — the warming-trend map
    companion to composite_pixels. Ordinary least squares per pixel via the
    closed-form sums (n, Σt, Σy, Σt², Σty): every term is a partial-
    aggregable SUM, so the whole trend map is ONE map-side-combining
    shuffle on the pixel key with JVM-side arithmetic only — unlike the
    composite's exact percentile there is no per-group buffering at all.

    ``t_col`` names the time column (e.g. epoch days); by default the
    revisit index is parsed from the ``...R<k>`` scene ids the revisit
    fixture uses, making slope "Kelvin per revisit step". Pixels with < 2
    observations (or zero time variance) get NULL slope/intercept.
    """
    t = (F.col(t_col) if t_col is not None
         else F.regexp_extract("scene_id", r"R(\d+)$", 1).cast("double"))
    y = F.col("lst_k")
    agg = pixels.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(t).alias("st"), F.sum(y).alias("sy"),
        F.sum(t * t).alias("stt"), F.sum(t * y).alias("sty"),
    )
    den = F.col("n_obs") * F.col("stt") - F.col("st") * F.col("st")
    slope = F.when(
        (F.col("n_obs") >= 2) & (den != 0.0),
        (F.col("n_obs") * F.col("sty") - F.col("st") * F.col("sy")) / den)
    intercept = (F.col("sy") - F.col("slope") * F.col("st")) / F.col("n_obs")
    return (
        agg.withColumn("slope", slope)
        .withColumn("intercept",
                    F.when(F.col("slope").isNotNull(), intercept))
        .drop("st", "sy", "stt", "sty")
    )


GRADIENT_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("slope_bytes", BinaryType()),    # float32 LE planes
    StructField("aspect_bytes", BinaryType()),
    StructField("hillshade_bytes", BinaryType()),
    StructField("n_valid", LongType()),
    StructField("slope_max", DoubleType()),
])


def gradient_tiles(tiles: DataFrame, cell: float = 1.0,
                   src_col: str = "lst_bytes",
                   halo: bool = False) -> DataFrame:
    """Horn 3x3 gradient products per tile (r.slope.aspect analog):
    slope / downslope compass aspect / hillshade planes of any raster
    column — over LST it is the thermal-gradient map (front detection).
    One mapInArrow hop. ``halo=False`` is tile-local (poison-NULL ring at
    tile borders, same trade as the CWV window); ``halo=True`` exchanges a
    1-pixel halo first, making the output exactly the whole-scene-mosaic
    gradient (tests pin tile-for-tile equality). Kernel golden-direction
    vectors in tests/test_kernels.py."""
    m = 1 if halo else 0
    src = halo_plane_tiles(tiles, r=1, src_col=src_col) if halo else tiles
    col = "pad_bytes" if halo else src_col

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in GRADIENT_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                plane = codecs.decode_f32bt(getattr(row, col),
                                            w + 2 * m, h + 2 * m).astype(np.float64)
                r = K.slope_aspect(plane, cell=cell)
                if m:
                    crop = (slice(m, m + h), slice(m, m + w))
                    r = {k: np.ascontiguousarray(v[crop]) for k, v in r.items()}
                n_valid, _, smax, _ = _finite_stats(r["slope_deg"])
                ap["image_id"](getattr(row, "image_id", None))
                ap["scene_id"](row.scene_id)
                ap["tile_x"](row.tile_x); ap["tile_y"](row.tile_y)
                ap["w"](w); ap["h"](h)
                ap["slope_bytes"](r["slope_deg"].astype("<f4").tobytes())
                ap["aspect_bytes"](r["aspect_deg"].astype("<f4").tobytes())
                ap["hillshade_bytes"](r["hillshade"].astype("<f4").tobytes())
                ap["n_valid"](n_valid)
                ap["slope_max"](smax)
            if cols["scene_id"]:
                yield _batch_from_cols(cols, GRADIENT_SCHEMA)

    return src.mapInArrow(fn, GRADIENT_SCHEMA)


HALO_PLANE_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("pad_bytes", BinaryType()),   # (h+2r, w+2r) float LE
                                              # (dtype of the src plane)
])


def halo_plane_tiles(tiles: DataFrame, r: int,
                     src_col: str = "lst_bytes",
                     dtype: str = "<f4") -> DataFrame:
    """Generic halo exchange for ONE float plane column of a tile table:
    every tile comes back with an (h+2r, w+2r) NaN-padded plane holding
    r pixels of each 8-neighbor (missing neighbor = NaN = true scene
    edge). The window/gradient operators consume this to get EXACT
    whole-scene-mosaic semantics from tile-local kernels.

    ``dtype`` is the plane encoding of ``src_col`` ("<f4" default; "<f8"
    for planes where f32 rounding is not acceptable, e.g. upstream-cell
    counts in hydro.flow_accum_tiles that must stay exact past 2**24).
    ``pad_bytes`` comes back in the same dtype.

    Same shape as the band-pair halo in lst_tiles_halo: strips are
    r-wide (shuffle ~ (1 + 2r(w+h)/(wh)) x the plane bytes, not 9x), the
    shuffle is a plain repartition on the receiving tile key, assembly
    streams sorted partitions.
    """
    if r < 1:
        raise ValueError(f"halo margin must be >= 1, got {r}")
    if dtype not in ("<f4", "<f8"):
        raise ValueError(f"unsupported plane dtype {dtype!r}")
    # NOTE: no spread_tiles here — the halo's own repartition spreads every
    # downstream consumer, and the strip emit is cheap enough that paying
    # an extra plane shuffle to parallelize it measures net-negative

    def _dec(buf: bytes, w: int, h: int) -> np.ndarray:
        return np.frombuffer(buf, dtype=dtype).reshape(h, w)
    strip_schema = StructType([
        StructField("scene_id", StringType()),
        StructField("rx", IntegerType()),
        StructField("ry", IntegerType()),
        StructField("dx", IntegerType()),
        StructField("dy", IntegerType()),
        StructField("piece", BinaryType()),
        StructField("pw", IntegerType()),
        StructField("ph", IntegerType()),
        StructField("image_id", StringType()),   # center-only passthrough
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
    ])
    s_names = [f.name for f in strip_schema]

    def emit(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {n: [] for n in s_names}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                if w < r or h < r:
                    # slice(w - r, w) would wrap to the array end and the
                    # assemble step would left-align the short strip — fail
                    # loudly instead of silently corrupting the padded plane
                    raise ValueError(
                        f"halo margin r={r} exceeds tile dims {w}x{h} "
                        f"(scene {row.scene_id}, tile "
                        f"({int(row.tile_x)},{int(row.tile_y)})); retile "
                        "with tiles at least r pixels on each side")
                plane = _dec(getattr(row, src_col), w, h)
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        rx, ry = row.tile_x + dx, row.tile_y + dy
                        if rx < 0 or ry < 0:
                            continue
                        center = dx == 0 and dy == 0
                        if center:
                            piece, pw, ph = getattr(row, src_col), w, h
                        else:
                            xs = slice(None) if dx == 0 else (slice(w - r, w) if dx == 1 else slice(0, r))
                            ys = slice(None) if dy == 0 else (slice(h - r, h) if dy == 1 else slice(0, r))
                            p = np.ascontiguousarray(plane[ys, xs], dtype=dtype)
                            piece, (ph, pw) = p.tobytes(), p.shape
                        ap["scene_id"](row.scene_id); ap["rx"](rx); ap["ry"](ry)
                        ap["dx"](dx); ap["dy"](dy)
                        ap["piece"](piece); ap["pw"](pw); ap["ph"](ph)
                        ap["image_id"](getattr(row, "image_id", None) if center else None)
                        ap["w"](w); ap["h"](h)
            if cols["scene_id"]:
                yield _batch_from_cols(cols, strip_schema)

    strips = tiles.mapInArrow(emit, strip_schema)
    parts = strips.repartition(F.col("scene_id"), F.col("rx"), F.col("ry")) \
                  .sortWithinPartitions("scene_id", "rx", "ry")

    def assemble(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        def flush(acc: list, cols, ap):
            # a tile key that only received strips (outside the input grid)
            # has no center piece: it is scene margin, not a tile — drop
            center = next((s for s in acc if s.dx == 0 and s.dy == 0), None)
            if center is None:
                return
            w, h = int(center.w), int(center.h)
            pad = np.full((h + 2 * r, w + 2 * r), np.nan, dtype=dtype)
            for s in acc:
                x0 = 0 if s.dx == 1 else (r + w if s.dx == -1 else r)
                y0 = 0 if s.dy == 1 else (r + h if s.dy == -1 else r)
                pad[y0:y0 + s.ph, x0:x0 + s.pw] = \
                    np.frombuffer(s.piece, dtype=dtype).reshape(s.ph, s.pw)
            ap["image_id"](center.image_id)
            ap["scene_id"](center.scene_id)
            ap["tile_x"](int(center.rx)); ap["tile_y"](int(center.ry))
            ap["w"](w); ap["h"](h)
            ap["pad_bytes"](pad.astype(dtype).tobytes())

        cur_key, acc = None, []
        cols: dict[str, list] = {f.name: [] for f in HALO_PLANE_SCHEMA}
        ap = {k: v.append for k, v in cols.items()}
        for batch in batches:
            for s in _batch_rows(batch):
                k = (s.scene_id, s.rx, s.ry)
                if k != cur_key:
                    if acc:
                        flush(acc, cols, ap)
                        acc = []
                    cur_key = k
                acc.append(s)
                # emit every 64 assembled tiles
                if len(cols["scene_id"]) >= 64:
                    yield _batch_from_cols(cols, HALO_PLANE_SCHEMA)
                    cols = {f.name: [] for f in HALO_PLANE_SCHEMA}
                    ap = {k2: v.append for k2, v in cols.items()}
        if acc:
            flush(acc, cols, ap)
        if cols["scene_id"]:
            yield _batch_from_cols(cols, HALO_PLANE_SCHEMA)

    return parts.mapInArrow(assemble, HALO_PLANE_SCHEMA)


CONV_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("conv_bytes", BinaryType()),
    StructField("n_valid", LongType()),
])


def convolve_tiles(tiles: DataFrame, weights, divisor: float | None = None,
                   src_col: str = "lst_bytes",
                   halo: bool = True) -> DataFrame:
    """Custom matrix filter over a tile raster column — the r.mfilter
    analog (arbitrary user kernel: sharpen, emboss, directional gradient,
    asymmetric smoothing), with the GRASS NULL/divisor conventions
    implemented in kernels.convolve_plane.

    ``weights`` must be an odd-dimensioned 2-D matrix (SQUARE when
    halo=True — halo_plane_tiles pads one margin). halo=True (default)
    exchanges max(kh,kw)//2 neighbor-pixel strips first so the output is
    EXACTLY the whole-scene convolution, tile for tile; halo=False stays
    tile-local (windows see NULL outside the tile). One mapInArrow hop
    either way; the weights matrix is a tiny task closure constant.
    """
    weights = np.asarray(weights, dtype=np.float64)
    if weights.ndim != 2 or any(s % 2 != 1 for s in weights.shape):
        raise ValueError(
            f"weights must be an odd-dimensioned 2-D matrix, "
            f"got shape {weights.shape}")
    if halo and weights.shape[0] != weights.shape[1]:
        raise ValueError(
            "halo=True needs a square weights matrix (the halo margin is "
            "one radius); pass halo=False for rectangular kernels")
    m = weights.shape[0] // 2 if halo else 0
    src = halo_plane_tiles(tiles, r=m, src_col=src_col) if halo else tiles
    col = "pad_bytes" if halo else src_col

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in CONV_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                plane = codecs.decode_f32bt(getattr(row, col),
                                            w + 2 * m, h + 2 * m)
                out = K.convolve_plane(plane, weights, divisor)
                if m:
                    out = out[m:m + h, m:m + w]
                p32 = np.ascontiguousarray(out).astype("<f4")
                ap["image_id"](row.image_id)
                ap["scene_id"](row.scene_id)
                ap["tile_x"](row.tile_x); ap["tile_y"](row.tile_y)
                ap["w"](w); ap["h"](h)
                ap["conv_bytes"](p32.tobytes())
                ap["n_valid"](int(np.isfinite(p32).sum()))
            if cols["image_id"]:
                yield _batch_from_cols(cols, CONV_SCHEMA)

    return src.mapInArrow(fn, CONV_SCHEMA)


GROW_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("scene_id", StringType()),
    StructField("tile_x", IntegerType()),
    StructField("tile_y", IntegerType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("grown_bytes", BinaryType()),
    StructField("n_grown", LongType()),
])


def grow_tiles(tiles: DataFrame, radius: float = 1.01,
               value: float | None = None,
               src_col: str = "lst_bytes",
               halo: bool = True) -> DataFrame:
    """r.grow analog: expand the non-NULL area of a tile raster column by
    a Euclidean radius — close QA-mask pinholes before zonal/series
    consumers, or grow class patches. New cells take the nearest valid
    cell's value (or the constant ``value``); kernels.grow_plane defines
    the deterministic tie-break.

    halo=True (default) exchanges floor(radius) neighbor-pixel strips so
    growth crosses tile borders EXACTLY like one whole-scene pass;
    halo=False stays tile-local. One mapInArrow hop either way.
    """
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    m = int(np.floor(radius)) if halo else 0
    src = halo_plane_tiles(tiles, r=m, src_col=src_col) if halo else tiles
    col = "pad_bytes" if halo else src_col

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in GROW_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                plane = codecs.decode_f32bt(getattr(row, col),
                                            w + 2 * m, h + 2 * m)
                before = np.isfinite(plane)
                out = K.grow_plane(plane, radius, value)
                if m:
                    out = out[m:m + h, m:m + w]
                    before = before[m:m + h, m:m + w]
                p32 = np.ascontiguousarray(out).astype("<f4")
                ap["image_id"](row.image_id)
                ap["scene_id"](row.scene_id)
                ap["tile_x"](row.tile_x); ap["tile_y"](row.tile_y)
                ap["w"](w); ap["h"](h)
                ap["grown_bytes"](p32.tobytes())
                ap["n_grown"](int((np.isfinite(p32) & ~before).sum()))
            if cols["image_id"]:
                yield _batch_from_cols(cols, GROW_SCHEMA)

    return src.mapInArrow(fn, GROW_SCHEMA)


def fillnulls_tiles(tiles: DataFrame, radius: float = 3.0,
                    power: float = 2.0, src_col: str = "lst_bytes",
                    halo: bool = True, method: str = "idw",
                    sweeps: int | None = None) -> DataFrame:
    """r.fillnulls analog over the tile table: interpolation of NULL holes
    from the valid cells within a Euclidean radius — the cloud-hole repair
    companion to grow_tiles (which copies the single nearest value).
    ``method="idw"`` blends all in-range neighbors; ``method="spline"``
    refines that fill with ``sweeps`` Jacobi sweeps of the membrane
    equation (kernels.fillnulls_plane — the tension→∞ RST limit).
    halo=True (default) exchanges floor(radius) strips — plus ``sweeps``
    more for the spline, whose Jacobi dependence radius grows one cell per
    sweep — so filling crosses tile borders exactly like one whole-scene
    kernels.fillnulls_plane pass. Output reuses GROW_SCHEMA (grown_bytes /
    n_grown = filled cells)."""
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    if method not in ("idw", "spline"):
        raise ValueError(f"unknown fillnulls method {method!r}")
    k_sw = (2 * int(np.floor(radius)) if sweeps is None
            else int(sweeps)) if method == "spline" else 0
    m = (int(np.floor(radius)) + k_sw) if halo else 0
    src = halo_plane_tiles(tiles, r=m, src_col=src_col) if halo else tiles
    col = "pad_bytes" if halo else src_col

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols: dict[str, list] = {f.name: [] for f in GROW_SCHEMA}
            ap = {k: v.append for k, v in cols.items()}
            for row in _batch_rows(batch):
                w, h = int(row.w), int(row.h)
                plane = codecs.decode_f32bt(getattr(row, col),
                                            w + 2 * m, h + 2 * m)
                before = np.isfinite(plane)
                out = K.fillnulls_plane(
                    plane, radius, power, method=method,
                    sweeps=k_sw if method == "spline" else None)
                if m:
                    out = out[m:m + h, m:m + w]
                    before = before[m:m + h, m:m + w]
                p32 = np.ascontiguousarray(out).astype("<f4")
                ap["image_id"](row.image_id)
                ap["scene_id"](row.scene_id)
                ap["tile_x"](row.tile_x); ap["tile_y"](row.tile_y)
                ap["w"](w); ap["h"](h)
                ap["grown_bytes"](p32.tobytes())
                ap["n_grown"](int((np.isfinite(p32) & ~before).sum()))
            if cols["image_id"]:
                yield _batch_from_cols(cols, GROW_SCHEMA)

    return src.mapInArrow(fn, GROW_SCHEMA)
