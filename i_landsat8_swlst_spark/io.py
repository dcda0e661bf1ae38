"""TableIO: storage abstraction + partitioned sinks.

North rule targets Iceberg tables; no Iceberg runtime jar exists in this
sandbox (SURVEY.md §0), so TableIO isolates the storage choice: the Parquet
backend is live now, and an Iceberg backend is a config change (catalog name
+ ``writeTo``) once a jar is present — the call sites don't change.

Sinks (SURVEY.md §2.2): outputs are partitioned by coarse cell prefix so
downstream spatial queries prune at the directory/manifest level — the
storage-layout analog of the reference's region clipping (C13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


class TableIO:
    """read/write with a pluggable backend ('parquet' now, 'iceberg' later)."""

    def __init__(self, spark: SparkSession, backend: str = "parquet",
                 catalog: str | None = None):
        if backend not in ("parquet", "iceberg"):
            raise ValueError(backend)
        if backend == "iceberg":
            jars = spark.sparkContext._jsc.sc().listJars().mkString(",")  # noqa: SLF001
            if "iceberg" not in jars.lower():
                raise NotImplementedError(
                    "no Iceberg runtime jar on the classpath in this container; "
                    "TableIO keeps call sites identical so adding the jar + "
                    "catalog config enables this backend without code changes"
                )
        self.spark = spark
        self.backend = backend
        self.catalog = catalog

    def read(self, target: str) -> DataFrame:
        if self.backend == "parquet":
            return self.spark.read.parquet(target)
        return self.spark.table(f"{self.catalog}.{target}")

    def write(self, df: DataFrame, target: str, partition_by: list[str] | None = None,
              mode: str = "overwrite") -> None:
        if self.backend == "parquet":
            w = df.write.mode(mode)
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(target)
        else:
            w = df.writeTo(f"{self.catalog}.{target}")
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()


def with_cell_prefix(df: DataFrame, cell_col: str = "hex_7",
                     out_col: str = "cell_p", bits: int = 8) -> DataFrame:
    """Coarse partition key from a cell id: top bits -> bounded cardinality."""
    return df.withColumn(
        out_col, F.pmod(F.shiftrightunsigned(F.col(cell_col), 64 - bits - 4), F.lit(1 << bits))
    )


def write_pixels_sink(io: TableIO, pixels_with_cells: DataFrame, target: str) -> None:
    """LST pixel-row sink partitioned by cell prefix (SURVEY.md §2.2 sinks)."""
    df = with_cell_prefix(pixels_with_cells)
    io.write(df, target, partition_by=["cell_p"])


def s2_range_predicate(ranges: list[tuple[int, int]], cell_col: str = "s2_cell"):
    """OR-of-BETWEENs Column for an S2 covering's id ranges (geo.s2_ranges).

    Each range is a plain comparable predicate, so the whole disjunction is
    pushed to the parquet scan and prunes row groups/files laid out by
    write_spatial_sorted. Callers re-apply the exact lon/lat predicate as
    the residual filter (the covering is a superset by contract)."""
    import functools

    conds = [(F.col(cell_col) >= lo) & (F.col(cell_col) <= hi) for lo, hi in ranges]
    return functools.reduce(lambda a, b: a | b, conds)


def write_spatial_sorted(io: TableIO, df: DataFrame, target: str,
                         cell_col: str = "s2_cell", files: int = 16) -> None:
    """Spatial-locality layout: range-repartition + sort rows by the S2 cell
    id before writing.

    S2 ids order cells along a Hilbert curve, so sorting by the id clusters
    spatially-near pixels into the same files and row groups; each file then
    covers a DISJOINT id range and carries tight parquet min/max stats on
    ``cell_col``. A bbox query expressed as S2 id ranges
    (``cell_col BETWEEN lo AND hi``) is pushed to the scan and skips whole
    files/row groups — at 100 TB this is the difference between a full scan
    and touching only the covering's files (Iceberg gives the same effect
    from its manifest-level column bounds; the layout choice carries over
    unchanged). tests/test_io.py proves the disjointness + pruning on the
    written footers and the executed plan."""
    out = df.repartitionByRange(files, F.col(cell_col)) \
            .sortWithinPartitions(cell_col)
    io.write(out, target)
