"""TableIO + partitioned cell-prefix sink; partition pruning visible in plan."""

import pytest
from pyspark.sql import functions as F

from i_landsat8_swlst_spark.io import TableIO, with_cell_prefix, write_pixels_sink


def test_partitioned_sink_roundtrip_and_pruning(spark, tmp_path):
    from i_landsat8_swlst_spark import geo
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(8)
    pdf = pd.DataFrame({
        "pid": range(2000),
        "lon": rng.uniform(-30, 30, 2000),
        "lat": rng.uniform(-30, 30, 2000),
        "lst_k": rng.uniform(260, 320, 2000),
    })
    pdf["hex_7"] = geo.hexcell(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 7)
    df = spark.createDataFrame(pdf)
    io = TableIO(spark, "parquet")
    target = str(tmp_path / "pixels")
    write_pixels_sink(io, df, target)

    back = io.read(target)
    assert back.count() == 2000
    assert "cell_p" in back.columns
    # distinct partition keys bounded
    nparts = back.select("cell_p").distinct().count()
    assert 1 < nparts <= 256

    # partition pruning shows up in the scan
    one = back.select("cell_p").first().cell_p
    plan = back.filter(F.col("cell_p") == one)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cell_p" in plan


def test_iceberg_backend_gated(spark):
    with pytest.raises(NotImplementedError, match="Iceberg runtime jar"):
        TableIO(spark, "iceberg", catalog="c")
