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


def test_spatial_sorted_layout_prunes_s2_ranges(spark, tmp_path):
    """write_spatial_sorted: files cover DISJOINT s2_cell ranges (verified on
    the written parquet footers), a bbox-as-id-range filter is pushed to the
    scan, and most files are statically prunable for a narrow range."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from i_landsat8_swlst_spark import geo
    from i_landsat8_swlst_spark.io import TableIO, write_spatial_sorted

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "pid": range(4000),
        "lon": rng.uniform(-30, 30, 4000),
        "lat": rng.uniform(-30, 30, 4000),
        "lst_k": rng.uniform(260, 320, 4000),
    })
    pdf["s2_cell"] = geo.s2_cell(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), level=12)
    df = spark.createDataFrame(pdf)
    io = TableIO(spark, "parquet")
    target = str(tmp_path / "spatial")
    write_spatial_sorted(io, df, target, files=8)

    # 1) per-file id ranges are disjoint (the structural pruning guarantee)
    import pathlib
    spans = []
    for f in sorted(pathlib.Path(target).glob("*.parquet")):
        md = pq.read_metadata(str(f))
        col = next(i for i in range(md.num_columns)
                   if md.row_group(0).column(i).path_in_schema == "s2_cell")
        mins, maxs = [], []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(col).statistics
            mins.append(st.min); maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    assert len(spans) >= 4
    assert all(spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1))

    # 2) a narrow id-range query: pushed filters + identical results + most
    #    files statically out of range
    back = io.read(target)
    sub = pdf[(pdf.lon.between(-5, 5)) & (pdf.lat.between(-5, 5))]
    lo, hi = int(sub.s2_cell.min()), int(sub.s2_cell.max())
    q = back.filter((F.col("s2_cell") >= lo) & (F.col("s2_cell") <= hi))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(s2_cell" in plan
    exp = set(pdf[(pdf.s2_cell >= lo) & (pdf.s2_cell <= hi)].pid)
    assert set(r.pid for r in q.select("pid").collect()) == exp
    prunable = sum(1 for mn, mx in spans if mx < lo or mn > hi)
    assert prunable >= 1, spans


def test_s2_cover_query_through_spatial_layout(spark, tmp_path):
    """End to end: bbox -> s2_cover_bbox ranges -> pushed-down range
    predicate on the spatial-sorted table -> residual lon/lat filter ==
    exact bbox result."""
    import numpy as np
    import pandas as pd

    from i_landsat8_swlst_spark import geo
    from i_landsat8_swlst_spark.io import (
        TableIO, s2_range_predicate, write_spatial_sorted,
    )

    rng = np.random.default_rng(19)
    pdf = pd.DataFrame({
        "pid": range(5000),
        "lon": rng.uniform(0, 30, 5000),
        "lat": rng.uniform(30, 60, 5000),
        "lst_k": rng.uniform(260, 320, 5000),
    })
    pdf["s2_cell"] = geo.s2_cell(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), level=12)
    io = TableIO(spark, "parquet")
    target = str(tmp_path / "cover")
    write_spatial_sorted(io, spark.createDataFrame(pdf), target, files=8)

    bbox = (10.0, 40.0, 12.0, 42.0)
    ranges = geo.s2_ranges(geo.s2_cover_bbox(*bbox, level=10))
    back = io.read(target)
    coarse = back.filter(s2_range_predicate(ranges))
    plan = coarse._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "s2_cell" in plan
    exact = coarse.filter(
        (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
        & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3]))
    exp = pdf[(pdf.lon.between(bbox[0], bbox[2])) & (pdf.lat.between(bbox[1], bbox[3]))]
    assert set(r.pid for r in exact.select("pid").collect()) == set(exp.pid)
    # the coarse prefilter admits a superset but FAR less than the table
    n_coarse = coarse.count()
    assert len(exp) <= n_coarse < len(pdf) * 0.2


def test_s2_cover_query_antimeridian_through_spatial_layout(spark, tmp_path):
    """Round 4: a Pacific-crossing bbox (lon0 > lon1) pushes its unioned
    wrap covering down to the spatial-sorted scan; the residual filter is
    the OR-of-halves lon predicate. Exact-equality vs pandas truth."""
    import numpy as np
    import pandas as pd

    from i_landsat8_swlst_spark import geo
    from i_landsat8_swlst_spark.io import (
        TableIO, s2_range_predicate, write_spatial_sorted,
    )

    rng = np.random.default_rng(23)
    # points hugging both sides of the antimeridian plus far-away noise
    lon = np.concatenate([rng.uniform(165.0, 180.0, 2000),
                          rng.uniform(-180.0, -165.0, 2000),
                          rng.uniform(-30.0, 30.0, 1000)])
    pdf = pd.DataFrame({
        "pid": range(len(lon)),
        "lon": lon,
        "lat": rng.uniform(-20.0, 20.0, len(lon)),
        "lst_k": rng.uniform(260, 320, len(lon)),
    })
    pdf["s2_cell"] = geo.s2_cell(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), level=12)
    io = TableIO(spark, "parquet")
    target = str(tmp_path / "wrap")
    write_spatial_sorted(io, spark.createDataFrame(pdf), target, files=8)

    lon0, lat0, lon1, lat1 = 172.0, -10.0, -173.0, 10.0   # crosses +-180
    ranges = geo.s2_ranges(geo.s2_cover_bbox(lon0, lat0, lon1, lat1, level=10))
    back = io.read(target)
    coarse = back.filter(s2_range_predicate(ranges))
    plan = coarse._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "s2_cell" in plan
    exact = coarse.filter(
        ((F.col("lon") >= lon0) | (F.col("lon") <= lon1))
        & (F.col("lat") >= lat0) & (F.col("lat") <= lat1))
    exp = pdf[((pdf.lon >= lon0) | (pdf.lon <= lon1))
              & pdf.lat.between(lat0, lat1)]
    assert len(exp) > 100
    assert set(r.pid for r in exact.select("pid").collect()) == set(exp.pid)
    # superset but selective vs the full table
    n_coarse = coarse.count()
    assert len(exp) <= n_coarse < len(pdf)
