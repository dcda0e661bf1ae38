"""Spatial operators: batched cell-encode, broadcast R-tree PIP join, kNN.

North rule (BASELINE.json:6): pixels/tiles are "assigned to H3 (res 7-9) and
S2 cells via batched cell-encode, then joined to vector AOI polygons with a
broadcast R-tree point-in-polygon test, kNN matched to CWV station
observations". No shapely/rtree/h3 libs exist (SURVEY.md §0) — everything
here is numpy + Arrow-batched UDFs; per-row Python is banned
(BASELINE.json:15).

Scale shape: the vector side (AOIs, stations) is small-and-broadcast; the
raster side streams through mapInPandas. The R-tree is a 2-level STR packing
(leaf groups of ~sqrt(m) polygons): point batches prune against group bboxes
first, then member bboxes, then exact vectorized ray-casting — the classic
broadcast-spatial-join plan (cf. Raptor, PAPERS.md).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

from . import geo

# --------------------------------------------------------------------------
# batched cell-encode (vectorized pandas UDFs)
# --------------------------------------------------------------------------


def s2_cell_udf(level: int = 14):
    @F.pandas_udf(LongType())
    def enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(geo.s2_cell(lon.to_numpy(), lat.to_numpy(), level))

    return enc


def hexcell_udf(res: int):
    @F.pandas_udf(LongType())
    def enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(geo.hexcell(lon.to_numpy(), lat.to_numpy(), res))

    return enc


def with_cells(df: DataFrame, lon_col: str = "lon", lat_col: str = "lat",
               s2_level: int = 14) -> DataFrame:
    """Adds hex_7/hex_8/hex_9 (hex grid, H3-role) + s2_cell columns."""
    lon, lat = F.col(lon_col), F.col(lat_col)
    return (
        df.withColumn("hex_7", hexcell_udf(7)(lon, lat))
        .withColumn("hex_8", hexcell_udf(8)(lon, lat))
        .withColumn("hex_9", hexcell_udf(9)(lon, lat))
        .withColumn("s2_cell", s2_cell_udf(s2_level)(lon, lat))
    )


# --------------------------------------------------------------------------
# polygons: packed arrays + 2-level STR tree + vectorized ray casting
# --------------------------------------------------------------------------


class PackedPolygons:
    """AOI polygons packed into flat numpy arrays (broadcast-friendly)."""

    def __init__(self, aoi_ids: list[str], rings: list[np.ndarray]):
        self.aoi_ids = np.array(aoi_ids, dtype=object)
        self.starts = np.zeros(len(rings) + 1, dtype=np.int64)
        for i, r in enumerate(rings):
            self.starts[i + 1] = self.starts[i] + len(r)
        self.xy = np.concatenate(rings, axis=0) if rings else np.zeros((0, 2))
        self.bbox = np.array(
            [[r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()] for r in rings]
        ) if rings else np.zeros((0, 4))
        # STR packing: sort by x-center into ~sqrt(m) slices, then by y within
        m = len(rings)
        if m:
            nslice = max(1, int(math.sqrt(m)))
            cx = (self.bbox[:, 0] + self.bbox[:, 2]) / 2
            cy = (self.bbox[:, 1] + self.bbox[:, 3]) / 2
            order = np.lexsort((cy, np.digitize(cx, np.quantile(cx, np.linspace(0, 1, nslice + 1)[1:-1]))))
            self.order = order
            per = max(1, math.ceil(m / nslice))
            groups = [order[i : i + per] for i in range(0, m, per)]
            self.groups = groups
            self.group_bbox = np.array(
                [[self.bbox[g, 0].min(), self.bbox[g, 1].min(),
                  self.bbox[g, 2].max(), self.bbox[g, 3].max()] for g in groups]
            )
        else:
            self.order = np.zeros(0, dtype=np.int64)
            self.groups = []
            self.group_bbox = np.zeros((0, 4))

    @classmethod
    def from_pdf(cls, aoi: pd.DataFrame) -> "PackedPolygons":
        """From the aoi_polygons fixture schema (ring = list of {lon,lat})."""
        ids, rings = [], []
        for _, row in aoi.iterrows():
            ring = np.array([[p["lon"], p["lat"]] for p in row["ring"]], dtype=np.float64)
            if not np.allclose(ring[0], ring[-1]):
                ring = np.vstack([ring, ring[:1]])
            ids.append(row["aoi_id"])
            rings.append(ring)
        return cls(ids, rings)

    def ring(self, k: int) -> np.ndarray:
        return self.xy[self.starts[k] : self.starts[k + 1]]


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray,
                   eps: float = 1e-12) -> np.ndarray:
    """Vectorized even-odd ray casting; boundary (edge/vertex) counts inside.

    (n points) x (e edges) crossing test, done edge-blocked to bound memory.
    """
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    inside = np.zeros(px.shape, dtype=bool)
    on_edge = np.zeros(px.shape, dtype=bool)
    # broadcast (n, e)
    PX = px[:, None]
    PY = py[:, None]
    cond = (y0[None, :] > PY) != (y1[None, :] > PY)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0[None, :] + (PY - y0[None, :]) * (x1 - x0)[None, :] / (y1 - y0)[None, :]
    crossings = (cond & (PX < xint)).sum(axis=1)
    inside = (crossings % 2) == 1
    # boundary: point-to-segment distance ~ 0
    dx, dy = (x1 - x0)[None, :], (y1 - y0)[None, :]
    seg2 = dx * dx + dy * dy
    t = np.clip(((PX - x0[None, :]) * dx + (PY - y0[None, :]) * dy) / np.where(seg2 == 0, 1, seg2), 0, 1)
    d2 = (PX - (x0[None, :] + t * dx)) ** 2 + (PY - (y0[None, :] + t * dy)) ** 2
    on_edge = (d2 <= eps).any(axis=1)
    return inside | on_edge


def query_polygons(pp: PackedPolygons, px: np.ndarray, py: np.ndarray):
    """-> (point_idx array, poly_idx array) of all containment matches."""
    out_p, out_g = [], []
    if not len(pp.groups):
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    # level 1: group bboxes
    gb = pp.group_bbox
    gmask = (
        (px[:, None] >= gb[None, :, 0]) & (px[:, None] <= gb[None, :, 2])
        & (py[:, None] >= gb[None, :, 1]) & (py[:, None] <= gb[None, :, 3])
    )
    for gi, members in enumerate(pp.groups):
        pts = np.nonzero(gmask[:, gi])[0]
        if not pts.size:
            continue
        # level 2: member bboxes
        bb = pp.bbox[members]
        mmask = (
            (px[pts, None] >= bb[None, :, 0]) & (px[pts, None] <= bb[None, :, 2])
            & (py[pts, None] >= bb[None, :, 1]) & (py[pts, None] <= bb[None, :, 3])
        )
        for mi, poly in enumerate(members):
            cand = pts[mmask[:, mi]]
            if not cand.size:
                continue
            hit = points_in_ring(px[cand], py[cand], pp.ring(int(poly)))
            sel = cand[hit]
            out_p.append(sel)
            out_g.append(np.full(sel.size, poly, dtype=np.int64))
    if out_p:
        return np.concatenate(out_p), np.concatenate(out_g)
    return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)


def pip_join(points: DataFrame, aoi: pd.DataFrame, lon_col: str = "lon",
             lat_col: str = "lat", how: str = "inner") -> DataFrame:
    """Broadcast R-tree point-in-polygon join: adds aoi_id (+category).

    Emits one row per (point, containing polygon) — true join semantics
    (overlapping AOIs duplicate the point, like the reference join rows).
    ``how='left'`` keeps non-matching points with NULL aoi_id.
    """
    spark = points.sparkSession
    pp = PackedPolygons.from_pdf(aoi)
    cat = dict(zip(aoi["aoi_id"], aoi.get("category", pd.Series(index=aoi.index, dtype=object))))
    bc = spark.sparkContext.broadcast((pp, cat))
    out_schema = StructType(points.schema.fields + [
        StructField("aoi_id", StringType()),
        StructField("aoi_category", StringType()),
    ])

    def fn(batches):
        pp, cat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            px = pdf[lon_col].to_numpy(np.float64)
            py = pdf[lat_col].to_numpy(np.float64)
            pi, gi = query_polygons(pp, px, py)
            matched = pdf.iloc[pi].copy() if pi.size else pdf.iloc[:0].copy()
            matched["aoi_id"] = pp.aoi_ids[gi] if pi.size else []
            matched["aoi_category"] = [cat.get(a) for a in matched["aoi_id"]]
            if how == "left":
                unmatched_idx = np.setdiff1d(np.arange(len(pdf)), np.unique(pi))
                un = pdf.iloc[unmatched_idx].copy()
                un["aoi_id"] = None
                un["aoi_category"] = None
                matched = pd.concat([matched, un], ignore_index=True)
            yield matched

    return points.mapInPandas(fn, out_schema)


def aoi_cells_df(spark, aoi: pd.DataFrame, res: int = 8) -> DataFrame:
    """AOI polygons exploded to their covering hex cells at ``res``.

    One row per (polygon, covering cell); the ring travels inline as two
    array<double> columns so the verify stage needs no second join (the
    standard space-for-shuffle trade — rings are tens of vertices). The
    covering runs as a distributed mapInPandas over the polygon table, so
    it scales with the AOI layer, not the driver.
    """
    rows = []
    for _, row in aoi.iterrows():
        ring = np.array([[p["lon"], p["lat"]] for p in row["ring"]], dtype=np.float64)
        if not np.allclose(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        rows.append({
            "aoi_id": row["aoi_id"],
            "aoi_category": row.get("category"),
            "ring_x": ring[:, 0].tolist(),
            "ring_y": ring[:, 1].tolist(),
        })
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    out_schema = StructType([
        StructField("cell", LongType()),
        StructField("aoi_id", StringType()),
        StructField("aoi_category", StringType()),
        StructField("ring_x", ArrayType(DoubleType())),
        StructField("ring_y", ArrayType(DoubleType())),
    ])

    def cover(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                rx = np.asarray(row["ring_x"], dtype=np.float64)
                ry = np.asarray(row["ring_y"], dtype=np.float64)
                cells = geo.hex_cover_bbox(float(rx.min()), float(ry.min()),
                                           float(rx.max()), float(ry.max()), res)
                out.append(pd.DataFrame({
                    "cell": cells,
                    "aoi_id": row["aoi_id"],
                    "aoi_category": row["aoi_category"],
                    "ring_x": [row["ring_x"]] * len(cells),
                    "ring_y": [row["ring_y"]] * len(cells),
                }))
            if out:
                yield pd.concat(out, ignore_index=True)

    return sdf.mapInPandas(cover, out_schema)


def pip_join_cells(points: DataFrame, aoi: pd.DataFrame, res: int = 8,
                   lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Distributed point-in-polygon join — NO broadcast of the polygon side.

    The scale path when the AOI layer outgrows a broadcast (millions of
    polygons at 100 TB): polygons explode into covering hex cells
    (aoi_cells_df), points encode to the same cell, candidates come from a
    plain EQUI join on the cell key (hash-partitionable; AQE/salting apply
    like any other hot-key join), and a vectorized ray-cast verifies every
    candidate pair exactly. Inner-join semantics, one row per
    (point, containing polygon) — row-for-row identical to the broadcast
    ``pip_join`` (pytest parity in tests/test_spatial.py); compose a
    left_anti join on the caller's point key for left semantics.
    """
    spark = points.sparkSession
    cover = aoi_cells_df(spark, aoi, res=res)
    pts = points.withColumn("cell", hexcell_udf(res)(F.col(lon_col), F.col(lat_col)))
    cand = pts.join(cover, on="cell", how="inner").drop("cell")

    out_schema = StructType(points.schema.fields + [
        StructField("aoi_id", StringType()),
        StructField("aoi_category", StringType()),
    ])
    point_cols = [f.name for f in points.schema.fields]

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf[lon_col].to_numpy(np.float64)
            py = pdf[lat_col].to_numpy(np.float64)
            for aoi_id, idx in pdf.groupby("aoi_id").indices.items():
                ring = np.column_stack((
                    np.asarray(pdf["ring_x"].iloc[idx[0]], dtype=np.float64),
                    np.asarray(pdf["ring_y"].iloc[idx[0]], dtype=np.float64),
                ))
                keep[idx] = points_in_ring(px[idx], py[idx], ring)
            yield pdf.loc[keep, point_cols + ["aoi_id", "aoi_category"]]

    return cand.mapInPandas(verify, out_schema)


# --------------------------------------------------------------------------
# kNN join to stations (broadcast small side, vectorized haversine)
# --------------------------------------------------------------------------

EARTH_R_KM = 6371.0088


def haversine_km(lon1, lat1, lon2, lat2):
    p = np.pi / 180.0
    dlat = (lat2 - lat1) * p
    dlon = (lon2 - lon1) * p
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1 * p) * np.cos(lat2 * p) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_R_KM * np.arcsin(np.sqrt(np.clip(a, 0, 1)))


def knn_join(points: DataFrame, stations: pd.DataFrame, k: int = 3,
             lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Each point row exploded to its k nearest stations (+rank, distance).

    Stations are broadcast (small side); per batch the distance matrix is
    (n x m) with argpartition top-k — no shuffle at all. Deterministic
    tie-break: (distance, station_id).
    """
    spark = points.sparkSession
    st = (
        stations["station_id"].to_numpy(object),
        stations["lon"].to_numpy(np.float64),
        stations["lat"].to_numpy(np.float64),
        stations["cwv_obs"].to_numpy(np.float64) if "cwv_obs" in stations else None,
    )
    bc = spark.sparkContext.broadcast(st)
    out_schema = StructType(points.schema.fields + [
        StructField("station_id", StringType()),
        StructField("station_rank", IntegerType()),
        StructField("station_km", DoubleType()),
        StructField("station_cwv", DoubleType()),
    ])

    def fn(batches):
        ids, slon, slat, scwv = bc.value
        m = len(ids)
        kk = min(k, m)
        # stable secondary sort on station_id for exact determinism
        id_order = np.argsort(ids, kind="stable")
        for pdf in batches:
            if not len(pdf):
                continue
            plon = pdf[lon_col].to_numpy(np.float64)
            plat = pdf[lat_col].to_numpy(np.float64)
            d = haversine_km(plon[:, None], plat[:, None], slon[None, :], slat[None, :])
            # top-k with deterministic tie-break (distance, station_id)
            key = d + np.argsort(id_order)[None, :] * 1e-12
            top = np.argpartition(key, kk - 1, axis=1)[:, :kk]
            rowi = np.arange(len(pdf))[:, None]
            order = np.argsort(key[rowi, top], axis=1)
            top = top[rowi, order]
            rep = pdf.loc[pdf.index.repeat(kk)].reset_index(drop=True)
            rep["station_id"] = ids[top].ravel()
            rep["station_rank"] = np.tile(np.arange(1, kk + 1, dtype=np.int32), len(pdf))
            rep["station_km"] = d[rowi, top].ravel()
            rep["station_cwv"] = scwv[top].ravel() if scwv is not None else np.nan
            yield rep

    return points.mapInPandas(fn, out_schema)


def knn_join_cells(points: DataFrame, stations: pd.DataFrame, k: int = 3,
                   res: int = 7, key_cols: list[str] | None = None,
                   lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Distributed kNN join — NO station broadcast (the scale path when the
    station table outgrows a broadcast).

    Every station registers under its own hex cell plus its 6 axial
    neighbors (pure JVM bit arithmetic on the packed cell id: q±1 is
    cell±2^28, r±1 is cell±1); every point probes its single cell, so each
    (point, station-in-1-ring) pair surfaces exactly once from a plain EQUI
    join on the cell key. Haversine + per-point rank run entirely in
    Catalyst (one window on the point key).

    Exactness certificate (``knn_certified``): the axial lattice spacing is
    sqrt(3)*size in degree space and ring-2 cell centers are >= 3*size away,
    so any station OUTSIDE the 1-ring is farther than
    ``(3*size - 2*circumradius) = size`` degrees from the point — at least
    ``size * 110 * cos(|lat| + 3*size)`` km. When the k-th candidate
    distance is below that bound (and >= k candidates exist), the candidate
    top-k IS the global top-k; rows failing the bound are emitted with
    ``knn_certified = false`` (re-run those points at a coarser res or via
    the broadcast ``knn_join``). Parity vs brute force on certified rows in
    tests/test_spatial.py.
    """
    if key_cols is None:
        raise ValueError("knn_join_cells needs key_cols identifying a point row")
    spark = points.sparkSession
    size = geo.HEX_EDGE_DEG[res]
    st = spark.createDataFrame(
        stations[["station_id", "lon", "lat"]
                 + (["cwv_obs"] if "cwv_obs" in stations else [])]
    ).withColumnRenamed("lon", "s_lon").withColumnRenamed("lat", "s_lat")
    st = st.withColumn("own_cell", hexcell_udf(res)(F.col("s_lon"), F.col("s_lat")))
    Q = F.lit(1 << 28)
    one = F.lit(1)
    c = F.col("own_cell")
    st_cells = st.withColumn(
        "cell",
        F.explode(F.array(c, c + Q, c - Q, c + one, c - one, c + Q - one, c - Q + one)),
    ).drop("own_cell")

    pts = points.withColumn("cell", hexcell_udf(res)(F.col(lon_col), F.col(lat_col)))
    cand = pts.join(st_cells, on="cell", how="inner").drop("cell")

    p = math.pi / 180.0
    dlat = (F.col("s_lat") - F.col(lat_col)) * p / 2.0
    dlon = (F.col("s_lon") - F.col(lon_col)) * p / 2.0
    a = F.sin(dlat) ** 2 + F.cos(F.col(lat_col) * p) * F.cos(F.col("s_lat") * p) * F.sin(dlon) ** 2
    km = 2.0 * EARTH_R_KM * F.asin(F.sqrt(F.least(F.greatest(a, F.lit(0.0)), F.lit(1.0))))
    cand = cand.withColumn("station_km", km)

    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy("station_km", "station_id")
    wall = Window.partitionBy(*key_cols)
    ranked = (
        cand.withColumn("station_rank", F.row_number().over(w).cast("int"))
        .withColumn("n_cand", F.count(F.lit(1)).over(wall))
        .filter(F.col("station_rank") <= k)
    )
    bound_km = (
        F.lit(size * 110.0)
        * F.cos((F.abs(F.col(lat_col)) + 3.0 * size) * p)
    )
    wk = Window.partitionBy(*key_cols)
    out = ranked.withColumn(
        "knn_certified",
        (F.col("n_cand") >= k) & (F.max("station_km").over(wk) < bound_km),
    )
    cols = ([f.name for f in points.schema.fields]
            + ["station_id", "station_rank", "station_km"]
            + (["cwv_obs"] if "cwv_obs" in stations else [])
            + ["knn_certified"])
    if "cwv_obs" in stations:
        out = out.withColumnRenamed("cwv_obs", "station_cwv")
        cols = [("station_cwv" if x == "cwv_obs" else x) for x in cols]
    return out.select(*cols)


# --------------------------------------------------------------------------
# fused pixel enrichment: cells + PIP + kNN in ONE Python hop
# --------------------------------------------------------------------------


def enrich_pixels(points: DataFrame, aoi: pd.DataFrame, stations: pd.DataFrame,
                  k: int = 3, s2_level: int = 14, how: str = "left",
                  lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Cell-encode + broadcast R-tree PIP + kNN stations in a single
    mapInArrow pass.

    Broadcast is the right physical strategy while the vector sides fit one
    executor (the fixture regime); when the AOI/station layers outgrow a
    broadcast, swap in the distributed variants — ``pip_join_cells`` /
    ``knn_join_cells`` (cell-key equi joins, no broadcast, same row
    semantics; parity-tested against these paths).

    The composable ops (with_cells, pip_join, knn_join) each pay a full
    JVM<->Python serialization of every pixel column; chained on the
    north-star flow that is 3 extra round trips of ~20 columns per pixel.
    All three stages only need (lon, lat) plus broadcast small sides, so one
    fused hop computes them together — same results row-for-row as the
    composition (the pytest oracles cover each stage individually).
    """
    import pyarrow as pa

    spark = points.sparkSession
    pp = PackedPolygons.from_pdf(aoi)
    cat = dict(zip(aoi["aoi_id"], aoi.get("category", pd.Series(index=aoi.index, dtype=object))))
    st = (
        stations["station_id"].to_numpy(object),
        stations["lon"].to_numpy(np.float64),
        stations["lat"].to_numpy(np.float64),
        stations["cwv_obs"].to_numpy(np.float64) if "cwv_obs" in stations else None,
    )
    bc = spark.sparkContext.broadcast((pp, cat, st))

    in_fields = list(points.schema.fields)
    out_schema = StructType(in_fields + [
        StructField("hex_7", LongType()), StructField("hex_8", LongType()),
        StructField("hex_9", LongType()), StructField("s2_cell", LongType()),
        StructField("aoi_id", StringType()), StructField("aoi_category", StringType()),
        StructField("station_id", StringType()), StructField("station_rank", IntegerType()),
        StructField("station_km", DoubleType()), StructField("station_cwv", DoubleType()),
    ])
    in_names = [f.name for f in in_fields]
    lon_i, lat_i = in_names.index(lon_col), in_names.index(lat_col)

    import pyarrow as _pa

    _PA = {"string": _pa.string(), "int": _pa.int32(), "bigint": _pa.int64(),
           "double": _pa.float64(), "binary": _pa.binary()}
    pa_out = _pa.schema([(f.name, _PA[f.dataType.simpleString()]) for f in out_schema])

    def fn(batches):
        pp, cat, (ids, slon, slat, scwv) = bc.value
        m = len(ids)
        kk = min(k, m)
        id_rank = np.argsort(np.argsort(ids, kind="stable"))
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            px = batch.column(lon_i).to_numpy(zero_copy_only=False).astype(np.float64)
            py = batch.column(lat_i).to_numpy(zero_copy_only=False).astype(np.float64)

            # cells (same kernels the pandas UDFs wrap)
            from . import geo
            cells = [geo.hexcell(px, py, r) for r in (7, 8, 9)] + [geo.s2_cell(px, py, s2_level)]

            # PIP -> (point index, aoi arrays), left semantics
            pi, gi = query_polygons(pp, px, py)
            if how == "left":
                unmatched = np.setdiff1d(np.arange(n), np.unique(pi))
                idxA = np.concatenate([pi, unmatched])
                aoi_ids = np.concatenate([pp.aoi_ids[gi],
                                          np.full(unmatched.size, None, dtype=object)])
            else:
                idxA = pi
                aoi_ids = pp.aoi_ids[gi]
            aoi_cat = np.array([cat.get(a) if a is not None else None for a in aoi_ids],
                               dtype=object)

            # kNN on the ORIGINAL points, then indexed through idxA
            d = haversine_km(px[:, None], py[:, None], slon[None, :], slat[None, :])
            key = d + id_rank[None, :] * 1e-12
            top = np.argpartition(key, kk - 1, axis=1)[:, :kk]
            rowi = np.arange(n)[:, None]
            order = np.argsort(key[rowi, top], axis=1)
            top = top[rowi, order]                      # (n, kk) station idx

            # final fan-out: each aoi-expanded row repeats kk times
            F_idx = np.repeat(idxA, kk)                  # input row per output
            st_pick = top[idxA].ravel()                  # station per output
            arrays = []
            for i, f in enumerate(in_fields):
                col = batch.column(i).take(pa.array(F_idx))
                arrays.append(col)
            rep_aoi = np.repeat(aoi_ids, kk)
            rep_cat = np.repeat(aoi_cat, kk)
            for c in cells:
                arrays.append(pa.array(c[F_idx], type=pa.int64()))
            arrays.append(pa.array(rep_aoi, type=pa.string()))
            arrays.append(pa.array(rep_cat, type=pa.string()))
            arrays.append(pa.array(ids[st_pick], type=pa.string()))
            arrays.append(pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int32), idxA.size)))
            arrays.append(pa.array(d[F_idx, st_pick]))
            arrays.append(pa.array(scwv[st_pick] if scwv is not None
                                   else np.full(st_pick.size, np.nan)))
            yield pa.RecordBatch.from_arrays(arrays, schema=pa_out)

    return points.mapInArrow(fn, out_schema)
