"""sample_raster (r.what / v.what.rast analog) vs a numpy lookup oracle.

The oracle computes the pixel index with independent numpy floor math on
the mosaicked scene; the Spark path must agree exactly, and forward
pixel centroids (the lst_pixels geocode formula) must round-trip to
their own pixel bit-exactly.
"""

import numpy as np
import pandas as pd
import pytest

from i_landsat8_swlst_spark import spatial

LON0, LAT0, LON1, LAT1 = 10.0, 40.0, 13.0, 42.0
NTX, NTY, TW, TH = 3, 2, 10, 8
H, W = NTY * TH, NTX * TW


def _fixture(spark, scene_id="S0", seed=31):
    rng = np.random.default_rng(seed)
    plane = rng.uniform(270.0, 330.0, (H, W)).astype(np.float32)
    plane[3, 4] = np.nan  # a NaN pixel inside tile (0, 0)
    rows = []
    for ty in range(NTY):
        for tx in range(NTX):
            t = plane[ty * TH:(ty + 1) * TH, tx * TW:(tx + 1) * TW]
            rows.append({"scene_id": scene_id, "tile_x": tx, "tile_y": ty,
                         "w": TW, "h": TH, "lst_bytes": t.tobytes()})
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    geom = spark.createDataFrame(pd.DataFrame([{
        "scene_id": scene_id, "lon0": LON0, "lat0": LAT0,
        "lon1": LON1, "lat1": LAT1, "ntx": NTX, "nty": NTY}]))
    return tiles, geom, plane


def _oracle_pixel(lon, lat):
    """Independent scene-global pixel index (gx, gy)."""
    gx = int(np.floor((lon - LON0) / (LON1 - LON0) * W))
    gy = int(np.floor((LAT1 - lat) / (LAT1 - LAT0) * H))
    return gx, gy


def test_sample_matches_numpy_oracle(spark):
    tiles, geom, plane = _fixture(spark)
    rng = np.random.default_rng(7)
    lons = rng.uniform(LON0, LON1 - 1e-9, 200)
    lats = rng.uniform(LAT0 + 1e-9, LAT1, 200)
    pts = spark.createDataFrame(pd.DataFrame(
        {"pid": np.arange(200), "lon": lons, "lat": lats}))
    got = {r.pid: r for r in
           spatial.sample_raster(tiles, pts, geom).collect()}
    assert len(got) == 200
    for i in range(200):
        gx, gy = _oracle_pixel(lons[i], lats[i])
        r = got[i]
        want = plane[gy, gx]
        assert (r.tile_x * TW + r.px, r.tile_y * TH + r.py) == (gx, gy), i
        if np.isnan(want):
            assert r.value is None, i
        else:
            assert r.value == pytest.approx(float(want), abs=0), i


def test_sample_centroid_roundtrip_and_edges(spark):
    tiles, geom, plane = _fixture(spark)
    # forward geocode of every pixel centroid (the lst_pixels formula)
    dlon, dlat = (LON1 - LON0) / NTX, (LAT1 - LAT0) / NTY
    cents = []
    for gy in range(H):
        for gx in range(W):
            tx, px = divmod(gx, TW)
            ty, py = divmod(gy, TH)
            cents.append({
                "pid": gy * W + gx,
                "lon": LON0 + (tx + (px + 0.5) / TW) * dlon,
                "lat": LAT1 - (ty + (py + 0.5) / TH) * dlat})
    pts = spark.createDataFrame(pd.DataFrame(cents))
    got = spatial.sample_raster(tiles, pts, geom).collect()
    assert len(got) == H * W
    for r in got:
        gy, gx = divmod(r.pid, W)
        assert (r.tile_x * TW + r.px, r.tile_y * TH + r.py) == (gx, gy)
        want = plane[gy, gx]
        if np.isnan(want):
            assert r.value is None
        else:
            assert r.value == float(want)

    # boundary semantics: lon0/lat1 edges in, lon1/lat0 edges out,
    # fully-outside points dropped
    edge = spark.createDataFrame(pd.DataFrame([
        {"pid": 0, "lon": LON0, "lat": LAT1},      # NW corner -> pixel (0,0)
        {"pid": 1, "lon": LON1, "lat": LAT1},      # lon == lon1 -> out
        {"pid": 2, "lon": LON0, "lat": LAT0},      # lat == lat0 -> out
        {"pid": 3, "lon": LON0 - 5.0, "lat": LAT1 + 5.0},  # far out
    ]))
    rows = spatial.sample_raster(tiles, edge, geom).collect()
    assert [r.pid for r in rows] == [0]
    assert (rows[0].tile_x, rows[0].tile_y, rows[0].px, rows[0].py) == (0, 0, 0, 0)


def test_sample_overlapping_scenes_emit_one_row_each(spark):
    t1, g1, p1 = _fixture(spark, scene_id="SA", seed=1)
    t2, g2, p2 = _fixture(spark, scene_id="SB", seed=2)  # same bbox
    tiles, geom = t1.unionAll(t2), g1.unionAll(g2)
    pts = spark.createDataFrame(pd.DataFrame(
        [{"pid": 0, "lon": 11.0, "lat": 41.0}]))
    got = spatial.sample_raster(tiles, pts, geom).collect()
    assert sorted(r.scene_id for r in got) == ["SA", "SB"]
    gx, gy = _oracle_pixel(11.0, 41.0)
    vals = {r.scene_id: r.value for r in got}
    assert vals["SA"] == float(p1[gy, gx])
    assert vals["SB"] == float(p2[gy, gx])


def test_transect_profile(spark):
    tiles, geom, plane = _fixture(spark)
    n = 50
    # horizontal transect through the middle of the scene
    lat = (LAT0 + LAT1) / 2
    got = spatial.transect(tiles, geom, LON0, lat, LON1 - 1e-9, lat,
                          n=n).collect()
    assert len(got) == n
    assert [r.step for r in got] == list(range(n))
    for r in got:
        gx, gy = _oracle_pixel(r.lon, r.lat)
        want = plane[gy, gx]
        assert r.value == pytest.approx(float(want)), r.step
    assert got[0].dist_km == pytest.approx(0.0)
    # monotone distance, roughly the scene width (3 deg at ~47 km/deg @41N)
    d = [r.dist_km for r in got]
    assert all(b > a for a, b in zip(d, d[1:]))
    assert 200 < d[-1] < 300
    with pytest.raises(ValueError, match="n must be"):
        spatial.transect(tiles, geom, LON0, lat, LON1, lat, n=1)
