"""r.to.vect / r.contour analogs (vectorize.py) vs exact oracles.

to_vect: rings must reconstruct the pixel mask EXACTLY by even-odd fill
(the round-trip the VERDICT asked for), agree with extract_regions' areas,
and be invariant to the tiling. contour_lines: every vertex sits exactly
on the level set of the grid-edge interpolation, crossing parity matches
the mask, and the polyline set is invariant to the tiling.
"""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from i_landsat8_swlst_spark import regions, spatial, vectorize


def _tiles_from_plane(scene_id, plane, tw, th, ragged=False):
    """Cut a scene mosaic into tiles; with ragged=True the right/bottom
    edge tiles keep their short remainder (the engine's nominal-offset
    convention)."""
    rows = []
    H, W = plane.shape
    nty = (H + th - 1) // th if ragged else H // th
    ntx = (W + tw - 1) // tw if ragged else W // tw
    for ty in range(nty):
        for tx in range(ntx):
            t = plane[ty * th:min((ty + 1) * th, H),
                      tx * tw:min((tx + 1) * tw, W)]
            rows.append({"scene_id": scene_id, "tile_x": tx, "tile_y": ty,
                         "w": t.shape[1], "h": t.shape[0],
                         "lst_bytes": np.ascontiguousarray(
                             t, dtype="<f4").tobytes()})
    return rows


def _fill_rings(ring_rows, H, W):
    """Even-odd rasterization of rectilinear lattice rings: for every
    vertical edge, flip parity of all pixel centers left of it within its
    y-span. Exact for integer-lattice rings."""
    par = np.zeros((H, W), dtype=np.int64)
    for r in ring_rows:
        xs, ys = r["ring_x"], r["ring_y"]
        for i in range(len(xs) - 1):
            x0, y0, x1, y1 = xs[i], ys[i], xs[i + 1], ys[i + 1]
            if x0 == x1:                       # vertical edge
                ylo, yhi = (y0, y1) if y0 < y1 else (y1, y0)
                par[ylo:yhi, :x0] += 1
    return (par % 2).astype(bool)


def _mask_of(plane, thr):
    return np.isfinite(plane) & (plane > thr)


def _ring_pdf(spark, plane, thr, tw=8, th=8, ragged=False, sid="S0"):
    tiles = spark.createDataFrame(
        pd.DataFrame(_tiles_from_plane(sid, plane, tw, th, ragged=ragged)))
    return vectorize.to_vect(tiles, thr).toPandas()


# ---- to_vect ---------------------------------------------------------------

def test_to_vect_single_pixel(spark):
    plane = np.full((4, 4), 0.0)
    plane[1, 2] = 5.0
    out = _ring_pdf(spark, plane, 1.0, tw=2, th=2)
    assert len(out) == 1
    r = out.iloc[0]
    assert not r.is_hole and r.area_px == 1.0 and r.n_vertices == 4
    assert list(zip(r.ring_x, r.ring_y)) == [(2, 1), (3, 1), (3, 2),
                                             (2, 2), (2, 1)]


def test_to_vect_rect_collinear_compressed(spark):
    plane = np.zeros((6, 8))
    plane[1:4, 2:7] = 9.0        # 3x5 rectangle spanning tile borders
    out = _ring_pdf(spark, plane, 1.0, tw=4, th=3)
    assert len(out) == 1
    r = out.iloc[0]
    # collinear lattice vertices merge: a rectangle is exactly 4 corners
    assert r.n_vertices == 4 and r.area_px == 15.0 and not r.is_hole
    assert (min(r.ring_x), min(r.ring_y), max(r.ring_x), max(r.ring_y)) \
        == (2, 1, 7, 4)


def test_to_vect_donut_hole_across_tiles(spark):
    plane = np.zeros((8, 8))
    plane[1:7, 1:7] = 9.0
    plane[3:5, 3:5] = 0.0        # hole straddling the 4-tile corner
    out = _ring_pdf(spark, plane, 1.0, tw=4, th=4)
    assert len(out) == 2
    assert out.region_id.nunique() == 1
    ext = out[~out.is_hole].iloc[0]
    hole = out[out.is_hole].iloc[0]
    assert ext.area_px == 36.0 and hole.area_px == 4.0
    assert ext.ring_id == 0 and hole.ring_id == 1
    # filled area = exterior - hole = region pixel count
    mask = _fill_rings([ext, hole], 8, 8)
    assert (mask == _mask_of(plane, 1.0)).all()


def test_to_vect_checkerboard_pinch(spark):
    # same region touching itself diagonally (connected around the left):
    # the walk must not cross at the pinch vertex
    plane = np.zeros((3, 3))
    plane[0, 0] = plane[0, 1] = plane[1, 0] = plane[1, 2] = 9.0
    plane[2, 1] = plane[2, 2] = 9.0
    # mask: (0,0),(0,1) / (1,0),(1,2) / (2,1),(2,2): two 4-connected regions
    out = _ring_pdf(spark, plane, 1.0, tw=3, th=3)
    assert out.region_id.nunique() == 2
    filled = np.zeros((3, 3), dtype=bool)
    for rid, grp in out.groupby("region_id"):
        m = _fill_rings(list(grp.to_dict("records")), 3, 3)
        assert not (filled & m).any()         # rings never overlap
        filled |= m
    assert (filled == _mask_of(plane, 1.0)).all()


@pytest.mark.parametrize("seed,ragged", [(7, False), (8, True), (9, True)])
def test_to_vect_reconstructs_mask_random(spark, seed, ragged):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.0, 10.0, (12, 12))
    plane = np.kron(base, np.ones((4, 4)))     # 48x48 blobs (16 | 48; the
    # ragged variants cut 20px tiles so edge tiles keep an 8px remainder)
    plane += rng.uniform(-0.5, 0.5, plane.shape)
    plane[rng.random(plane.shape) < 0.04] = np.nan
    plane = plane.astype("<f4").astype(np.float64)
    H, W = plane.shape
    thr = 6.0
    tw = th = 20 if ragged else 16
    out = _ring_pdf(spark, plane, thr, tw=tw, th=th, ragged=ragged)
    mask = _mask_of(plane, thr)

    # per-region even-odd fill == that region's pixels; disjoint overall
    filled = np.zeros((H, W), dtype=bool)
    areas = {}
    for rid, grp in out.groupby("region_id"):
        m = _fill_rings(list(grp.to_dict("records")), H, W)
        assert not (filled & m).any()
        filled |= m
        ext = grp[~grp.is_hole]
        assert len(ext) == 1, "one exterior ring per region"
        areas[rid] = float(ext.area_px.iloc[0]
                           - grp[grp.is_hole].area_px.sum())
        assert areas[rid] == m.sum()
    assert (filled == mask).all()

    # areas agree with extract_regions on the same tiles
    tiles = spark.createDataFrame(
        pd.DataFrame(_tiles_from_plane("S0", plane, tw, th, ragged=ragged)))
    reg = regions.extract_regions(tiles, thr).toPandas()
    assert sorted(reg.area_px) == sorted(int(a) for a in areas.values())


def test_to_vect_tiling_invariant(spark):
    rng = np.random.default_rng(11)
    plane = np.kron(rng.uniform(0, 10, (6, 6)), np.ones((6, 6)))
    thr = 5.0

    def rings(tw, th, ragged=False):
        out = _ring_pdf(spark, plane, thr, tw=tw, th=th, ragged=ragged)
        return sorted(
            (tuple(r.ring_x), tuple(r.ring_y), bool(r.is_hole))
            for r in out.itertuples())

    a = rings(36, 36)          # single tile: the serial reference
    assert a == rings(12, 12)
    assert a == rings(9, 18)
    assert a == rings(16, 16, ragged=True)   # 36 % 16 != 0: ragged edges


def test_rings_to_lonlat_roundtrip(spark):
    plane = np.zeros((8, 8))
    plane[2:6, 2:6] = 9.0
    tiles = spark.createDataFrame(
        pd.DataFrame(_tiles_from_plane("S0", plane, 4, 4)))
    rings = vectorize.to_vect(tiles, 1.0)
    geom = spark.createDataFrame(pd.DataFrame([{
        "scene_id": "S0", "lon0": 10.0, "lat0": 40.0,
        "lon1": 10.8, "lat1": 40.8, "ntx": 2, "nty": 2}]))
    ll = vectorize.rings_to_lonlat(rings, geom, 4, 4).toPandas()
    r = ll.iloc[0]
    # corner (2,2) -> lon 10.2, lat 40.6; corner (6,6) -> lon 10.6, lat 40.2
    assert min(r.lonlat_x) == pytest.approx(10.2)
    assert max(r.lonlat_x) == pytest.approx(10.6)
    assert min(r.lonlat_y) == pytest.approx(40.2)
    assert max(r.lonlat_y) == pytest.approx(40.6)

    # feed the extracted polygon straight into the vector stack:
    # aoi_measures accepts the ring arrays; PIP classifies pixel centers
    aoi = (ll.assign(aoi_id=ll.region_id.astype(str))
           [["aoi_id", "lonlat_x", "lonlat_y"]]
           .rename(columns={"lonlat_x": "ring_x", "lonlat_y": "ring_y"}))
    meas = spatial.aoi_measures(spark, spark.createDataFrame(aoi)).toPandas()
    assert len(meas) == 1 and meas.area_km2.iloc[0] > 0
    pts = []
    for y in range(8):
        for x in range(8):
            pts.append({"pid": y * 8 + x,
                        "lon": 10.0 + (x + 0.5) * 0.1,
                        "lat": 40.8 - (y + 0.5) * 0.1})
    aoi_rings = aoi.assign(ring=[
        [{"lon": float(x), "lat": float(y)} for x, y in zip(rx, ry)]
        for rx, ry in zip(aoi.ring_x, aoi.ring_y)])[["aoi_id", "ring"]]
    hits = spatial.pip_join(spark.createDataFrame(pd.DataFrame(pts)),
                            aoi_rings).toPandas()
    inside = {(p.pid) for p in hits.itertuples()}
    want = {y * 8 + x for y in range(2, 6) for x in range(2, 6)}
    assert inside == want


# ---- contour_lines ---------------------------------------------------------

def _contours(spark, plane, levels, tw=8, th=8, ragged=False):
    tiles = spark.createDataFrame(
        pd.DataFrame(_tiles_from_plane("S0", plane, tw, th, ragged=ragged)))
    return vectorize.contour_lines(tiles, levels).toPandas()


def _edge_crossings(plane, L):
    """Expected #contour-vertices per mosaic grid edge: 1 iff (v>=L)
    differs across the edge (both finite)."""
    v = plane
    fin = np.isfinite(v)
    hi = np.where(fin, v >= L, False)
    nh = (fin[:, 1:] & fin[:, :-1] & (hi[:, 1:] != hi[:, :-1])).sum()
    nv = (fin[1:, :] & fin[:-1, :] & (hi[1:, :] != hi[:-1, :])).sum()
    return int(nh + nv)


def _bilinear_on_edges(plane, xs, ys):
    """Value at contour vertices: each vertex lies ON a grid edge (one of
    the two pixel-center coords is fractional), where bilinear == linear
    interpolation between the two centers."""
    out = []
    for x, y in zip(xs, ys):
        gx, gy = x - 0.5, y - 0.5     # pixel-center space
        x0, y0 = int(np.floor(gx)), int(np.floor(gy))
        fx, fy = gx - x0, gy - y0
        if fx == 0:
            out.append((1 - fy) * plane[y0, x0] + fy * plane[y0 + 1, x0])
        else:
            out.append((1 - fx) * plane[y0, x0] + fx * plane[y0, x0 + 1])
    return np.array(out)


def test_contour_vertices_on_level(spark):
    rng = np.random.default_rng(21)
    plane = np.kron(rng.uniform(260, 330, (6, 6)), np.ones((5, 5)))
    plane += rng.uniform(-2, 2, plane.shape)
    plane = plane.astype("<f4").astype(np.float64)
    L = 295.0
    out = _contours(spark, plane, [L], tw=10, th=10)
    n_verts = 0
    for r in out.itertuples():
        vals = _bilinear_on_edges(plane, r.xs, r.ys)
        assert np.allclose(vals, L, atol=1e-9), \
            f"vertex off level: {vals[np.argmax(np.abs(vals - L))]}"
        # interior vertices are distinct crossings; closed lines repeat one
        n_verts += r.n_vertices - (1 if r.closed else 0)
    assert n_verts == _edge_crossings(plane, L)


def test_contour_closed_loop_and_open_line(spark):
    # radial bump -> closed ring; tilted plane -> open lines to the edge
    yy, xx = np.mgrid[0:20, 0:20]
    bump = 300.0 + 20.0 * np.exp(-((xx - 10.0) ** 2 + (yy - 10.0) ** 2) / 18.0)
    bump = bump.astype("<f4").astype(np.float64)
    out = _contours(spark, bump, [310.0], tw=10, th=10)
    assert len(out) == 1 and bool(out.closed.iloc[0])

    tilt = (280.0 + (xx + yy).astype(np.float64))
    tilt = tilt.astype("<f4").astype(np.float64)
    out2 = _contours(spark, tilt, [290.5], tw=10, th=10)
    assert len(out2) >= 1 and not out2.closed.any()
    # open ends sit on the outermost pixel-center frame
    for r in out2.itertuples():
        for x, y in ((r.xs[0], r.ys[0]), (r.xs[-1], r.ys[-1])):
            assert (min(x, y) == pytest.approx(0.5)
                    or max(x, y) == pytest.approx(19.5))


def test_contour_tiling_invariant_incl_saddle(spark):
    rng = np.random.default_rng(31)
    plane = rng.uniform(0.0, 1.0, (24, 24))   # pure noise: saddles abound
    plane = plane.astype("<f4").astype(np.float64)
    levels = [0.31, 0.62]

    def lineset(tw, th, ragged=False):
        out = _contours(spark, plane, levels, tw=tw, th=th, ragged=ragged)
        return sorted((r.level, tuple(np.round(r.xs, 9)),
                       tuple(np.round(r.ys, 9)), r.closed)
                      for r in out.itertuples())

    a = lineset(24, 24)        # single tile: serial reference
    assert a == lineset(8, 8)
    assert a == lineset(12, 6)
    assert a == lineset(10, 10, ragged=True)


def test_contour_nan_hole_ends_lines(spark):
    yy, xx = np.mgrid[0:12, 0:12]
    plane = (xx + 0.0).astype("<f4").astype(np.float64)
    plane[4:8, 4:8] = np.nan
    out = _contours(spark, plane, [5.5], tw=6, th=6)
    # the x=6.0 vertical line is interrupted by the NaN block: cells with
    # any NaN corner (pixel rows 3..7 here) are skipped, leaving two open
    # 3-cell chains of 4 vertices each
    assert len(out) == 2 and not out.closed.any()
    assert sorted(out.n_vertices) == [4, 4]
    for r in out.itertuples():
        assert all(x == 6.0 for x in r.xs)


def test_contour_validation(spark):
    plane = np.zeros((4, 4))
    tiles = spark.createDataFrame(
        pd.DataFrame(_tiles_from_plane("S0", plane, 4, 4)))
    with pytest.raises(ValueError, match="at least one level"):
        vectorize.contour_lines(tiles, [])
