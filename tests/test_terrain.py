"""viewshed_tiles (r.viewshed analog) vs an independent whole-plane brute
oracle.

The oracle below reimplements the documented exact-R3 visibility spec
(terrain.py module docstring) structurally differently: it enumerates ALL
gridline-crossing parameters t along the ray, sorts them, and samples the
FULL scene plane — no sector decomposition, no sparse map. Parity of the
distributed kernel against it (including cross-tile sightlines, ragged
tiles, NaN terrain, max_dist) is the correctness gate; sector-count
invariance (8 vs 64 sectors byte-equal) pins the angular-inflation bound.
"""

import math

import numpy as np
import pandas as pd
import pytest

from i_landsat8_swlst_spark import terrain


# ---------------------------------------------------------------- oracle

def _interp_z(plane, x, y):
    """Terrain at a gridline crossing: linear between the two adjacent
    pixel centers perpendicular to the crossed axis; NaN partner -> NaN."""
    h, w = plane.shape

    def at(cx, cy):
        if 0 <= cx < w and 0 <= cy < h:
            return float(plane[cy, cx])
        return math.nan

    if x == math.floor(x) and y == math.floor(y):
        return at(int(x), int(y))
    if x == math.floor(x):                     # vertical gridline crossing
        y0 = math.floor(y)
        fy = y - y0
        za, zb = at(int(x), int(y0)), at(int(x), int(y0) + 1)
        if not (math.isfinite(za) and math.isfinite(zb)):
            return math.nan
        return (1 - fy) * za + fy * zb
    x0 = math.floor(x)                         # horizontal gridline crossing
    fx = x - x0
    za, zb = at(int(x0), int(y)), at(int(x0) + 1, int(y))
    if not (math.isfinite(za) and math.isfinite(zb)):
        return math.nan
    return (1 - fx) * za + fx * zb


def _los(plane, ox, oy, eye, tx, ty, tz):
    dx, dy = tx - ox, ty - oy
    dist = math.hypot(dx, dy)
    if dist == 0:
        return True
    tslope = (tz - eye) / dist
    ts = []
    if dx != 0:
        lo, hi = sorted((ox, tx))
        for x in range(int(math.floor(lo)) + 1, int(math.ceil(hi))):
            t = (x - ox) / dx
            if 0 < t < 1:
                ts.append((t, float(x), oy + t * dy))
    if dy != 0:
        lo, hi = sorted((oy, ty))
        for y in range(int(math.floor(lo)) + 1, int(math.ceil(hi))):
            t = (y - oy) / dy
            if 0 < t < 1:
                ts.append((t, ox + t * dx, float(y)))
    for t, x, y in sorted(ts):
        zc = _interp_z(plane, x, y)
        if not math.isfinite(zc):
            continue
        if (zc - eye) / (t * dist) > tslope + 1e-12:
            return False
    return True


def oracle_viewshed(plane, ox, oy, obs_height, max_dist=None):
    h, w = plane.shape
    eye = float(plane[oy, ox]) + obs_height
    out = np.full((h, w), 255, dtype=np.uint8)
    for ty in range(h):
        for tx in range(w):
            tz = float(plane[ty, tx])
            if not math.isfinite(tz):
                continue
            if max_dist is not None and math.hypot(tx - ox, ty - oy) > max_dist:
                continue
            out[ty, tx] = 1 if _los(plane, ox, oy, eye, tx, ty, tz) else 0
    return out


# -------------------------------------------------------------- fixtures

def _scene(spark, plane, scene_id="S0", tw=7, th=5):
    """Tile an arbitrary (possibly ragged-edge) plane."""
    h, w = plane.shape
    rows = []
    for ty in range((h + th - 1) // th):
        for tx in range((w + tw - 1) // tw):
            t = plane[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            rows.append({"scene_id": scene_id, "tile_x": tx, "tile_y": ty,
                         "w": t.shape[1], "h": t.shape[0],
                         "lst_bytes": np.ascontiguousarray(
                             t.astype("<f4")).tobytes()})
    return spark.createDataFrame(pd.DataFrame(rows))


def _terrain(h, w, seed):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.0, 30.0, (h, w))
    # a couple of ridges so the viewshed is non-trivial
    yy, xx = np.mgrid[0:h, 0:w]
    base += 60.0 * np.exp(-((xx - w * 0.7) ** 2 + (yy - h * 0.3) ** 2) / 18.0)
    base += 45.0 * np.exp(-((xx - w * 0.25) ** 2 + (yy - h * 0.75) ** 2) / 30.0)
    return base.astype(np.float32).astype(np.float64)


def _mosaic(rows, h, w, nom_w, nom_h):
    out = np.full((h, w), 254, dtype=np.uint8)   # 254 = never written
    for r in rows:
        t = np.frombuffer(r.vis_bytes, dtype=np.uint8).reshape(r.h, r.w)
        out[r.tile_y * nom_h:r.tile_y * nom_h + r.h,
            r.tile_x * nom_w:r.tile_x * nom_w + r.w] = t
    assert not (out == 254).any()
    return out


def _run(spark, plane, ox, oy, obs_height=1.75, max_dist=None,
         n_sectors=16, tw=7, th=5, scene_id="S0"):
    tiles = _scene(spark, plane, scene_id=scene_id, tw=tw, th=th)
    obs = pd.DataFrame([{"scene_id": scene_id, "ox": ox, "oy": oy}])
    rows = terrain.viewshed_tiles(
        tiles, obs, obs_height=obs_height, max_dist=max_dist,
        n_sectors=n_sectors).collect()
    h, w = plane.shape
    return rows, _mosaic(rows, h, w, tw, th)


# ----------------------------------------------------------------- tests

def test_single_tile_matches_oracle(spark):
    plane = _terrain(5, 7, seed=3)
    rows, got = _run(spark, plane, ox=1, oy=1, tw=16, th=16)
    want = oracle_viewshed(plane, 1, 1, 1.75)
    assert np.array_equal(got, want)
    (r,) = rows
    assert r.n_visible == int((want == 1).sum())
    assert r.n_evaluated == int((want != 255).sum())


def test_cross_tile_sightlines_match_oracle(spark):
    # observer in one corner tile, ridges in others: every long ray
    # crosses multiple tile boundaries
    plane = _terrain(16, 21, seed=11)
    _, got = _run(spark, plane, ox=2, oy=13)
    want = oracle_viewshed(plane, 2, 13, 1.75)
    assert np.array_equal(got, want)


def test_ragged_tiles_and_interior_observer(spark):
    plane = _terrain(17, 23, seed=5)             # 23 % 7 != 0, 17 % 5 != 0
    _, got = _run(spark, plane, ox=11, oy=8)
    want = oracle_viewshed(plane, 11, 8, 1.75)
    assert np.array_equal(got, want)


def test_nan_terrain_never_blocks_and_is_255(spark):
    plane = _terrain(12, 14, seed=7)
    plane[4:7, 5:8] = np.nan                     # hole between O and the east
    _, got = _run(spark, plane, ox=1, oy=5)
    want = oracle_viewshed(plane, 1, 5, 1.75)
    assert np.array_equal(got, want)
    assert (got[4:7, 5:8] == 255).all()
    # cells east of the hole are evaluated (the hole is transparent)
    assert (got[5, 9:] != 255).all()


def test_max_dist_limits_targets_not_blocking(spark):
    plane = _terrain(15, 15, seed=13)
    # a wall just OUTSIDE the radius whose support still blocks a ray to a
    # target just inside is impossible by construction (support cells lie
    # within 1 cell of the segment, hence within max_dist + 1); the +1.5
    # map margin covers it. Parity with the full-plane oracle proves it.
    _, got = _run(spark, plane, ox=7, oy=7, max_dist=5.0)
    want = oracle_viewshed(plane, 7, 7, 1.75, max_dist=5.0)
    assert np.array_equal(got, want)
    yy, xx = np.mgrid[0:15, 0:15]
    outside = np.hypot(xx - 7, yy - 7) > 5.0
    assert (got[outside] == 255).all()
    assert (got[~outside] != 255).all()


def test_sector_count_invariance(spark):
    # the angular-inflation bound must make the result independent of the
    # decomposition: 4, 8 and 64 sectors byte-equal
    plane = _terrain(16, 21, seed=17)
    _, a = _run(spark, plane, ox=3, oy=3, n_sectors=4)
    _, b = _run(spark, plane, ox=3, oy=3, n_sectors=8)
    _, c = _run(spark, plane, ox=3, oy=3, n_sectors=64)
    assert np.array_equal(a, b)
    assert np.array_equal(b, c)


def test_observer_height_changes_visibility(spark):
    plane = _terrain(12, 16, seed=19)
    _, low = _run(spark, plane, ox=1, oy=10, obs_height=0.0)
    _, high = _run(spark, plane, ox=1, oy=10, obs_height=80.0)
    # raising the eye strictly grows the visible set
    assert ((low == 1) <= (high == 1)).all()
    assert (high == 1).sum() > (low == 1).sum()
    assert np.array_equal(high != 255, low != 255)


def test_multi_scene_independent_observers(spark):
    pa_ = _terrain(10, 14, seed=23)
    pb_ = _terrain(10, 14, seed=29)
    ta = _scene(spark, pa_, scene_id="A")
    tb = _scene(spark, pb_, scene_id="B")
    obs = pd.DataFrame([{"scene_id": "A", "ox": 2, "oy": 2},
                        {"scene_id": "B", "ox": 11, "oy": 7}])
    rows = terrain.viewshed_tiles(ta.unionByName(tb), obs,
                                  n_sectors=8).collect()
    ga = _mosaic([r for r in rows if r.scene_id == "A"], 10, 14, 7, 5)
    gb = _mosaic([r for r in rows if r.scene_id == "B"], 10, 14, 7, 5)
    assert np.array_equal(ga, oracle_viewshed(pa_, 2, 2, 1.75))
    assert np.array_equal(gb, oracle_viewshed(pb_, 11, 7, 1.75))


def test_scene_without_observer_is_all_255(spark):
    pa_ = _terrain(10, 14, seed=23)
    pb_ = _terrain(10, 14, seed=29)
    ta = _scene(spark, pa_, scene_id="A")
    tb = _scene(spark, pb_, scene_id="B")
    obs = pd.DataFrame([{"scene_id": "A", "ox": 2, "oy": 2}])
    rows = terrain.viewshed_tiles(ta.unionByName(tb), obs,
                                  n_sectors=8).collect()
    gb = _mosaic([r for r in rows if r.scene_id == "B"], 10, 14, 7, 5)
    assert (gb == 255).all()
    ga = _mosaic([r for r in rows if r.scene_id == "A"], 10, 14, 7, 5)
    assert np.array_equal(ga, oracle_viewshed(pa_, 2, 2, 1.75))


def test_observer_on_nan_or_outside_raises(spark):
    plane = _terrain(10, 14, seed=31)
    plane[4, 6] = np.nan
    tiles = _scene(spark, plane)
    with pytest.raises(ValueError, match="NaN or outside"):
        terrain.viewshed_tiles(
            tiles, pd.DataFrame([{"scene_id": "S0", "ox": 6, "oy": 4}]))
    with pytest.raises(ValueError, match="NaN or outside"):
        terrain.viewshed_tiles(
            tiles, pd.DataFrame([{"scene_id": "S0", "ox": 99, "oy": 4}]))


def test_duplicate_observer_raises(spark):
    plane = _terrain(10, 14, seed=31)
    tiles = _scene(spark, plane)
    with pytest.raises(ValueError, match="one observer per scene"):
        terrain.viewshed_tiles(
            tiles, pd.DataFrame([{"scene_id": "S0", "ox": 1, "oy": 1},
                                 {"scene_id": "S0", "ox": 2, "oy": 2}]))


def test_flat_terrain_all_visible(spark):
    plane = np.full((10, 12), 5.0)
    _, got = _run(spark, plane, ox=4, oy=4, obs_height=1.0)
    assert (got == 1).all()


# ---- sun_tiles (r.sun analog, instantaneous) -------------------------------

def _sun_oracle(plane, az, altd):
    """Whole-scene irradiance: whole-plane Horn gradients + the documented
    shadow spec (terrain.shadow_plane, the serial reference the distributed
    strip scan must reproduce), then the same clear-sky formulas."""
    from i_landsat8_swlst_spark.kernels import slope_aspect

    g = slope_aspect(plane)
    sl = np.radians(g["slope_deg"])
    asp = np.radians(np.nan_to_num(g["aspect_deg"]))
    sh = terrain.shadow_plane(plane, az, altd)
    lit = sh != 1
    alt = math.radians(altd)
    m = 1.0 / math.sin(alt)
    beam = terrain.SOLAR_CONSTANT * 0.75 ** (m ** 0.678)
    azr = math.radians(az % 360.0)
    with np.errstate(invalid="ignore"):
        cosi = (math.sin(alt) * np.cos(sl)
                + math.cos(alt) * np.sin(sl) * np.cos(azr - asp))
        direct = beam * np.clip(cosi, 0.0, None) * lit
        diffuse = (terrain.SOLAR_CONSTANT * terrain._DIFFUSE_FRAC
                   * math.sin(alt) * (1.0 + np.cos(sl)) / 2.0)
        glob = (direct + diffuse).astype(np.float32)
    glob[np.isnan(sl)] = np.nan
    return glob


def _mosaic_sun(rows, h, w, nom_w, nom_h):
    out = np.full((h, w), np.nan, dtype=np.float32)
    for r in rows:
        t = np.frombuffer(r.glob_bytes, dtype="<f4").reshape(r.h, r.w)
        out[r.tile_y * nom_h:r.tile_y * nom_h + r.h,
            r.tile_x * nom_w:r.tile_x * nom_w + r.w] = t
    return out


def test_shadow_plane_pillar_golden():
    # flat ground with one 10-unit pillar, sun due west at 45 deg: the
    # shadow runs exactly 10 cells east of the pillar, nothing else shaded
    plane = np.zeros((9, 30))
    plane[4, 5] = 10.0
    sh = terrain.shadow_plane(plane, azimuth_deg=270.0, altitude_deg=45.0)
    want = np.zeros((9, 30), dtype=np.uint8)
    want[4, 6:15] = 1          # strictly: z_b - d > 0  ->  d < 10
    assert np.array_equal(sh, want)
    # sun due east instead: shadow flips west
    sh2 = terrain.shadow_plane(plane, azimuth_deg=90.0, altitude_deg=45.0)
    assert sh2[4, 6:].max() == 0 and (sh2[4, :5] == 1).any()


@pytest.mark.parametrize("az,alt", [(135.0, 35.0), (270.0, 20.0),
                                    (0.0, 60.0)])
def test_sun_tiles_matches_whole_scene_oracle(spark, az, alt):
    import pandas as pd

    plane = _terrain(16, 21, seed=41)
    tiles = _scene(spark, plane, tw=7, th=5)
    sun = pd.DataFrame([{"scene_id": "S0", "azimuth_deg": az,
                         "altitude_deg": alt}])
    rows = terrain.sun_tiles(tiles, sun).collect()
    got = _mosaic_sun(rows, 16, 21, 7, 5)
    want = _sun_oracle(plane, az, alt)
    assert np.array_equal(np.isnan(got), np.isnan(want))
    m = np.isfinite(want)
    assert np.array_equal(got[m], want[m])      # bit-identical
    n_shaded = sum(r.n_shaded for r in rows)
    sh = terrain.shadow_plane(plane, az, alt)
    assert n_shaded == int(((sh == 1) & m).sum())
    assert sum(r.n_valid for r in rows) == int(m.sum())


def test_sun_tiles_tiling_invariance(spark):
    import pandas as pd

    plane = _terrain(18, 24, seed=43)
    plane[7:9, 10:12] = np.nan
    sun = pd.DataFrame([{"scene_id": "S0", "azimuth_deg": 200.0,
                         "altitude_deg": 25.0}])
    a = _mosaic_sun(terrain.sun_tiles(_scene(spark, plane, tw=6, th=6),
                                      sun).collect(), 18, 24, 6, 6)
    b = _mosaic_sun(terrain.sun_tiles(_scene(spark, plane, tw=24, th=18),
                                      sun).collect(), 18, 24, 24, 18)
    assert np.array_equal(np.isnan(a), np.isnan(b))
    m = np.isfinite(a)
    assert np.array_equal(a[m], b[m])


def test_sun_tiles_validation_and_missing_scene(spark):
    import pandas as pd

    plane = _terrain(10, 14, seed=47)
    tiles = _scene(spark, plane)
    with pytest.raises(ValueError, match="altitude"):
        terrain.sun_tiles(tiles, pd.DataFrame([{
            "scene_id": "S0", "azimuth_deg": 90.0, "altitude_deg": 0.0}]))
    with pytest.raises(ValueError, match="one sun position"):
        terrain.sun_tiles(tiles, pd.DataFrame([
            {"scene_id": "S0", "azimuth_deg": 90.0, "altitude_deg": 30.0},
            {"scene_id": "S0", "azimuth_deg": 91.0, "altitude_deg": 30.0}]))
    # a scene absent from the sun table emits all-NaN planes
    rows = terrain.sun_tiles(tiles, pd.DataFrame([{
        "scene_id": "OTHER", "azimuth_deg": 90.0,
        "altitude_deg": 30.0}])).collect()
    assert all(r.n_valid == 0 for r in rows)
    got = _mosaic_sun(rows, 10, 14, 7, 5)
    assert np.isnan(got).all()


# ---- viewshed_count_tiles (cumulative multi-observer) ----------------------

def _mosaic_cnt(rows, h, w, nom_w, nom_h):
    out = np.full((h, w), np.nan, dtype=np.float32)
    for r in rows:
        t = np.frombuffer(r.count_bytes, dtype="<f4").reshape(r.h, r.w)
        out[r.tile_y * nom_h:r.tile_y * nom_h + r.h,
            r.tile_x * nom_w:r.tile_x * nom_w + r.w] = t
    return out


def test_viewshed_count_equals_sum_of_singles(spark):
    plane = _terrain(16, 21, seed=53)
    plane[6, 10] = np.nan
    tiles = _scene(spark, plane)
    obs = pd.DataFrame([
        {"scene_id": "S0", "obs_id": "a", "ox": 2, "oy": 2},
        {"scene_id": "S0", "obs_id": "b", "ox": 18, "oy": 13},
        {"scene_id": "S0", "obs_id": "c", "ox": 10, "oy": 8},
    ])
    rows = terrain.viewshed_count_tiles(tiles, obs, n_sectors=8).collect()
    got = _mosaic_cnt(rows, 16, 21, 7, 5)
    want = np.where(np.isfinite(plane), 0.0, np.nan).astype(np.float32)
    for _, o in obs.iterrows():
        single = oracle_viewshed(plane, int(o.ox), int(o.oy), 1.75)
        want[single == 1] += 1.0
    assert np.array_equal(np.isnan(got), np.isnan(want))
    m = np.isfinite(want)
    assert np.array_equal(got[m], want[m])
    assert sum(r.n_covered for r in rows) == int((want > 0).sum())
    assert sum(r.n_evaluated for r in rows) == int(m.sum())
    # observers see their own cells: counts there >= 1
    for _, o in obs.iterrows():
        assert got[int(o.oy), int(o.ox)] >= 1


def test_viewshed_count_max_dist_rings(spark):
    plane = np.zeros((20, 20))                 # flat: radius is the only cap
    tiles = _scene(spark, plane, tw=10, th=10)
    obs = pd.DataFrame([
        {"scene_id": "S0", "obs_id": "a", "ox": 5, "oy": 5},
        {"scene_id": "S0", "obs_id": "b", "ox": 14, "oy": 14},
    ])
    rows = terrain.viewshed_count_tiles(tiles, obs, max_dist=6.0,
                                        n_sectors=8).collect()
    got = _mosaic_cnt(rows, 20, 20, 10, 10)
    yy, xx = np.mgrid[0:20, 0:20]
    in_a = np.hypot(xx - 5, yy - 5) <= 6.0
    in_b = np.hypot(xx - 14, yy - 14) <= 6.0
    want = in_a.astype(np.float32) + in_b.astype(np.float32)
    assert np.array_equal(got, want)


def test_viewshed_count_validation(spark):
    plane = _terrain(10, 14, seed=59)
    tiles = _scene(spark, plane)
    with pytest.raises(ValueError, match="duplicate"):
        terrain.viewshed_count_tiles(tiles, pd.DataFrame([
            {"scene_id": "S0", "obs_id": "a", "ox": 1, "oy": 1},
            {"scene_id": "S0", "obs_id": "a", "ox": 2, "oy": 2}]))
    with pytest.raises(ValueError, match="NaN or outside"):
        terrain.viewshed_count_tiles(tiles, pd.DataFrame([
            {"scene_id": "S0", "obs_id": "a", "ox": 99, "oy": 1}]))


# ---- horizon_tiles (r.horizon analog) --------------------------------------

def oracle_horizon(plane, az):
    """Brute whole-plane horizon: same strip spec (floor(u cosA + v sinA)),
    per-cell O(strip) max slope over strictly azimuth-ward cells."""
    h, w = plane.shape
    a = math.radians(az % 360.0)
    du, dv = math.sin(a), -math.cos(a)
    vv, uu = np.mgrid[0:h, 0:w]
    s = uu * du + vv * dv
    strip = np.floor(uu * math.cos(a) + vv * math.sin(a)).astype(np.int64)
    out = np.full((h, w), np.nan)
    fin = np.isfinite(plane)
    for st in np.unique(strip):
        m = (strip == st) & fin
        idx = np.argwhere(m)
        for cy, cx in idx:
            best = None
            for by, bx in idx:
                if s[by, bx] > s[cy, cx]:
                    sl = (plane[by, bx] - plane[cy, cx]) \
                        / (s[by, bx] - s[cy, cx])
                    if best is None or sl > best:
                        best = sl
            if best is not None:
                out[cy, cx] = math.degrees(math.atan(best))
    return out


def _mosaic_hz(rows, h, w, nom_w, nom_h, az):
    out = np.full((h, w), np.nan, dtype=np.float32)
    for r in rows:
        if r.azimuth != az:
            continue
        t = np.frombuffer(r.horizon_bytes, dtype="<f4").reshape(r.h, r.w)
        out[r.tile_y * nom_h:r.tile_y * nom_h + r.h,
            r.tile_x * nom_w:r.tile_x * nom_w + r.w] = t
    return out


@pytest.mark.parametrize("az", [90.0, 210.0, 337.5])
def test_horizon_matches_brute_oracle(spark, az):
    plane = _terrain(12, 15, seed=61)
    plane[5, 7] = np.nan
    tiles = _scene(spark, plane, tw=6, th=5)
    rows = terrain.horizon_tiles(tiles, [az]).collect()
    got = _mosaic_hz(rows, 12, 15, 6, 5, az)
    want = oracle_horizon(plane, az).astype(np.float32)
    assert np.array_equal(np.isnan(got), np.isnan(want))
    m = np.isfinite(want)
    np.testing.assert_allclose(got[m], want[m], rtol=0, atol=1e-5)


def test_horizon_multi_azimuth_and_tiling_invariance(spark):
    plane = _terrain(14, 18, seed=67)
    azs = [45.0, 270.0]
    a = terrain.horizon_tiles(_scene(spark, plane, tw=6, th=7), azs).collect()
    b = terrain.horizon_tiles(_scene(spark, plane, tw=18, th=14),
                              azs).collect()
    for az in azs:
        ma = _mosaic_hz(a, 14, 18, 6, 7, az)
        mb = _mosaic_hz(b, 14, 18, 18, 14, az)
        assert np.array_equal(np.isnan(ma), np.isnan(mb))
        f = np.isfinite(ma)
        assert np.array_equal(ma[f], mb[f])
    assert len(a) == len(set((r.azimuth, r.tile_x, r.tile_y) for r in a))


def test_horizon_consistent_with_shadow(spark):
    # a cell is cast-shaded at sun altitude alt iff its horizon angle
    # toward the sun exceeds alt (away from float ties)
    plane = _terrain(13, 16, seed=71)
    az, alt = 225.0, 30.0
    hz = oracle_horizon(plane, az)
    sh = terrain.shadow_plane(plane, az, alt)
    m = np.isfinite(hz) & (np.abs(hz - alt) > 1e-6) & (sh != 255)
    assert ((hz[m] > alt) == (sh[m] == 1)).all()
    # and the distributed op agrees with the oracle here too
    rows = terrain.horizon_tiles(_scene(spark, plane), [az]).collect()
    got = _mosaic_hz(rows, 13, 16, 7, 5, az)
    f = np.isfinite(hz)
    np.testing.assert_allclose(got[f], hz.astype(np.float32)[f],
                               rtol=0, atol=1e-5)


def test_horizon_validation(spark):
    plane = _terrain(8, 8, seed=73)
    tiles = _scene(spark, plane)
    with pytest.raises(ValueError, match="at least one"):
        terrain.horizon_tiles(tiles, [])
    with pytest.raises(ValueError, match="duplicate"):
        terrain.horizon_tiles(tiles, [90.0, 450.0])
