"""Kernel-vs-scalar-oracle parity (SURVEY.md §5.2 item 1) — mirrors the
reference's random-DN self-test methodology (C12) deterministically."""

import math

import numpy as np
import pytest

import oracle_ref as oracle
from i_landsat8_swlst_spark import constants as C
from i_landsat8_swlst_spark import kernels as K

RNG = np.random.default_rng(42)


def test_radiance_and_bt_match_oracle():
    dn = RNG.integers(1, 65536, size=500).astype(np.float64)
    got_rad = K.dn_to_radiance(dn, C.ML_DEFAULT, C.AL_DEFAULT)
    got_bt = K.dn_to_bt(dn, C.ML_DEFAULT, C.AL_DEFAULT, C.K1_B10, C.K2_B10)
    for i in range(dn.size):
        assert got_rad[i] == pytest.approx(oracle.radiance(dn[i], C.ML_DEFAULT, C.AL_DEFAULT))
        assert got_bt[i] == pytest.approx(
            oracle.brightness_temperature(dn[i], C.ML_DEFAULT, C.AL_DEFAULT, C.K1_B10, C.K2_B10)
        )


def test_cwv_grid_matches_oracle_including_nan_window():
    h = w = 12
    t10 = 280.0 + 10.0 * RNG.standard_normal((h, w))
    t11 = 0.85 * t10 + 40.0 + 0.1 * RNG.standard_normal((h, w))
    t10[5, 6] = np.nan  # simulated cloud pixel
    for window in (3, 5, 7):
        got = K.cwv(t10, t11, window)
        exp = np.array(oracle.cwv_grid(t10.tolist(), t11.tolist(), window))
        assert got.shape == exp.shape
        both_nan = np.isnan(got) & np.isnan(exp)
        close = np.isclose(got, exp, rtol=1e-9, atol=1e-9)
        assert np.all(both_nan | close), (got[~(both_nan | close)], exp[~(both_nan | close)])
        # NaN window poisoning: every pixel whose window touches (5,6) is NaN
        r = window // 2
        assert np.all(np.isnan(got[5 - r : 5 + r + 1, 6 - r : 6 + r + 1]))
        # edges are NaN (off-map window cells -> NULL)
        assert np.all(np.isnan(got[:r, :])) and np.all(np.isnan(got[:, :r]))


def test_subrange_selection_matches_oracle_rule():
    vals = np.array([-0.5, 0.0, 1.0, 2.0, 2.4999, 2.5, 3.0, 3.49, 3.5, 4.0,
                     4.49, 4.5, 5.0, 5.49, 5.5, 6.0, 6.3, 6.31, np.nan])
    idx = K.select_subrange(vals)
    order = C.SUBRANGE_ORDER
    for v, i in zip(vals, idx):
        name = oracle.select_subrange(float(v))
        exp = -1 if name is None else order.index(name)
        assert i == exp, (v, i, name)


def test_lst_matches_oracle_over_random_inputs():
    n = 2000
    t10 = 240.0 + 80.0 * RNG.random(n)
    t11 = t10 - 4.0 + 8.0 * RNG.random(n)
    cwv_arr = -0.5 + 7.5 * RNG.random(n)  # includes out-of-range
    e10 = 0.95 + 0.05 * RNG.random(n)
    e11 = 0.95 + 0.05 * RNG.random(n)
    lst, idx = K.lst_from_bt(t10, t11, cwv_arr, e10, e11)
    for i in range(n):
        exp = oracle.compute_lst(t10[i], t11[i], cwv_arr[i], e10[i], e11[i])
        if math.isnan(exp):
            assert np.isnan(lst[i])
        else:
            assert lst[i] == pytest.approx(exp, rel=1e-12)
    # whole-range fallback path
    wr = K.lst_whole_range(t10, t11, e10, e11)
    for i in range(0, n, 97):
        assert wr[i] == pytest.approx(
            oracle.compute_lst_whole_range(t10[i], t11[i], e10[i], e11[i]), rel=1e-12
        )


def test_fused_kernel_end_to_end_vs_oracle():
    h = w = 16
    dn10 = RNG.integers(15000, 35000, (h, w)).astype(np.float64)
    dn11 = RNG.integers(15000, 35000, (h, w)).astype(np.float64)
    meta = dict(
        ml_b10=C.ML_DEFAULT, al_b10=C.AL_DEFAULT, ml_b11=C.ML_DEFAULT, al_b11=C.AL_DEFAULT,
        k1_b10=C.K1_B10, k2_b10=C.K2_B10, k1_b11=C.K1_B11, k2_b11=C.K2_B11,
    )
    out = K.fused_lst_kernel(dn10, dn11, meta, e10=0.971, e11=0.968, window=5)
    t10 = np.array([[oracle.brightness_temperature(dn10[y, x], C.ML_DEFAULT, C.AL_DEFAULT, C.K1_B10, C.K2_B10) for x in range(w)] for y in range(h)])
    t11 = np.array([[oracle.brightness_temperature(dn11[y, x], C.ML_DEFAULT, C.AL_DEFAULT, C.K1_B11, C.K2_B11) for x in range(w)] for y in range(h)])
    np.testing.assert_allclose(out["bt10"], t10, rtol=1e-12)
    exp_cwv = np.array(oracle.cwv_grid(t10.tolist(), t11.tolist(), 5))
    valid = ~np.isnan(exp_cwv)
    np.testing.assert_allclose(out["cwv"][valid], exp_cwv[valid], rtol=1e-8)
    for y in range(2, h - 2, 3):
        for x in range(2, w - 2, 3):
            exp = oracle.compute_lst(t10[y, x], t11[y, x], exp_cwv[y, x], 0.971, 0.968)
            if math.isnan(exp):
                assert np.isnan(out["lst_k"][y, x])
            else:
                assert out["lst_k"][y, x] == pytest.approx(exp, rel=1e-8)
    np.testing.assert_allclose(out["lst_c"], out["lst_k"] - 273.15)


def test_cloud_mask_propagates_null():
    x = np.ones((4, 4))
    qa = np.zeros((4, 4), dtype=np.int64)
    qa[1, 2] = 61440
    masked = K.apply_cloud_mask(x, qa, np.array([61440]))
    assert np.isnan(masked[1, 2]) and np.isfinite(masked).sum() == 15


@pytest.mark.xfail(reason="reference mount /root/reference empty (SURVEY.md §0); "
                   "coefficients transcribed from Du et al. 2015 — swap in the "
                   "reference CSVs to close bit-for-bit (OQ-3)")
def test_coefficients_bit_for_bit_vs_reference_csv():
    import pathlib
    ref = pathlib.Path("/root/reference")
    csvs = list(ref.rglob("*.csv"))
    assert csvs, "reference CSVs not mounted"


def test_subrange_boundary_values_match_cascade_oracle():
    """SURVEY 5.2 item 4: classification at the EXACT subrange cut points
    (and one ulp either side) must match the scalar first-match cascade —
    the searchsorted rewrite's boundary semantics, pinned."""
    import oracle_ref as O  # conftest puts tests/ on sys.path

    _, lo, hi, _ = K._coef_matrix()
    name2idx = {f"Range_{i + 1}": i for i in range(5)}
    name2idx[None] = -1
    pts = []
    for k in range(5):
        pts += [lo[k], hi[k], float(np.nextafter(hi[k], -10)),
                float(np.nextafter(hi[k], 10)), (lo[k] + hi[k]) / 2]
    pts += [-0.1, 6.31, float("nan")]
    arr = np.array(pts)
    mine = K.select_subrange(arr)
    theirs = np.array([name2idx[O.select_subrange(float(v))] for v in arr])
    np.testing.assert_array_equal(mine, theirs)


def test_fused_dn_to_bt_equals_composed_stages():
    """C2+C3: the fused dn_to_bt (and its LUT fast path) must be bit-identical
    to the composed public stages radiance_to_bt(dn_to_radiance(...))."""
    rng = np.random.default_rng(5)
    dn = rng.integers(1, 65536, (64, 64)).astype(np.uint16)
    composed = K.radiance_to_bt(
        K.dn_to_radiance(dn.astype(np.float64), C.ML_DEFAULT, C.AL_DEFAULT),
        C.K1_B10, C.K2_B10)
    via_lut = K.dn_to_bt(dn, C.ML_DEFAULT, C.AL_DEFAULT, C.K1_B10, C.K2_B10)
    via_arith = K.dn_to_bt(dn.astype(np.float64), C.ML_DEFAULT, C.AL_DEFAULT,
                           C.K1_B10, C.K2_B10)
    np.testing.assert_array_equal(via_lut, composed)
    np.testing.assert_array_equal(via_arith, composed)


# --- focal (neighborhood) statistics ------------------------------------------------


def _focal_naive(x, window):
    rad = window // 2
    h, w = x.shape
    out = {k: np.full((h, w), np.nan) for k in ("count", "mean", "std", "min", "max")}
    for i in range(h):
        for j in range(w):
            win = x[max(0, i - rad):i + rad + 1, max(0, j - rad):j + rad + 1]
            v = win[np.isfinite(win)]
            out["count"][i, j] = len(v)
            if len(v) == 0:
                continue
            out["mean"][i, j] = v.mean()
            out["min"][i, j] = v.min()
            out["max"][i, j] = v.max()
            if len(v) > 1:
                out["std"][i, j] = v.std(ddof=1)
    return out


def test_focal_stats_matches_naive():
    rng = np.random.default_rng(51)
    x = rng.uniform(250, 330, (17, 13))
    x[rng.random(x.shape) < 0.25] = np.nan
    for window in (3, 5, 7):
        got = K.focal_stats(x, window)
        exp = _focal_naive(x, window)
        np.testing.assert_array_equal(got["count"], exp["count"])
        # min/max are exact selections; mean/std differ only by cumsum
        # association order
        np.testing.assert_array_equal(got["min"], exp["min"])
        np.testing.assert_array_equal(got["max"], exp["max"])
        for k in ("mean", "std"):
            np.testing.assert_allclose(got[k], exp[k], rtol=1e-9, equal_nan=True)


def test_focal_stats_all_nan_and_constant_planes():
    x = np.full((6, 6), np.nan)
    r = K.focal_stats(x, 3)
    assert (r["count"] == 0).all()
    for k in ("mean", "std", "min", "max"):
        assert np.isnan(r[k]).all()
    # constant plane: the sum-of-squares identity must clamp to std == 0,
    # not go NaN on the tiny negative fp residue
    c = np.full((6, 6), 300.25)
    rc = K.focal_stats(c, 3)
    np.testing.assert_array_equal(rc["std"], np.zeros((6, 6)))
    np.testing.assert_array_equal(rc["mean"], c)


def test_focal_stats_batch_dim_identical():
    rng = np.random.default_rng(52)
    x = rng.uniform(0, 1, (4, 11, 7))
    x[rng.random(x.shape) < 0.2] = np.nan
    stacked = K.focal_stats(x, 5)
    for i in range(4):
        single = K.focal_stats(x[i], 5)
        for k in stacked:
            np.testing.assert_array_equal(stacked[k][i], single[k])


# --- Horn slope / aspect / hillshade ------------------------------------------------


def test_slope_aspect_golden_planes():
    inner = (slice(1, -1), slice(1, -1))
    # z = 2x (east-up): slope atan(2), downslope west (270)
    x = np.arange(8.0)[None, :] * 2.0 * np.ones((8, 1))
    r = K.slope_aspect(x)
    np.testing.assert_allclose(r["dzdx"][inner], 2.0)
    np.testing.assert_allclose(r["dzdy"][inner], 0.0)
    np.testing.assert_allclose(r["slope_deg"][inner], math.degrees(math.atan(2)))
    np.testing.assert_allclose(r["aspect_deg"][inner], 270.0)
    # z rises southward -> downslope north (0); northward -> south (180)
    y = np.arange(8.0)[:, None] * np.ones((1, 8))
    np.testing.assert_allclose(K.slope_aspect(y)["aspect_deg"][inner], 0.0)
    np.testing.assert_allclose(K.slope_aspect(-y)["aspect_deg"][inner], 180.0)
    # cell size scales the gradient
    np.testing.assert_allclose(K.slope_aspect(x, cell=2.0)["dzdx"][inner], 1.0)
    # flat plane: slope 0, aspect NaN, hillshade sin(45 deg)
    rf = K.slope_aspect(np.full((6, 6), 7.0))
    np.testing.assert_allclose(rf["slope_deg"][inner], 0.0)
    assert np.isnan(rf["aspect_deg"][inner]).all()
    np.testing.assert_allclose(rf["hillshade"][inner], math.sin(math.radians(45)))


def test_slope_aspect_nan_poison_ring():
    rng = np.random.default_rng(91)
    x = rng.uniform(0, 10, (9, 9))
    x[4, 4] = np.nan
    r = K.slope_aspect(x)
    # border ring always NaN (window hangs off); the NaN poisons its 3x3
    assert np.isnan(r["slope_deg"][0, :]).all()
    assert np.isnan(r["slope_deg"][:, -1]).all()
    assert np.isnan(r["slope_deg"][3:6, 3:6]).all()
    inner_ok = np.ones((9, 9), dtype=bool)
    inner_ok[:1, :] = inner_ok[-1:, :] = inner_ok[:, :1] = inner_ok[:, -1:] = False
    inner_ok[3:6, 3:6] = False
    assert np.isfinite(r["slope_deg"][inner_ok]).all()
    # hillshade brightest on slopes facing the 315-deg sun: z = (i+j)*c
    # rises east+south, so downslope points northwest (aspect 315) — it
    # must out-shine the mirror plane facing southeast (135)
    g_to = K.slope_aspect(np.fromfunction(lambda i, j: (i + j) * 0.3, (8, 8)))
    g_away = K.slope_aspect(np.fromfunction(lambda i, j: -(i + j) * 0.3, (8, 8)))
    inner = (slice(1, -1), slice(1, -1))
    np.testing.assert_allclose(g_to["aspect_deg"][inner], 315.0)
    np.testing.assert_allclose(g_away["aspect_deg"][inner], 135.0)
    assert g_to["hillshade"][inner].mean() > g_away["hillshade"][inner].mean()


# --- r.mfilter convolution ------------------------------------------------

def _conv_naive(x, wts, divisor):
    h, w = x.shape
    kh, kw = wts.shape
    rh, rw = kh // 2, kw // 2
    out = np.full((h, w), np.nan)
    for y in range(h):
        for xx in range(w):
            if not np.isfinite(x[y, xx]):
                continue
            acc = wsum = 0.0
            for i in range(kh):
                for j in range(kw):
                    yy, xj = y + i - rh, xx + j - rw
                    if 0 <= yy < h and 0 <= xj < w and np.isfinite(x[yy, xj]):
                        if wts[i, j] != 0.0:
                            acc += wts[i, j] * x[yy, xj]
                            wsum += wts[i, j]
            if divisor is None:
                out[y, xx] = acc / wts.sum()
            elif divisor == 0.0:
                out[y, xx] = acc / wsum if wsum != 0.0 else np.nan
            else:
                out[y, xx] = acc / divisor
    return out


def test_convolve_plane_matches_naive():
    rng = np.random.default_rng(41)
    x = rng.uniform(250, 330, (17, 23))
    x[rng.random(x.shape) < 0.15] = np.nan
    kernels = [
        (np.array([[0., -1, 0], [-1, 5, -1], [0, -1, 0]]), None),   # sharpen
        (np.ones((3, 3)), 0.0),                                     # renorm
        (np.array([[1., 2, 1], [2, 4, 2], [1, 2, 1]]), 16.0),       # gauss
        (np.array([[-1., 0, 1]] * 3).T, 0.0),                       # grad
    ]
    for wts, div in kernels:
        got = K.convolve_plane(x, wts, div)
        want = _conv_naive(x, wts, div)
        assert np.allclose(got, want, equal_nan=True, atol=1e-12), (wts, div)


def test_convolve_plane_rejects_bad_args():
    x = np.ones((4, 4))
    with pytest.raises(ValueError, match="odd-dimensioned"):
        K.convolve_plane(x, np.ones((2, 3)))
    # zero-sum kernel with no explicit divisor: ambiguous, must raise
    with pytest.raises(ValueError, match="divisor"):
        K.convolve_plane(x, np.array([[1.0, 0, -1]]))
    # ... but is fine with one (the gradient-filter use case)
    assert np.isfinite(
        K.convolve_plane(x, np.array([[1.0, 0, -1]]), divisor=2.0)[2, 2])


# --- r.grow -----------------------------------------------------------------

def _grow_naive(x, radius, value=None):
    h, w = x.shape
    out = x.copy()
    for y in range(h):
        for xx in range(w):
            if np.isfinite(x[y, xx]):
                continue
            best = None  # (d2, dy, dx, val)
            for yy in range(h):
                for xj in range(w):
                    if not np.isfinite(x[yy, xj]):
                        continue
                    d2 = (yy - y) ** 2 + (xj - xx) ** 2
                    if d2 <= radius * radius:
                        k = (d2, yy - y, xj - xx)
                        if best is None or k < best[:3]:
                            best = (*k, x[yy, xj])
            if best is not None:
                out[y, xx] = value if value is not None else best[3]
    return out


def test_grow_plane_matches_naive():
    rng = np.random.default_rng(59)
    x = rng.uniform(0, 50, (13, 17))
    x[rng.random(x.shape) < 0.6] = np.nan
    for radius, value in [(1.01, None), (2.5, None), (2.0, -7.0)]:
        got = K.grow_plane(x, radius, value)
        want = _grow_naive(x, radius, value)
        assert np.array_equal(got, want, equal_nan=True), (radius, value)
    # valid cells never change
    keep = np.isfinite(x)
    assert np.array_equal(K.grow_plane(x, 3.0)[keep], x[keep])
    with pytest.raises(ValueError, match="radius"):
        K.grow_plane(x, 0.0)


# --- r.fillnulls ------------------------------------------------------------

def _fillnulls_naive(x, radius, power):
    h, w = x.shape
    out = x.copy()
    for y in range(h):
        for xx in range(w):
            if np.isfinite(x[y, xx]):
                continue
            sw = sv = 0.0
            for yy in range(h):
                for xj in range(w):
                    if not np.isfinite(x[yy, xj]):
                        continue
                    d2 = (yy - y) ** 2 + (xj - xx) ** 2
                    if 0 < d2 <= radius * radius:
                        wgt = 1.0 / d2 ** (power / 2.0)
                        sw += wgt
                        sv += wgt * x[yy, xj]
            if sw > 0:
                out[y, xx] = sv / sw
    return out


def test_fillnulls_plane_matches_naive():
    rng = np.random.default_rng(67)
    x = rng.uniform(270, 320, (11, 14))
    x[rng.random(x.shape) < 0.4] = np.nan
    x[0:5, 0:5] = np.nan  # a hole wider than small radii: center stays NULL
    for radius, power in [(1.5, 2.0), (3.0, 2.0), (2.0, 1.0)]:
        got = K.fillnulls_plane(x, radius, power)
        want = _fillnulls_naive(x, radius, power)
        assert np.allclose(got, want, equal_nan=True, rtol=1e-12), \
            (radius, power)
    keep = np.isfinite(x)
    assert np.array_equal(K.fillnulls_plane(x, 3.0)[keep], x[keep])
    assert np.isnan(K.fillnulls_plane(x, 1.5)[2, 2])  # deep-hole center
    with pytest.raises(ValueError, match="radius"):
        K.fillnulls_plane(x, -1.0)


def test_fillnulls_spline_membrane_properties():
    """Spline method: (1) valid cells unchanged, (2) unreachable holes stay
    NULL, (3) maximum principle — filled values never leave the valid
    range, (4) on a plane whose boundary is LINEAR the membrane fill
    recovers the linear surface far better than IDW (IDW plateaus)."""
    from i_landsat8_swlst_spark import kernels

    yy, xx = np.mgrid[0:15, 0:15]
    truth = 2.0 * xx + 0.5 * yy + 10.0
    x = truth.copy()
    x[5:10, 5:10] = np.nan                      # 5x5 hole
    x[0, 14] = np.nan                           # far corner: reachable
    sp = kernels.fillnulls_plane(x, radius=3.0, method="spline", sweeps=60)
    idw = kernels.fillnulls_plane(x, radius=3.0)
    fixed = np.isfinite(x)
    assert np.array_equal(sp[fixed], x[fixed])
    assert np.isfinite(sp[5:10, 5:10]).all()
    assert sp[np.isfinite(sp)].min() >= np.nanmin(x) - 1e-9
    assert sp[np.isfinite(sp)].max() <= np.nanmax(x) + 1e-9
    hole = ~fixed
    err_sp = np.abs(sp - truth)[hole].max()
    err_idw = np.abs(idw - truth)[hole].max()
    assert err_sp < 0.35 * err_idw             # membrane ~linear-exact
    # the interior hole recovers the linear surface almost exactly (the
    # lone corner-cell fill is legitimately offset: a corner's 2-neighbor
    # mean is not the linear value)
    assert np.abs(sp - truth)[5:10, 5:10].max() < 0.2
    # an unreachable deep-hole center stays NULL in both methods
    big = truth.copy()
    big[2:13, 2:13] = np.nan
    spb = kernels.fillnulls_plane(big, radius=2.0, method="spline")
    assert np.isnan(spb[7, 7])
    with pytest.raises(ValueError, match="method"):
        kernels.fillnulls_plane(x, radius=3.0, method="rst")


def test_fillnulls_spline_idw_zero_sweeps_degenerates():
    from i_landsat8_swlst_spark import kernels

    rng = np.random.default_rng(91)
    x = rng.uniform(0, 10, (12, 12))
    x[4:7, 4:8] = np.nan
    a = kernels.fillnulls_plane(x, radius=2.5)
    b = kernels.fillnulls_plane(x, radius=2.5, method="spline", sweeps=0)
    assert np.array_equal(np.isnan(a), np.isnan(b))
    m = np.isfinite(a)
    assert np.array_equal(a[m], b[m])
