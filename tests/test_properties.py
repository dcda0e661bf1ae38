"""Property-based tests (hypothesis): codec round-trips over arbitrary
shapes/values, subrange selection totality, S2/hex encoder stability."""

import numpy as np
from hypothesis import given, settings, strategies as st

import oracle_ref as oracle
from i_landsat8_swlst_spark import codecs, geo, kernels as K


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 70), w=st.integers(1, 70),
    seed=st.integers(0, 2**31 - 1),
)
def test_u16le_roundtrip_any_shape(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 65536, (h, w)).astype(np.uint16)
    out = codecs.decode_u16le(codecs.encode_u16le(img), w, h)
    np.testing.assert_array_equal(out, img.astype(np.float64))


@settings(max_examples=15, deadline=None)
@given(h=st.integers(8, 80), w=st.integers(8, 80), seed=st.integers(0, 2**31 - 1))
def test_u16dct_psnr_any_shape(h, w, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(
        20000 + 9000 * np.sin(xx / 9.0) * np.cos(yy / 7.0) + rng.normal(0, 400, (h, w)),
        1, 65535,
    ).astype(np.uint16)
    out = codecs.decode_u16dct(codecs.encode_u16dct(img), w, h)
    assert out.shape == (h, w)
    assert codecs.psnr(img, out) >= 40.0


@settings(max_examples=50, deadline=None)
@given(cwv=st.one_of(st.floats(min_value=-2.0, max_value=8.0), st.just(float("nan"))))
def test_subrange_total_and_matches_oracle(cwv):
    idx = K.select_subrange(np.array([cwv]))[0]
    name = oracle.select_subrange(cwv)
    if name is None:
        assert idx == -1
    else:
        from i_landsat8_swlst_spark import constants as C
        assert C.SUBRANGE_ORDER[idx] == name


@settings(max_examples=25, deadline=None)
@given(
    lon=st.floats(min_value=-179.99, max_value=179.99),
    lat=st.floats(min_value=-89.0, max_value=89.0),
    level=st.integers(1, 30),
)
def test_s2_center_reencodes_to_same_cell(lon, lat, level):
    c = geo.s2_cell(np.array([lon]), np.array([lat]), level)
    clon, clat = geo.s2_cell_center(c)
    c2 = geo.s2_cell(clon, clat, level)
    assert c2[0] == c[0]
    assert geo.s2_level(c)[0] == level


@settings(max_examples=25, deadline=None)
@given(
    lon=st.floats(min_value=-170.0, max_value=170.0),
    lat=st.floats(min_value=-80.0, max_value=80.0),
    res=st.sampled_from([7, 8, 9]),
)
def test_hexcell_center_distance_bound(lon, lat, res):
    c = geo.hexcell(np.array([lon]), np.array([lat]), res)
    clon, clat = geo.hexcell_center(c)
    assert np.hypot(clon[0] - lon, clat[0] - lat) <= geo.HEX_EDGE_DEG[res] * 1.0001


@given(h=st.integers(8, 64), w=st.integers(8, 64), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_png16_roundtrip_any_shape(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 65536, (h, w)).astype(np.uint16)
    np.testing.assert_array_equal(codecs.decode_png(codecs.encode_png16(img)), img)


@given(
    k=st.integers(1, 5), h=st.integers(8, 40), w=st.integers(8, 40),
    win=st.sampled_from([3, 5, 7]), seed=st.integers(0, 2**31 - 1),
    with_nan=st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_stacked_kernel_bit_identical_to_per_tile(k, h, w, win, seed, with_nan):
    """The batched mapInArrow path rests on this: a (k, h, w) stacked call of
    the full fused kernel must be BIT-identical to k separate 2-D calls."""
    if win >= min(h, w):
        return
    rng = np.random.default_rng(seed)
    dn10 = rng.integers(5000, 45000, (k, h, w)).astype(np.uint16)
    dn11 = rng.integers(5000, 45000, (k, h, w)).astype(np.uint16)
    qa = None
    cloud = None
    if with_nan:
        qa = np.zeros((k, h, w), dtype=np.uint16)
        qa[rng.random((k, h, w)) < 0.05] = 1
        cloud = np.array([1.0])
    meta = dict(ml_b10=3.342e-4, al_b10=0.1, ml_b11=3.342e-4, al_b11=0.1,
                k1_b10=774.8853, k2_b10=1321.0789, k1_b11=480.8883, k2_b11=1201.1442)
    stacked = K.fused_lst_kernel(dn10, dn11, meta, 0.98, 0.97, window=win,
                                 qa=qa, cloud_values=cloud)
    for i in range(k):
        single = K.fused_lst_kernel(
            dn10[i].copy(), dn11[i].copy(), meta, 0.98, 0.97, window=win,
            qa=None if qa is None else qa[i].copy(), cloud_values=cloud)
        for key in stacked:
            np.testing.assert_array_equal(stacked[key][i], single[key], err_msg=key)
