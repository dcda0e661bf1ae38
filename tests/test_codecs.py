"""Codec invariants (SURVEY.md §5.2 item 3, BASELINE.json:15)."""

import numpy as np
import pytest

from i_landsat8_swlst_spark import codecs

RNG = np.random.default_rng(7)


def _tile(h=64, w=64):
    yy, xx = np.mgrid[0:h, 0:w] / 64.0
    img = 20000 + 8000 * np.sin(3 * xx) * np.cos(2 * yy) + RNG.normal(0, 300, (h, w))
    return np.clip(np.round(img), 1, 65535).astype(np.uint16)


def test_u16le_roundtrip_identity():
    img = _tile()
    data = codecs.encode_u16le(img)
    assert len(data) == img.size * 2
    out = codecs.decode_u16le(data, 64, 64)
    np.testing.assert_array_equal(out, img.astype(np.float64))


@pytest.mark.parametrize("h,w", [(64, 64), (32, 32), (33, 31), (256, 256)])
def test_u16dct_psnr_gate(h, w):
    img = _tile(h, w)
    data = codecs.encode_u16dct(img)
    out = codecs.decode_u16dct(data, w, h)
    p = codecs.psnr(img, out)
    assert p >= 40.0, f"PSNR {p:.1f} < 40 dB"
    assert len(data) < img.size * 2  # actually compresses smooth tiles


def test_decode_dispatch_and_unknown_fmt():
    img = _tile(32, 32)
    np.testing.assert_array_equal(
        codecs.decode_tile(codecs.encode_tile(img, "u16le"), 32, 32, "u16le"), img
    )
    with pytest.raises(NotImplementedError):
        codecs.decode_tile(b"x", 1, 1, "png")


def test_phash_stable_and_discriminative():
    img = _tile()
    h1 = codecs.phash64(img.astype(np.float64))
    h2 = codecs.phash64(img.astype(np.float64))
    assert h1 == h2
    assert isinstance(h1, int)
    # lossy roundtrip barely moves the hash
    lossy = codecs.decode_u16dct(codecs.encode_u16dct(img), 64, 64)
    assert codecs.hamming64(h1, codecs.phash64(lossy)) <= 4
    # a different tile is far away
    other = codecs.phash64(_tile().astype(np.float64) * -1 + 40000)
    assert codecs.hamming64(h1, other) > 10


def test_psnr_identity_is_inf():
    img = _tile(16, 16)
    assert codecs.psnr(img, img) == float("inf")
