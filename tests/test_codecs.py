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


# --------------------------------------------------------------------------
# PNG codec (pure-stdlib real container format)
# --------------------------------------------------------------------------


def _png_filter_forward(img16, ftypes):
    """Independent forward-filter implementation (test-side oracle): builds
    PNG bytes from known pixels with a chosen filter type per scanline."""
    import struct
    import zlib

    a = np.ascontiguousarray(img16.astype(">u2"))
    h, w = a.shape
    b = a.view(np.uint8).reshape(h, w * 2).astype(np.int64)
    bpp = 2
    out = bytearray()
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        out.append(ft)
        prev = b[y - 1] if y else np.zeros(w * 2, dtype=np.int64)
        rec = b[y]
        for i in range(w * 2):
            left = rec[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            out.append(int((rec[i] - pred) & 0xFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out))) + chunk(b"IEND", b""))


def test_png16_roundtrip_exact():
    rng = np.random.default_rng(7)
    for shape in ((16, 16), (33, 17), (128, 128)):
        img = rng.integers(0, 65536, shape).astype(np.uint16)
        data = codecs.encode_png16(img)
        back = codecs.decode_png(data)
        np.testing.assert_array_equal(back, img)
        assert back.dtype == np.uint16


def test_png_all_filter_types_decode():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 65536, (10, 13)).astype(np.uint16)
    # one PNG per filter type, plus one cycling through all five
    for ftypes in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        data = _png_filter_forward(img, ftypes)
        np.testing.assert_array_equal(codecs.decode_png(data), img)


def test_png_dispatch_and_lut_path():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 65536, (32, 32)).astype(np.uint16)
    data = codecs.encode_tile(img, codecs.FMT_PNG)
    dn = codecs.decode_tile_dn(data, 32, 32, codecs.FMT_PNG)
    assert dn.dtype == np.uint16  # keeps the BT LUT gather fast path
    np.testing.assert_array_equal(dn, img)
    f = codecs.decode_tile(data, 32, 32, codecs.FMT_PNG)
    assert f.dtype == np.float64
    np.testing.assert_array_equal(f, img.astype(np.float64))
    # lossless: PSNR infinite
    assert codecs.psnr(f, img.astype(np.float64)) == float("inf")


def test_png_rejects_out_of_scope_honestly():
    import struct
    import zlib as _z

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", _z.crc32(tag + payload) & 0xFFFFFFFF))

    rgb = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)))
    with pytest.raises(NotImplementedError):
        codecs.decode_png(rgb)
    interlaced = (b"\x89PNG\r\n\x1a\n"
                  + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 1)))
    with pytest.raises(NotImplementedError):
        codecs.decode_png(interlaced)
    with pytest.raises(ValueError):
        codecs.decode_png(b"not a png at all")
