"""Tile codecs: lossless u16le, lossy u16dct, PSNR, perceptual hash.

The scenes table (BASELINE.json input_hint) carries pixels as an opaque
``bytes: binary`` column with ``fmt`` selecting the codec — decode happens
in-executor inside Arrow kernels (north_star: "scenes are decoded
in-executor"). No image libraries exist in this sandbox, so both codecs are
numpy-only:

- ``u16le``  — raw little-endian uint16, row-major (lossless).
- ``u16dct`` — 8x8 block DCT-II + uniform quantization + zlib (lossy);
  must satisfy the PSNR >= 40 dB per-row invariant (BASELINE.json:15).

``phash`` is a 64-bit DCT perceptual hash (mean-pool to 32x32, 2-D DCT,
top-left 8x8 minus DC, median threshold).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FMT_RAW = "u16le"
FMT_DCT = "u16dct"
FMT_PNG = "png16"  # real-container lossless path: 16-bit grayscale PNG
FMT_BT = "f32bt"   # pixels ARE brightness temperatures in Kelvin (float32 LE)
                   # — the reference's direct t10=/t11= input path; the kernel
                   # skips C2+C3 for these tiles

_MAGIC = b"DCT1"
_BLK = 8
_DEFAULT_Q = 48.0  # uniform quantizer step; PSNR ~= 20*log10(65535/(q/sqrt(12))) >> 40 dB


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (rows = basis vectors)."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x + 1) * k / (2.0 * n))
    m[0] /= np.sqrt(2.0)
    return m


_D8 = _dct_matrix(_BLK)
_D32 = _dct_matrix(32)


def encode_u16le(img: np.ndarray) -> bytes:
    a = np.ascontiguousarray(img.astype("<u2"))
    return a.tobytes()


def decode_u16le(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype="<u2").reshape(h, w).astype(np.float64)


def encode_f32bt(bt: np.ndarray) -> bytes:
    return np.ascontiguousarray(bt.astype("<f4")).tobytes()


def decode_f32bt(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype="<f4").reshape(h, w).astype(np.float64)


def _blockify(img: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(blocks (nby, nbx, 8, 8), padded_h, padded_w) with edge replication."""
    h, w = img.shape
    ph = (h + _BLK - 1) // _BLK * _BLK
    pw = (w + _BLK - 1) // _BLK * _BLK
    p = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = p.reshape(ph // _BLK, _BLK, pw // _BLK, _BLK).transpose(0, 2, 1, 3)
    return blocks, ph, pw


def encode_u16dct(img: np.ndarray, q: float = _DEFAULT_Q) -> bytes:
    h, w = img.shape
    blocks, ph, pw = _blockify(img.astype(np.float64) - 32768.0)
    coef = np.einsum("ij,yxjk,lk->yxil", _D8, blocks, _D8, optimize=True)
    quant = np.round(coef / q).astype(np.int32)
    payload = zlib.compress(quant.astype("<i4").tobytes(), level=6)
    header = _MAGIC + struct.pack("<HHf", w, h, q)
    return header + payload


def decode_u16dct(data: bytes, w: int, h: int) -> np.ndarray:
    if data[:4] != _MAGIC:
        raise ValueError("not a u16dct payload")
    w2, h2, q = struct.unpack("<HHf", data[4:12])
    if (w2, h2) != (w, h):
        raise ValueError(f"size mismatch: header {(w2, h2)} vs row {(w, h)}")
    ph = (h + _BLK - 1) // _BLK * _BLK
    pw = (w + _BLK - 1) // _BLK * _BLK
    quant = np.frombuffer(zlib.decompress(data[12:]), dtype="<i4").reshape(
        ph // _BLK, pw // _BLK, _BLK, _BLK
    ).astype(np.float64)
    blocks = np.einsum("ji,yxjk,kl->yxil", _D8, quant * q, _D8, optimize=True)
    p = blocks.transpose(0, 2, 1, 3).reshape(ph, pw)
    img = np.clip(np.round(p + 32768.0), 0, 65535)
    return img[:h, :w]


# --------------------------------------------------------------------------
# PNG (real container format, pure stdlib zlib + struct + numpy).
# Writer: 16-bit grayscale, Up filter on every scanline. Reader: any
# non-interlaced grayscale PNG (bit depth 8 or 16, all five scanline filter
# types) — round-trip exactness and filter coverage in tests/test_codecs.py.
# Color / palette / Adam7 stay honestly NotImplemented (out of scope for a
# single-band raster table, not silently wrong).
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png16(img: np.ndarray) -> bytes:
    """16-bit grayscale PNG with the Up filter per scanline (vectorized:
    byte-wise uint8 row diff IS the Up filter) — deterministic bytes for a
    given input (fixed zlib level)."""
    a = np.ascontiguousarray(np.asarray(img).astype(">u2"))
    h, w = a.shape
    b = a.view(np.uint8).reshape(h, w * 2)
    filt = np.empty((h, w * 2 + 1), dtype=np.uint8)
    filt[:, 0] = 2  # Up
    filt[0, 1:] = b[0]  # prior scanline of row 0 is all zero -> Up == raw
    filt[1:, 1:] = b[1:] - b[:-1]  # uint8 wraparound == mod-256 difference
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(filt.tobytes(), 6))
            + _png_chunk(b"IEND", b""))


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reconstruct scanlines from filtered bytes -> (h, stride) uint8."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    rl = stride + 1
    for y in range(h):
        ft = raw[y * rl]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * rl + 1).copy()
        if ft == 0:  # None
            rec = line
        elif ft == 2:  # Up
            rec = line + prev
        elif ft == 1:  # Sub: per byte lane, cumulative sum mod 256
            lanes = line.reshape(-1, bpp).astype(np.int64)
            rec = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(-1)
        elif ft == 3:  # Average: left-dependency -> sequential per pixel
            rec = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth: sequential per pixel
            rec = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {ft}")
        out[y] = rec
        prev = rec
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Grayscale PNG -> uint16 (h, w). 8-bit samples widen to uint16."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, ihdr = 8, [], None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if ctype != 0 or depth not in (8, 16):
        raise NotImplementedError(
            f"PNG color type {ctype}/depth {depth}: only grayscale 8/16-bit "
            "single-band rasters are in scope")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    bpp = depth // 8
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    rec = _png_unfilter(raw, h, stride, bpp)
    if depth == 16:
        return rec.reshape(h, w, 2).copy().view(">u2").reshape(h, w).astype(np.uint16)
    return rec.reshape(h, w).astype(np.uint16)


def decode_tile(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Dispatch by the row's fmt column; returns float64 (h, w)."""
    if fmt == FMT_RAW:
        return decode_u16le(data, w, h)
    if fmt == FMT_DCT:
        return decode_u16dct(data, w, h)
    if fmt == FMT_PNG:
        img = decode_png(data)
        if img.shape != (h, w):
            raise ValueError(f"PNG dims {img.shape} != row dims {(h, w)}")
        return img.astype(np.float64)
    if fmt == FMT_BT:
        return decode_f32bt(data, w, h)
    raise NotImplementedError(
        f"fmt={fmt!r}: jpeg/webp etc. need image libs absent from this "
        "container; plumbing is fmt-dispatched so adding one is local"
    )


def decode_tile_dn(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Like decode_tile but keeps lossless tiles as raw uint16 (zero-copy
    frombuffer view) so the BT stage can use the 65536-entry LUT gather in
    kernels.dn_to_bt instead of full-array transcendental math. Lossy tiles
    decode to float64 and take the arithmetic path."""
    if fmt == FMT_RAW:
        return np.frombuffer(data, dtype="<u2").reshape(h, w)
    if fmt == FMT_PNG:
        img = decode_png(data)
        if img.shape != (h, w):
            raise ValueError(f"PNG dims {img.shape} != row dims {(h, w)}")
        return img  # uint16 -> BT LUT fast path
    return decode_tile(data, w, h, fmt)


def encode_tile(img: np.ndarray, fmt: str) -> bytes:
    if fmt == FMT_RAW:
        return encode_u16le(img)
    if fmt == FMT_DCT:
        return encode_u16dct(img)
    if fmt == FMT_PNG:
        return encode_png16(img)
    if fmt == FMT_BT:
        return encode_f32bt(img)
    raise NotImplementedError(f"fmt={fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 65535.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(peak) - 10.0 * np.log10(mse)


def _mean_pool(img: np.ndarray, out: int = 32) -> np.ndarray:
    """Mean-pool to out x out (pads with edge replication to a multiple)."""
    h, w = img.shape
    ph = (h + out - 1) // out * out
    pw = (w + out - 1) // out * out
    p = np.pad(img.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(out, ph // out, out, pw // out).mean(axis=(1, 3))


def phash64(img: np.ndarray) -> int:
    """64-bit DCT perceptual hash, returned as signed int64 (Spark LongType)."""
    small = _mean_pool(img, 32)
    coef = _D32 @ small @ _D32.T
    block = coef[:8, :8].copy()
    vals = block.flatten()[1:]  # drop DC
    med = np.median(vals)
    bits = np.where(vals > med, 1, 0)
    out = 0
    for b in bits:  # 63 bits
        out = (out << 1) | int(b)
    return np.int64(np.uint64(out)).item()


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
