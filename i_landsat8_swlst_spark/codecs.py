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


def decode_tile(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Dispatch by the row's fmt column; returns float64 (h, w)."""
    if fmt == FMT_RAW:
        return decode_u16le(data, w, h)
    if fmt == FMT_DCT:
        return decode_u16dct(data, w, h)
    raise NotImplementedError(
        f"fmt={fmt!r}: real image codecs (png/jpeg) need image libs absent from "
        "this container; plumbing is fmt-dispatched so adding one is local"
    )


def decode_tile_dn(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Like decode_tile but keeps lossless tiles as raw uint16 (zero-copy
    frombuffer view) so the BT stage can use the 65536-entry LUT gather in
    kernels.dn_to_bt instead of full-array transcendental math. Lossy tiles
    decode to float64 and take the arithmetic path."""
    if fmt == FMT_RAW:
        return np.frombuffer(data, dtype="<u2").reshape(h, w)
    return decode_tile(data, w, h, fmt)


def encode_tile(img: np.ndarray, fmt: str) -> bytes:
    if fmt == FMT_RAW:
        return encode_u16le(img)
    if fmt == FMT_DCT:
        return encode_u16dct(img)
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
