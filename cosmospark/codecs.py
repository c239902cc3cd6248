"""From-scratch numpy image codecs + perceptual hash.

The environment has no PIL/libjpeg, so the image payload column is
handled by two deterministic numpy codecs (BASELINE.json input_hint:
decoded-pixel allclose, PSNR ≥ 40 dB for lossy, caption equality):

* ``raw``   — lossless: magic + dims + packed uint8 RGB.
* ``lossy`` — 8x8 block DCT-II with flat quantization (JPEG-shaped but
  minimal); quality step chosen so PSNR stays ≥ 40 dB.

Plus ``phash64`` (DCT perceptual hash) and ``psnr``. All functions are
pure numpy and run vectorized inside Arrow batches (mapInPandas).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC_RAW = b"CSR1"
_MAGIC_LOSSY = b"CSL1"
_Q = 2.0  # flat quantization step; max per-coeff error _Q/2 → PSNR >> 40 dB


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0, :] = np.sqrt(1.0 / n)
    return m


_D8 = _dct_matrix(8)
_D32 = _dct_matrix(32)


def encode_raw(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return _MAGIC_RAW + struct.pack("<HH", h, w) + arr.tobytes()


def _pad8(arr: np.ndarray) -> np.ndarray:
    h, w = arr.shape
    ph, pw = (-h) % 8, (-w) % 8
    return np.pad(arr, ((0, ph), (0, pw)), mode="edge")


def _blocks(a: np.ndarray) -> np.ndarray:
    """(H, W) → (H//8, W//8, 8, 8) view-reshape."""
    h, w = a.shape
    return a.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _unblocks(b: np.ndarray) -> np.ndarray:
    nh, nw = b.shape[0], b.shape[1]
    return b.transpose(0, 2, 1, 3).reshape(nh * 8, nw * 8)


def encode_lossy(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    out = [_MAGIC_LOSSY, struct.pack("<HH", h, w)]
    for ch in range(3):
        a = _pad8(arr[:, :, ch].astype(np.float64) - 128.0)
        blk = _blocks(a)
        coef = np.einsum("ij,abjk,lk->abil", _D8, blk, _D8)
        q = np.round(coef / _Q).astype(np.int16)
        out.append(q.tobytes())
    return b"".join(out)


def decode(blob: bytes) -> np.ndarray:
    magic = blob[:4]
    h, w = struct.unpack("<HH", blob[4:8])
    if magic == _MAGIC_RAW:
        return np.frombuffer(blob[8:], dtype=np.uint8).reshape(h, w, 3).copy()
    if magic == _MAGIC_LOSSY:
        ph, pw = h + ((-h) % 8), w + ((-w) % 8)
        n = (ph // 8) * (pw // 8) * 64
        chans = []
        off = 8
        for _ in range(3):
            q = np.frombuffer(blob[off : off + n * 2], dtype=np.int16).astype(np.float64)
            off += n * 2
            coef = (q * _Q).reshape(ph // 8, pw // 8, 8, 8)
            blk = np.einsum("ji,abjk,kl->abil", _D8, coef, _D8)
            a = _unblocks(blk)[:h, :w] + 128.0
            chans.append(np.clip(np.round(a), 0, 255).astype(np.uint8))
        return np.stack(chans, axis=-1)
    raise ValueError(f"unknown codec magic {magic!r}")


def encode(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return encode_raw(arr)
    if fmt == "lossy":
        return encode_lossy(arr)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def _resize_nn(gray: np.ndarray, n: int = 32) -> np.ndarray:
    h, w = gray.shape
    yi = (np.arange(n) * h // n).clip(0, h - 1)
    xi = (np.arange(n) * w // n).clip(0, w - 1)
    return gray[np.ix_(yi, xi)]


def phash64(arr: np.ndarray) -> int:
    """DCT perceptual hash: gray → 32x32 → DCT → top-left 8x8 (minus DC)
    thresholded at the median → 64-bit int (signed, Spark LongType)."""
    gray = arr.astype(np.float64).mean(axis=2)
    g = _resize_nn(gray, 32)
    coef = _D32 @ g @ _D32.T
    block = coef[:8, :8].copy().ravel()
    med = np.median(block[1:])
    bits = (block > med).astype(np.uint64)
    val = np.uint64(0)
    for i, b in enumerate(bits):
        val |= np.uint64(b) << np.uint64(i)
    return int(val.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
