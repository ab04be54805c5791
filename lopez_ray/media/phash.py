"""64-bit DCT perceptual hash over decoded pixels (the corpus ``phash``
column). Classic pHash construction: grayscale → 32x32 block-mean resize →
2-D DCT → top-left 8x8 coefficients (minus DC) → bits = coeff > median.
Deterministic; vectorized with numpy."""

from __future__ import annotations

import numpy as np

_N = 32


def _dct_matrix(n: int) -> np.ndarray:
    m = np.zeros((n, n))
    for k in range(n):
        for i in range(n):
            m[k, i] = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m *= np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(_N)


def _to_gray(img: np.ndarray) -> np.ndarray:
    if img.ndim == 3:
        return (
            0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
        ).astype(np.float64)
    return img.astype(np.float64)


def _resize_mean(gray: np.ndarray, n: int = _N) -> np.ndarray:
    """Area-average resize to n x n using bucketed means (deterministic)."""
    h, w = gray.shape
    ys = (np.arange(h) * n) // h
    xs = (np.arange(w) * n) // w
    out = np.zeros((n, n))
    counts = np.zeros((n, n))
    np.add.at(out, (ys[:, None], xs[None, :]), gray)
    np.add.at(counts, (ys[:, None], xs[None, :]), 1.0)
    counts[counts == 0] = 1.0
    return out / counts


def phash64(img: np.ndarray) -> int:
    """Signed 64-bit perceptual hash (matches the corpus' int64 column)."""
    small = _resize_mean(_to_gray(img))
    coef = _DCT32 @ small @ _DCT32.T
    block = coef[:8, :8].flatten()
    med = np.median(block[1:])  # exclude DC
    bits = 0
    for i, v in enumerate(block):
        if i == 0:
            continue
        if v > med:
            bits |= 1 << (i - 1)
    # 63 data bits; bit 63 stays 0 → value fits i64 non-negative range.
    return int(bits)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def phash_batch(images) -> np.ndarray:
    return np.array([phash64(im) for im in images], dtype=np.int64)
