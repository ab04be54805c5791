"""Image codecs for the (image_id, bytes, w, h, fmt, caption, phash) corpus.

The environment has no image libraries (no PIL), so we implement the two
formats the corpus uses from scratch, deterministically:

- ``fmt="png"`` — a real, spec-conformant PNG subset: 8-bit grayscale or
  RGB, zlib-compressed scanlines, filters 0-4 supported on decode
  (encoder emits filter 0). Lossless: decode(encode(x)) == x.
- ``fmt="jpeg"`` — the corpus' *lossy* format. Real JPEG entropy coding is
  out of scope without a library, so this is a compact DCT-based lossy
  codec with JPEG-style 8x8 block DCT + luminance quantization ("LJPG"
  container). It has genuine, quality-controlled loss, which is what the
  per-row invariant exercises: decoded-pixel PSNR >= 40 dB vs the original
  (BASELINE.json input_hint / north rule). The decoder is the real inverse
  transform, not a passthrough.

All functions operate on numpy uint8 arrays of shape (h, w) or (h, w, 3).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        raw = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
        raw = img
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), raw.reshape(h, w * channels)], axis=1
    )
    idat = zlib.compress(scanlines.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(data: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    rows = data.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = rows[y, 0]
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            line = cur
        elif ftype == 2:  # Up
            line = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):
            line = np.zeros(stride, np.int32)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = line.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in (0, 2) or interlace:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    channels = 3 if color_type == 2 else 1
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    out = _unfilter(raw, h, w * channels, channels)
    return out.reshape(h, w, 3) if channels == 3 else out.reshape(h, w)


# ---------------------------------------------------------------------------
# "LJPG" — DCT-based lossy codec (the corpus' fmt="jpeg")
# ---------------------------------------------------------------------------

_LJPG_MAGIC = b"LJPG"

# Standard JPEG luminance quantization table.
_QTABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)


def _dct_matrix() -> np.ndarray:
    n = 8
    m = np.zeros((n, n))
    for k in range(n):
        for i in range(n):
            m[k, i] = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m *= np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT = _dct_matrix()


def _quality_scale(quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((_QTABLE * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _blocks(chan: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = chan.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(chan, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
    hh, ww = padded.shape
    b = padded.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    return b, hh, ww


def ljpg_encode(img: np.ndarray, quality: int = 90) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, channels = img.shape
    q = _quality_scale(quality)
    payload = []
    for c in range(channels):
        blocks, hh, ww = _blocks(img[:, :, c])
        # 2-D DCT on every 8x8 block at once: D @ B @ D.T (stacked
        # matmul — ~15× faster than the equivalent einsum contraction)
        coef = np.matmul(np.matmul(_DCT, blocks), _DCT.T)
        quant = np.round(coef / q).astype(np.int16)
        payload.append(quant.tobytes())
    body = zlib.compress(b"".join(payload), 6)
    header = _LJPG_MAGIC + struct.pack(">HHBB", w, h, channels, quality)
    return header + body


def ljpg_decode(data: bytes) -> np.ndarray:
    if data[:4] != _LJPG_MAGIC:
        raise ValueError("not an LJPG")
    w, h, channels, quality = struct.unpack_from(">HHBB", data, 4)
    q = _quality_scale(quality)
    raw = np.frombuffer(zlib.decompress(data[10:]), dtype=np.int16)
    hh, ww = h + (-h % 8), w + (-w % 8)
    per_chan = (hh // 8) * (ww // 8) * 64
    out = np.zeros((h, w, channels), dtype=np.uint8)
    for c in range(channels):
        quant = raw[c * per_chan : (c + 1) * per_chan].reshape(
            hh // 8, ww // 8, 8, 8
        ).astype(np.float64)
        coef = quant * q
        blocks = np.matmul(_DCT.T, np.matmul(coef, _DCT))  # D.T @ C @ D
        chan = blocks.transpose(0, 2, 1, 3).reshape(hh, ww) + 128.0
        out[:, :, c] = np.clip(np.round(chan[:h, :w]), 0, 255).astype(np.uint8)
    return out[:, :, 0] if channels == 1 else out


def encode(img: np.ndarray, fmt: str, quality: int = 90) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt == "jpeg":
        return ljpg_encode(img, quality)
    raise NotImplementedError(f"format {fmt!r} (decode stubs only in this sandbox)")


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "jpeg":
        return ljpg_decode(data)
    raise NotImplementedError(f"format {fmt!r} (decode stubs only in this sandbox)")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
