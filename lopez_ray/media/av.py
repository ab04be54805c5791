"""Raw video/audio containers for the AV pipeline stages.

Real-world codecs (h264, mp3, …) are not available in this container,
so — like the image path's PNG/LJPG — the DECODE SEAM is the boundary:
``decode_video``/``decode_audio`` handle the deterministic raw container
formats below and raise NotImplementedError for everything else, while
all the Ray-side plumbing (schemas, actor pools, frame sampling, DSP
features) is real and tested.

RAWV container: b"RAWV" | u32 w | u32 h | u32 n_frames | u32 fps_milli
               | n_frames × (h*w*3 u8 RGB planes, frame-major)
RAWA container: b"RAWA" | u32 sample_rate | u32 n_samples
               | n_samples × i16 LE mono PCM
"""

from __future__ import annotations

import struct

import numpy as np

_V_MAGIC = b"RAWV"
_A_MAGIC = b"RAWA"


def encode_video(frames: np.ndarray, fps_milli: int = 25000) -> bytes:
    """frames: (n, h, w, 3) uint8."""
    n, h, w, _ = frames.shape
    return (
        _V_MAGIC
        + struct.pack("<IIII", w, h, n, fps_milli)
        + frames.astype(np.uint8).tobytes()
    )


def decode_video(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """→ ((n, h, w, 3) uint8 frames, fps_milli). NotImplementedError for
    formats this sandbox has no codec for (the honest stub seam)."""
    if fmt != "rawv":
        raise NotImplementedError(f"video format {fmt!r} (raw container only in this sandbox)")
    if data[:4] != _V_MAGIC:
        raise ValueError("bad RAWV header")
    w, h, n, fps_milli = struct.unpack("<IIII", data[4:20])
    frames = np.frombuffer(data, dtype=np.uint8, offset=20).reshape(n, h, w, 3)
    return frames, fps_milli


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """samples: (n,) int16 mono PCM."""
    return (
        _A_MAGIC
        + struct.pack("<II", sample_rate, len(samples))
        + samples.astype("<i2").tobytes()
    )


def decode_audio(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """→ ((n,) int16 samples, sample_rate)."""
    if fmt != "rawa":
        raise NotImplementedError(f"audio format {fmt!r} (raw container only in this sandbox)")
    if data[:4] != _A_MAGIC:
        raise ValueError("bad RAWA header")
    sample_rate, n = struct.unpack("<II", data[4:12])
    samples = np.frombuffer(data, dtype="<i2", offset=12)[:n]
    return samples, sample_rate


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Vectorized PCM features: duration, RMS (of the [-1,1]-normalized
    signal), zero-crossing rate, spectral centroid (Hz via rfft)."""
    x = samples.astype(np.float64) / 32768.0
    n = len(x)
    if n == 0:
        return {"duration_ms": 0.0, "rms": 0.0, "zcr": 0.0, "centroid_hz": 0.0}
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    denom = mag.sum()
    centroid = float((freqs * mag).sum() / denom) if denom > 0 else 0.0
    return {
        "duration_ms": n * 1000.0 / sample_rate,
        "rms": rms,
        "zcr": zcr,
        "centroid_hz": centroid,
    }


def sample_frame_indices(n_frames: int, n_sample: int) -> np.ndarray:
    """Uniform temporal sampling: n_sample indices spread over the clip
    (first and last frame always included when n_sample > 1)."""
    k = min(n_sample, n_frames)
    if k <= 1:
        return np.array([0], dtype=np.int64) if n_frames else np.array([], dtype=np.int64)
    return np.unique(np.round(np.linspace(0, n_frames - 1, k)).astype(np.int64))
