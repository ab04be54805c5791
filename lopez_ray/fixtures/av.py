"""Deterministic video/audio fixture corpus (RAWV/RAWA containers).

Like the image corpus, every row carries encode-time ground truth next
to the encoded payload (sampled-frame phashes/luma for video, PCM
features for audio), so the engine's decode→sample→featurize output is
checkable by a DuckDB read_parquet + unnest oracle: the engine must
recover exactly the stored values by actually parsing the container —
a real round-trip check on the decode seam, not a tautology.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..media.av import (
    audio_features,
    encode_audio,
    encode_video,
    sample_frame_indices,
)
from ..media.phash import phash64

N_SAMPLE = 4  # frames sampled per clip (queries use the same constant)


def _luma(frame: np.ndarray) -> float:
    f = frame.astype(np.float64)
    return float((0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]).mean())


def generate_av(out_dir: str, n_videos: int = 40, n_audios: int = 60, seed: int = 9) -> dict[str, str]:
    """Write videos.parquet / audios.parquet; idempotent per directory."""
    os.makedirs(out_dir, exist_ok=True)
    vid_path = os.path.join(out_dir, "videos.parquet")
    aud_path = os.path.join(out_dir, "audios.parquet")
    if os.path.exists(vid_path) and os.path.exists(aud_path):
        return {"videos": vid_path, "audios": aud_path}

    rng = np.random.default_rng(seed)
    vrows = {
        "video_id": [], "bytes": [], "fmt": [], "w": [], "h": [],
        "n_frames": [], "fps_milli": [], "sampled_idx": [],
        "sampled_ts_ms": [], "sampled_phash": [], "sampled_luma": [],
    }
    for i in range(n_videos):
        w = int(rng.integers(16, 49))
        h = int(rng.integers(16, 49))
        n = int(rng.integers(10, 41))
        fps_milli = int(rng.choice([24000, 25000, 30000]))
        # gradient background drifting per frame + per-frame noise
        yy, xx = np.mgrid[0:h, 0:w]
        base = ((xx * 255 / max(w - 1, 1)) + (yy * 128 / max(h - 1, 1)))[None, :, :]
        drift = np.arange(n)[:, None, None] * 3.0
        noise = rng.integers(0, 32, size=(n, h, w, 3))
        frames = (
            ((base + drift) % 256)[..., None] + noise
        ).astype(np.uint8)
        data = encode_video(frames, fps_milli)
        idx = sample_frame_indices(n, N_SAMPLE)
        vrows["video_id"].append(f"vid{i:04d}")
        vrows["bytes"].append(data)
        vrows["fmt"].append("rawv")
        vrows["w"].append(w)
        vrows["h"].append(h)
        vrows["n_frames"].append(n)
        vrows["fps_milli"].append(fps_milli)
        vrows["sampled_idx"].append([int(j) for j in idx])
        vrows["sampled_ts_ms"].append(
            [round(float(j) * 1_000_000.0 / fps_milli, 3) for j in idx]
        )
        vrows["sampled_phash"].append([phash64(frames[j]) for j in idx])
        vrows["sampled_luma"].append([round(_luma(frames[j]), 4) for j in idx])
    vt = pa.table(
        {
            "video_id": pa.array(vrows["video_id"], pa.string()),
            "bytes": pa.array(vrows["bytes"], pa.large_binary()),
            "fmt": pa.array(vrows["fmt"], pa.string()),
            "w": pa.array(vrows["w"], pa.int32()),
            "h": pa.array(vrows["h"], pa.int32()),
            "n_frames": pa.array(vrows["n_frames"], pa.int32()),
            "fps_milli": pa.array(vrows["fps_milli"], pa.int32()),
            "sampled_idx": pa.array(vrows["sampled_idx"], pa.list_(pa.int64())),
            "sampled_ts_ms": pa.array(vrows["sampled_ts_ms"], pa.list_(pa.float64())),
            "sampled_phash": pa.array(vrows["sampled_phash"], pa.list_(pa.int64())),
            "sampled_luma": pa.array(vrows["sampled_luma"], pa.list_(pa.float64())),
        }
    )

    arows = {
        "audio_id": [], "bytes": [], "fmt": [], "sample_rate": [],
        "n_samples": [], "duration_ms": [], "rms": [], "zcr": [],
        "centroid_hz": [],
    }
    for i in range(n_audios):
        sr = int(rng.choice([8000, 16000]))
        n = int(rng.integers(4000, 16001))
        t = np.arange(n) / sr
        f0 = float(rng.uniform(100, 2000))
        amp = float(rng.uniform(0.2, 0.9))
        sig = amp * np.sin(2 * np.pi * f0 * t)
        sig += rng.normal(0, 0.02, size=n)
        samples = np.clip(sig * 32767, -32768, 32767).astype(np.int16)
        feats = audio_features(samples, sr)  # ground truth FROM the int16
        arows["audio_id"].append(f"aud{i:04d}")
        arows["bytes"].append(encode_audio(samples, sr))
        arows["fmt"].append("rawa")
        arows["sample_rate"].append(sr)
        arows["n_samples"].append(n)
        arows["duration_ms"].append(round(feats["duration_ms"], 3))
        arows["rms"].append(round(feats["rms"], 6))
        arows["zcr"].append(round(feats["zcr"], 6))
        arows["centroid_hz"].append(round(feats["centroid_hz"], 3))
    at = pa.table(
        {
            "audio_id": pa.array(arows["audio_id"], pa.string()),
            "bytes": pa.array(arows["bytes"], pa.large_binary()),
            "fmt": pa.array(arows["fmt"], pa.string()),
            "sample_rate": pa.array(arows["sample_rate"], pa.int32()),
            "n_samples": pa.array(arows["n_samples"], pa.int32()),
            "duration_ms": pa.array(arows["duration_ms"], pa.float64()),
            "rms": pa.array(arows["rms"], pa.float64()),
            "zcr": pa.array(arows["zcr"], pa.float64()),
            "centroid_hz": pa.array(arows["centroid_hz"], pa.float64()),
        }
    )
    for path, t_ in ((vid_path, vt), (aud_path, at)):
        tmp = path + ".tmp"
        pq.write_table(t_, tmp)
        os.replace(tmp, path)
    return {"videos": vid_path, "audios": aud_path}
