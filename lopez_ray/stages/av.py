"""Video frame-sampling and audio feature-extraction stages.

Actor-pool ``map_batches`` stages over opaque binary payload columns
with typed metadata — the multimodal pattern from the brief, applied to
AV. Small batches (rows carry whole clips), payload columns dropped from
the output, decode seam stubbed for real-world codecs
(``media/av.py::decode_video/decode_audio`` raise NotImplementedError
for anything but the deterministic RAWV/RAWA containers).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..media.av import audio_features, decode_audio, decode_video, sample_frame_indices
from ..media.phash import phash64


def _luma(frame: np.ndarray) -> float:
    f = frame.astype(np.float64)
    return float((0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]).mean())


class FrameSampleStage:
    """One input row per clip → one output row per SAMPLED frame
    (video_id, frame_idx, ts_ms, phash, mean_luma). Uniform temporal
    sampling; per-frame decode is inherent to the workload, everything
    around it is batched."""

    def __init__(self, n_sample: int = 4, strict: bool = False):
        self.n_sample = n_sample
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["video_id"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        out = {"video_id": [], "frame_idx": [], "ts_ms": [], "phash": [], "mean_luma": []}
        for vid, data, fmt in zip(ids, payloads, fmts):
            try:
                frames, fps_milli = decode_video(data, fmt)
            except NotImplementedError:
                if self.strict:
                    raise
                continue  # undecodable format: dropped, not fatal
            for j in sample_frame_indices(len(frames), self.n_sample):
                out["video_id"].append(vid)
                out["frame_idx"].append(int(j))
                out["ts_ms"].append(round(float(j) * 1_000_000.0 / fps_milli, 3))
                out["phash"].append(phash64(frames[j]))
                out["mean_luma"].append(round(_luma(frames[j]), 4))
        return pa.table(
            {
                "video_id": pa.array(out["video_id"], pa.string()),
                "frame_idx": pa.array(out["frame_idx"], pa.int64()),
                "ts_ms": pa.array(out["ts_ms"], pa.float64()),
                "phash": pa.array(out["phash"], pa.int64()),
                "mean_luma": pa.array(out["mean_luma"], pa.float64()),
            }
        )


class AudioFeatureStage:
    """One row per clip → (audio_id, duration_ms, rms, zcr, centroid_hz);
    vectorized numpy DSP per clip."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["audio_id"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        out = {"audio_id": [], "duration_ms": [], "rms": [], "zcr": [], "centroid_hz": []}
        for aid, data, fmt in zip(ids, payloads, fmts):
            try:
                samples, sr = decode_audio(data, fmt)
            except NotImplementedError:
                if self.strict:
                    raise
                continue
            f = audio_features(samples, sr)
            out["audio_id"].append(aid)
            out["duration_ms"].append(round(f["duration_ms"], 3))
            out["rms"].append(round(f["rms"], 6))
            out["zcr"].append(round(f["zcr"], 6))
            out["centroid_hz"].append(round(f["centroid_hz"], 3))
        return pa.table(
            {
                "audio_id": pa.array(out["audio_id"], pa.string()),
                "duration_ms": pa.array(out["duration_ms"], pa.float64()),
                "rms": pa.array(out["rms"], pa.float64()),
                "zcr": pa.array(out["zcr"], pa.float64()),
                "centroid_hz": pa.array(out["centroid_hz"], pa.float64()),
            }
        )


def video_pipeline(ds, n_sample: int = 4, batch_size: int = 8, concurrency=(1, 4)):
    """Frame sampling as an actor pool; small batches because rows carry
    whole encoded clips."""
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"n_sample": n_sample},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )


def audio_pipeline(ds, batch_size: int = 16, concurrency=(1, 4)):
    return ds.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
