"""Codec + phash + fixtures tests: the per-row invariant machinery
(decoded-pixel allclose / PSNR >= 40 dB lossy, caption equality)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lopez_ray.media.codecs import decode, encode, ljpg_decode, ljpg_encode, png_decode, png_encode, psnr
from lopez_ray.media.phash import hamming64, phash64


def _img(seed=7, h=48, w=37):
    r = np.random.default_rng(seed)
    return r.integers(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)


def _smooth(seed=3, h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for c in range(3):
        img[:, :, c] = 128 + 100 * np.sin(xx / 10 + c) * np.cos(yy / 7)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_png_roundtrip_lossless():
    img = _img()
    assert np.array_equal(png_decode(png_encode(img)), img)
    gray = _img()[:, :, 0]
    assert np.array_equal(png_decode(png_encode(gray)), gray)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_ljpg_lossy_but_over_40db():
    img = _smooth()
    data = ljpg_encode(img, quality=92)
    out = ljpg_decode(data)
    assert out.shape == img.shape
    p = psnr(img, out)
    assert 40.0 <= p < float("inf")  # genuinely lossy, above the gate
    assert not np.array_equal(out, img)


def test_ljpg_quality_controls_loss():
    img = _smooth()
    p_low = psnr(img, ljpg_decode(ljpg_encode(img, quality=30)))
    p_high = psnr(img, ljpg_decode(ljpg_encode(img, quality=95)))
    assert p_high > p_low


def test_unknown_format_stubbed():
    with pytest.raises(NotImplementedError):
        encode(_img(), "webp")
    with pytest.raises(NotImplementedError):
        decode(b"x", "avif")


def test_phash_properties():
    a = _smooth()
    assert phash64(a) == phash64(a)  # deterministic
    # small noise → small hamming distance; different image → large
    noisy = np.clip(a.astype(int) + np.random.default_rng(1).integers(-4, 5, a.shape), 0, 255).astype(np.uint8)
    other = _img(seed=99)
    assert hamming64(phash64(a), phash64(noisy)) <= 8
    assert hamming64(phash64(a), phash64(other)) > 12
    assert -(2**63) <= phash64(a) < 2**63


def test_fixtures_deterministic(tmp_path):
    from lopez_ray.fixtures.gen import generate, render_page

    p1 = generate(str(tmp_path / "a"), tier="t1", seed=42)
    p2 = generate(str(tmp_path / "b"), tier="t1", seed=42)
    web1 = pq.read_table(p1["web"])
    web2 = pq.read_table(p2["web"])
    assert web1.equals(web2)
    corpus = pq.read_table(p1["corpus"])
    assert corpus.num_rows > 100
    # per-row invariant: decode → PSNR (jpeg) / exact (png), phash matches
    rows = corpus.to_pylist()[:40]
    for row in rows:
        img = decode(row["bytes"], row["fmt"])
        assert img.shape[0] == row["h"] and img.shape[1] == row["w"]
        assert phash64(img) == row["phash"]
        assert row["caption"].startswith("caption ")
    # cached second call returns same paths without regen
    assert generate(str(tmp_path / "a"), tier="t1", seed=42) == p1
    html = render_page("https://host0.test/p/0", ["/p/1"], None, "caption x", "https://host0.test/p/0")
    assert "<a href=\"/p/1\">" in html


def test_av_container_roundtrip():
    """RAWV/RAWA encode→decode is exact; unknown formats raise at the
    decode seam (the honest codec stub boundary)."""
    import numpy as np
    import pytest

    from lopez_ray.media.av import (
        decode_audio, decode_video, encode_audio, encode_video,
        sample_frame_indices,
    )

    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(7, 12, 10, 3)).astype(np.uint8)
    dec, fps = decode_video(encode_video(frames, 24000), "rawv")
    assert fps == 24000 and np.array_equal(dec, frames)
    samples = rng.integers(-30000, 30000, size=5000).astype(np.int16)
    ds, sr = decode_audio(encode_audio(samples, 8000), "rawa")
    assert sr == 8000 and np.array_equal(ds, samples)
    with pytest.raises(NotImplementedError):
        decode_video(b"anything", "h264")
    with pytest.raises(NotImplementedError):
        decode_audio(b"anything", "mp3")
    # uniform sampling: endpoints included, sorted, bounded
    idx = sample_frame_indices(30, 4)
    assert idx[0] == 0 and idx[-1] == 29 and len(idx) == 4
    assert list(sample_frame_indices(2, 4)) == [0, 1]


def test_av_stages_drop_undecodable(ray_session):
    """Non-strict stages skip undecodable rows; strict raises through."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from lopez_ray.media.av import encode_video
    from lopez_ray.stages.av import FrameSampleStage

    frames = np.zeros((5, 8, 8, 3), dtype=np.uint8)
    t = pa.table(
        {
            "video_id": pa.array(["ok", "bad"]),
            "bytes": pa.array([encode_video(frames, 25000), b"xx"], pa.large_binary()),
            "fmt": pa.array(["rawv", "h264"]),
        }
    )
    out = FrameSampleStage(n_sample=2)(t)
    assert set(out["video_id"].to_pylist()) == {"ok"}
    with pytest.raises(NotImplementedError):
        FrameSampleStage(n_sample=2, strict=True)(t)
