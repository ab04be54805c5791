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
