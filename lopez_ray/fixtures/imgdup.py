"""Planted image-duplicate fixture in the BASELINE.json input_hint
shape: (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64).

Deterministic synthetic corpus for the ``image_dedup`` query — the
image-payload counterpart of the text dedup family. Base images come
from the same sinusoid+noise generator as the crawl corpus fixture; on
top of the base set we plant:

- EXACT duplicates (identical bytes under a new image_id) — hamming 0
  pairs by construction;
- NEAR duplicates (small deterministic pixel perturbation of a base
  image, re-encoded with the same codec) — usually a few phash bits
  apart, occasionally farther, which is the point: the engine's banded
  pair search is EXACT at the hamming threshold, and the DuckDB oracle
  recomputes the same threshold from the stored phash column, so the
  fixture only has to produce a healthy mix of in- and out-of-threshold
  pairs, not control them.

``phash`` is computed from the encode→decode round trip (exactly like
fixtures/gen.py) so an engine that decodes ``bytes`` and recomputes the
perceptual hash reproduces the stored column bit-for-bit.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..media.codecs import decode, encode
from ..media.phash import phash64
from .gen import _caption, _image, _rng

DEFAULT_DIR = "/tmp/lopez_ray_fixtures/imgdup"

N_BASE = 600
EXACT_FRAC = 0.05
NEAR_FRAC = 0.08


def generate_image_dups(
    out_dir: str = DEFAULT_DIR, n_base: int = N_BASE, seed: int = 11
) -> dict[str, str]:
    """Generate (or reuse cached) planted-dup image corpus. Returns
    {"corpus": path}."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, "manifest.json")
    path = os.path.join(out_dir, "corpus.parquet")
    want = {"n_base": n_base, "seed": seed, "version": 1}
    if os.path.exists(manifest):
        try:
            with open(manifest) as f:
                if json.load(f) == want and os.path.exists(path):
                    return {"corpus": path}
        except (json.JSONDecodeError, OSError):
            pass

    rows: dict[str, list] = {
        k: []
        for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    }

    def add(image_id: str, data: bytes, fmt: str, caption: str) -> None:
        img = decode(data, fmt)
        rows["image_id"].append(image_id)
        rows["bytes"].append(data)
        rows["w"].append(img.shape[1])
        rows["h"].append(img.shape[0])
        rows["fmt"].append(fmt)
        rows["caption"].append(caption)
        rows["phash"].append(phash64(img))

    master = _rng(seed, "imgdup-plan")
    encoded: list[tuple[str, bytes, str, np.ndarray]] = []
    for i in range(n_base):
        # seed scope distinct from the crawl fixture's (seed, "image", i)
        img, fmt = _image(seed * 1_000_003 + 17, i)
        data = encode(img, fmt, quality=92)
        cap = _caption(seed, i)
        add(f"img://{i:06d}", data, fmt, cap)
        encoded.append((f"img://{i:06d}", data, fmt, img))

    n_exact = int(n_base * EXACT_FRAC)
    n_near = int(n_base * NEAR_FRAC)
    exact_src = master.choice(n_base, size=n_exact, replace=False)
    near_src = master.choice(n_base, size=n_near, replace=False)

    for j, si in enumerate(exact_src):
        src_id, data, fmt, _img = encoded[si]
        add(f"{src_id}/copy{j}", data, fmt, _caption(seed, int(si)))

    for j, si in enumerate(near_src):
        src_id, _data, fmt, img = encoded[si]
        r = _rng(seed, "perturb", j)
        # small brightness shift + sparse pixel noise: perceptually the
        # same image, so most phash bits survive re-encoding
        pert = img.astype(np.int16) + int(r.integers(-4, 5))
        mask = r.random(img.shape[:2]) < 0.01
        pert[mask] += r.integers(-20, 21, size=(int(mask.sum()), 1))
        pert = np.clip(pert, 0, 255).astype(np.uint8)
        add(f"{src_id}/near{j}", encode(pert, fmt, quality=92), fmt,
            _caption(seed, int(si)))

    table = pa.table(
        {
            "image_id": pa.array(rows["image_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "w": pa.array(rows["w"], pa.int32()),
            "h": pa.array(rows["h"], pa.int32()),
            "fmt": pa.array(rows["fmt"], pa.string()),
            "caption": pa.array(rows["caption"], pa.string()),
            "phash": pa.array(rows["phash"], pa.int64()),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.rename(tmp, path)
    with open(manifest, "w") as f:
        json.dump(want, f)
    return {"corpus": path}
