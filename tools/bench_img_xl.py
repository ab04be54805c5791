#!/usr/bin/env python
"""100k-image perceptual-dedup bench tier — the IMAGE payload's scale
evidence, parallel to tools/bench_dedup_xl.py for text.

Corpus: deterministic synthetic images in the BASELINE.json input_hint
shape (image_id, bytes, w, h, fmt, caption, phash), generated in
parallel seeded Ray tasks (no external data): ~87% unique
sinusoid+noise images (8-64 px), 5% exact byte copies, 8% perturbed
near-dups — plus ONE planted HOT cluster (COPIES_HOT exact copies of a
single image) so the banded pair search's identical-signature and
hot-bucket paths are exercised at scale, the way a real crawl's
boilerplate logo/placeholder images would.

Timed stages (32 CPUs default):
- decode+phash signature pass (the per-image compute wall)
- image_dedup pairs   (banded hamming <= 6 over recomputed phash)
- image_dedup_keep    (pairs -> connected components -> keeper set)
- image_exact_dedup   (byte-identical payload groups, no decode)
- image_keep_best     (max-px keeper per cluster; count + size-sum
                       asserted equal to image_dedup_keep's)

Prints ONE JSON line:
  {"metric": "img-xl pipelines wall (N images, excl. gen)", ...,
   "stages": {...}, "rows": {...}, "num_cpus": C}

Usage: python tools/bench_img_xl.py [--images 100000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

EXACT_FRAC = 0.05
NEAR_FRAC = 0.08
COPIES_HOT = 2000
BLOCK = 2000


def gen_corpus(out_dir: str, n_images: int, hot_copies: int = COPIES_HOT) -> str:
    """Seeded parallel generation → <out_dir>/corpus.parquet (dir)."""
    import ray.data as rd

    from lopez_ray.fixtures.gen import _caption, _image
    from lopez_ray.media.codecs import decode, encode
    from lopez_ray.media.phash import phash64

    path = os.path.join(out_dir, "corpus.parquet")
    done = os.path.join(out_dir, f"_DONE_{n_images}_{hot_copies}")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    n_hot = min(hot_copies, n_images // 2)
    n_rest = n_images - n_hot
    n_unique = int(n_rest * (1 - EXACT_FRAC - NEAR_FRAC))
    n_exact = int(n_rest * EXACT_FRAC)
    n_blocks = (n_images + BLOCK - 1) // BLOCK
    seed = 23

    def make(batch: pa.Table) -> pa.Table:
        b = int(batch["id"][0].as_py())
        lo, hi = b * BLOCK, min((b + 1) * BLOCK, n_images)
        rows: dict[str, list] = {
            k: []
            for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
        }

        def emit(image_id: str, data: bytes, fmt: str, cap: str) -> None:
            img = decode(data, fmt)
            rows["image_id"].append(image_id)
            rows["bytes"].append(data)
            rows["w"].append(img.shape[1])
            rows["h"].append(img.shape[0])
            rows["fmt"].append(fmt)
            rows["caption"].append(cap)
            rows["phash"].append(phash64(img))

        def base_bytes(src: int) -> tuple[bytes, str]:
            img, fmt = _image(seed, src)
            return encode(img, fmt, quality=92), fmt

        for i in range(lo, hi):
            if i < n_unique:
                data, fmt = base_bytes(i)
                emit(f"img://{i:08d}", data, fmt, _caption(seed, i))
            elif i < n_unique + n_exact:
                src = i - n_unique
                data, fmt = base_bytes(src)
                emit(f"img://{src:08d}/copy", data, fmt, _caption(seed, src))
            elif i < n_rest:
                src = i - n_unique - n_exact
                img, fmt = _image(seed, src)
                r = np.random.default_rng(7_000_000 + i)
                pert = img.astype(np.int16) + int(r.integers(-4, 5))
                mask = r.random(img.shape[:2]) < 0.01
                pert[mask] += r.integers(-20, 21, size=(int(mask.sum()), 1))
                pert = np.clip(pert, 0, 255).astype(np.uint8)
                emit(
                    f"img://{src:08d}/near{i}",
                    encode(pert, fmt, quality=92),
                    fmt,
                    _caption(seed, src),
                )
            else:
                # hot cluster: exact copies of base image 0
                data, fmt = base_bytes(0)
                emit(f"img://hot/{i:08d}", data, fmt, _caption(seed, 0))
        return pa.table(
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

    ds = rd.range(n_blocks).repartition(n_blocks).map_batches(
        make, batch_format="pyarrow"
    )
    tmp = os.path.join(out_dir, "corpus_parts")
    if os.path.exists(tmp):  # stale parts from a crashed earlier gen
        import shutil

        shutil.rmtree(tmp)
    ds.write_parquet(tmp)
    if os.path.exists(path) and os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    os.rename(tmp, path)
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=100_000)
    ap.add_argument("--hamming", type=int, default=6)
    ap.add_argument("--hot-copies", type=int, default=COPIES_HOT)
    ap.add_argument(
        "--keepers-only",
        action="store_true",
        help="skip the all-pairs image_dedup stage (its output is "
        "quadratic in clique size BY CONTRACT; the keeper paths "
        "collapse identical signatures to star edges and stay O(m) — "
        "use with --hot-copies 100000 for the mega-clique tier)",
    )
    ap.add_argument(
        "--cpus",
        type=int,
        default=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    )
    args = ap.parse_args()

    import ray

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data as rd

    from lopez_ray.stages.multimodal import (
        image_dedup_keep,
        image_near_dups,
        image_phash_sigs,
    )

    out_dir = f"/tmp/lopez_ray_img_xl_{args.images}_{args.hot_copies}"
    stages: dict[str, float] = {}
    rows: dict[str, int] = {}

    t0 = time.perf_counter()
    gen_corpus(out_dir, args.images, args.hot_copies)
    stages["gen"] = round(time.perf_counter() - t0, 2)

    def read():
        return rd.read_parquet(
            os.path.join(out_dir, "corpus.parquet"),
            columns=["image_id", "bytes", "fmt"],
        )

    conc = max(2, args.cpus - 2)

    t0 = time.perf_counter()
    rows["sigs"] = image_phash_sigs(
        read(), batch_size=256, concurrency=conc
    ).count()
    stages["sigs"] = round(time.perf_counter() - t0, 2)

    if not args.keepers_only:
        t0 = time.perf_counter()
        rows["image_dedup"] = image_near_dups(
            read(), max_hamming=args.hamming, batch_size=256, concurrency=conc
        ).count()
        stages["image_dedup"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    keep_ds = image_dedup_keep(
        read(), max_hamming=args.hamming, batch_size=256, concurrency=conc
    )
    import pyarrow.compute as pc

    absorbed = 0
    n_keepers = 0
    for b in keep_ds.iter_batches(batch_format="pyarrow"):
        n_keepers += b.num_rows
        absorbed += int(pc.sum(b["group_size"]).as_py() or 0)
    rows["image_dedup_keep"] = n_keepers
    stages["image_dedup_keep"] = round(time.perf_counter() - t0, 2)
    # conservation invariant: every decoded image lands in exactly one
    # cluster, so the keeper set's sizes must sum to the corpus
    if absorbed != rows["sigs"]:
        raise AssertionError(
            f"keeper group sizes sum to {absorbed}, expected {rows['sigs']}"
        )

    from lopez_ray.stages.multimodal import image_dedup_keep_best, image_exact_dedup

    # exact byte dedup (no decode): the cheap first rung — the planted
    # exact copies + the hot cluster must all collapse
    t0 = time.perf_counter()
    exact_ds = image_exact_dedup(read(), batch_size=256)
    n_groups = 0
    exact_absorbed = 0
    for b in exact_ds.iter_batches(batch_format="pyarrow"):
        n_groups += b.num_rows
        exact_absorbed += int(pc.sum(b["n_copies"]).as_py() or 0)
    rows["image_exact_dedup"] = n_groups
    stages["image_exact_dedup"] = round(time.perf_counter() - t0, 2)
    if exact_absorbed != args.images:
        raise AssertionError(
            f"exact-dedup copies sum to {exact_absorbed}, expected {args.images}"
        )
    if n_groups >= args.images:  # the planted copies must have collapsed
        raise AssertionError("exact dedup found zero byte-duplicate groups")

    # best-copy keepers: same cluster structure as image_dedup_keep,
    # argmax-by-px keeper — cluster count and size-sum must agree
    t0 = time.perf_counter()
    best_ds = image_dedup_keep_best(
        read(), max_hamming=args.hamming, batch_size=256, concurrency=conc
    )
    n_best = 0
    best_absorbed = 0
    for b in best_ds.iter_batches(batch_format="pyarrow"):
        n_best += b.num_rows
        best_absorbed += int(pc.sum(b["group_size"]).as_py() or 0)
    rows["image_keep_best"] = n_best
    stages["image_keep_best"] = round(time.perf_counter() - t0, 2)
    if n_best != n_keepers or best_absorbed != rows["sigs"]:
        raise AssertionError(
            f"keep_best clusters {n_best}/{best_absorbed} disagree with "
            f"keep {n_keepers}/{rows['sigs']}"
        )

    total = round(sum(stages.values()) - stages["gen"], 2)
    print(
        json.dumps(
            {
                "metric": f"img-xl pipelines wall ({args.images} images, excl. gen)",
                "value": total,
                "unit": "sec",
                "n_images": args.images,
                "hot_copies": args.hot_copies,
                "max_hamming": args.hamming,
                "stages": stages,
                "rows": rows,
                "num_cpus": args.cpus,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
