#!/usr/bin/env python
"""1M-vector ANN / embedding-dedup bench tier.

The dedup/ANN family was previously benched only at sf0.1 (~5k
vectors); this tier runs the embedding pipelines at >=1M vectors so
shuffle amplification, bucket skew, and index-build cost can't hide
behind toy inputs (the text twin is tools/bench_dedup_xl.py).

Corpus: deterministic synthetic vectors (seeded per block — no
external data): a 1024-center gaussian mixture in 64 dims (cluster
center + 0.35σ within-cluster noise — real embedding corpora cluster,
and cluster structure is precisely what IVF exploits; on structureless
uniform gaussians top-k neighbors are spread over all lists and ANY
pruning index shows floor recall) with a planted 0.5% near-duplicate
fraction (source vector + 5% noise → cos ≈ 0.9988).

Stages benched, wall seconds each:
  - embedding_dups : multi-table LSH near-dup pairs at cos >= 0.99,
                     plus measured recall of the planted pairs
  - ivf_build      : 256-list IVF parquet layout over the corpus
  - ivf_search     : 64 queries, k=10, nprobe=8 over the built layout,
                     plus recall vs the brute-force truth
  - ann_bruteforce : the same 64 queries against the full corpus

Prints ONE JSON line:
  {"metric": "ann-xl pipelines wall (1M vectors)", "value": total_sec,
   "unit": "sec", "n_vectors": N, "stages": {...}, "recall": {...},
   "num_cpus": C}

Usage: python tools/bench_ann_xl.py [--vectors 1000000] [--cpus 32]
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

DIM = 64
BLOCK = 20_000
DUP_FRAC = 0.005
NOISE = 0.05
N_CLUSTERS = 1024
SPREAD = 0.35


def _base_vec(vid: int) -> np.ndarray:
    """Deterministic corpus vector: cluster center + within-cluster
    noise (pure function of vid, shared by the generator and the
    planted-truth recomputation)."""
    center = np.random.default_rng(5_000_000 + vid % N_CLUSTERS).standard_normal(DIM)
    return center + SPREAD * np.random.default_rng(2000 + vid).standard_normal(DIM)


def gen_corpus(out_dir: str, n_vecs: int) -> str:
    import ray.data as rd

    done = os.path.join(out_dir, f"_DONE_{n_vecs}")
    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(done):
        return path
    os.makedirs(out_dir, exist_ok=True)
    n_unique = int(n_vecs * (1 - DUP_FRAC))
    n_blocks = (n_vecs + BLOCK - 1) // BLOCK

    def make(batch: pa.Table) -> pa.Table:
        b = int(batch["id"][0].as_py())
        lo, hi = b * BLOCK, min((b + 1) * BLOCK, n_vecs)
        ids = np.arange(lo, hi, dtype=np.int64)
        vecs = np.empty((len(ids), DIM), np.float64)
        for row, vid in enumerate(ids):
            if vid < n_unique:
                vecs[row] = _base_vec(int(vid))
            else:
                src = int(vid - n_unique)  # near-dup of vector `src`
                v = _base_vec(src)
                noise = np.random.default_rng(7_000_000 + vid).standard_normal(DIM)
                vecs[row] = v + NOISE * np.linalg.norm(v) * noise / np.linalg.norm(noise)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )

    tmp = os.path.join(out_dir, "vec_parts")
    if os.path.exists(tmp):  # stale parts from a crashed earlier gen
        import shutil

        shutil.rmtree(tmp)
    rd.range(n_blocks).repartition(n_blocks).map_batches(
        make, batch_format="pyarrow"
    ).write_parquet(tmp)
    if os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    os.rename(tmp, path)
    with open(done, "w") as f:
        f.write("ok")
    return path


def planted_truth(n_vecs: int, threshold: float) -> set[tuple[int, int]]:
    """Planted (src, dup) pairs whose TRUE cosine clears the threshold —
    recomputed exactly from the generator seeds (cheap: 0.5% of n)."""
    n_unique = int(n_vecs * (1 - DUP_FRAC))
    out = set()
    for vid in range(n_unique, n_vecs):
        src = vid - n_unique
        v = _base_vec(src)
        noise = np.random.default_rng(7_000_000 + vid).standard_normal(DIM)
        d = v + NOISE * np.linalg.norm(v) * noise / np.linalg.norm(noise)
        cos = float(v @ d / (np.linalg.norm(v) * np.linalg.norm(d)))
        if cos >= threshold:
            out.add((src, vid))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import logging

    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    out_dir = f"/tmp/lopez_ray_ann_xl_{args.vectors}"
    stages: dict[str, float] = {}
    recall: dict[str, float] = {}
    threshold = 0.99

    t0 = time.perf_counter()
    vec_path = gen_corpus(out_dir, args.vectors)
    stages["gen"] = round(time.perf_counter() - t0, 2)

    from lopez_ray.stages.ann import brute_force_topk, ivf_build, ivf_search
    from lopez_ray.stages.dedup import embedding_near_dups

    def read():
        return rd.read_parquet(vec_path, columns=["vec_id", "embedding"])

    # --- LSH near-dup pairs + planted recall ---
    t0 = time.perf_counter()
    pairs = embedding_near_dups(
        read(), threshold=threshold, n_planes=12, n_tables=4
    ).to_pandas()
    stages["embedding_dups"] = round(time.perf_counter() - t0, 2)
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    truth = planted_truth(args.vectors, threshold)
    recall["embedding_dups_planted"] = round(
        len(got & truth) / len(truth), 4
    ) if truth else 1.0

    # --- IVF build / search vs brute force ---
    n_unique = int(args.vectors * (1 - DUP_FRAC))
    rng = np.random.default_rng(99)
    q_src = rng.choice(n_unique, size=64, replace=False)
    queries = np.stack([_base_vec(int(s)) for s in q_src])

    index_dir = os.path.join(out_dir, "ivf")
    # cache-clean timing (the curate lesson from the round-3 verdict):
    # ivf_build is idempotent via its _DONE marker, so a leftover index
    # from a previous invocation would turn this stage into a no-op and
    # record a fantasy build time
    if os.path.isdir(index_dir):
        import shutil

        shutil.rmtree(index_dir)
    t0 = time.perf_counter()
    ivf_build(read(), index_dir, n_centroids=256)
    stages["ivf_build"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    hits = ivf_search(index_dir, queries, k=10, nprobe=8).to_pandas()
    stages["ivf_search"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    truth_topk = brute_force_topk(read(), queries, k=10).to_pandas()
    stages["ann_bruteforce"] = round(time.perf_counter() - t0, 2)

    want = {
        (int(q), int(v))
        for q, v in zip(truth_topk["query_idx"], truth_topk["vec_id"])
    }
    have = {(int(q), int(v)) for q, v in zip(hits["query_idx"], hits["vec_id"])}
    recall["ivf_topk_vs_brute"] = round(len(want & have) / len(want), 4)

    total = round(sum(stages.values()) - stages["gen"], 2)
    print(
        json.dumps(
            {
                "metric": "ann-xl pipelines wall (1M vectors, excl. gen)",
                "value": total,
                "unit": "sec",
                "n_vectors": args.vectors,
                "stages": stages,
                "rows": {"embedding_dups": int(len(pairs))},
                "recall": recall,
                "num_cpus": args.cpus,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
