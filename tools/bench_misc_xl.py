#!/usr/bin/env python
"""1M-row tier for the round-5 ops: triangle counting, per-lang token
entropy, the table profiler (over the dedup-xl document corpus widened
with lang/source/n_chars columns) and the k-means step (over the ann-xl
1M-vector table). `revenue_by_nation` is TPC-H-table-bound and is
covered at sf0.1 by the headline harness instead.

Purpose: no new op may hide super-linear behavior behind sf0.1's 5k
docs — triangle wedges are the one quadratic-risk shape here (bounded
by degree orientation: out-degree ≤ O(√m)).

Prints ONE JSON line:
  {"metric": "misc-xl wall", "value": total_sec, "unit": "sec",
   "n_docs": N, "stages": {...}, "rows": {...}, "num_cpus": C}

Usage: python tools/bench_misc_xl.py [--docs 1000000] [--cpus 32]
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

_LANGS = ["en", "fr", "es", "de", "zh"]
_SOURCES = ["web", "books", "news"]


def widen_corpus(dedup_dir: str, out_dir: str, n_docs: int) -> str:
    """documents.parquet with the sf-tier schema (doc_id, text, lang,
    source, n_chars) derived deterministically from the dedup-xl corpus
    — lang/source are hash-assigned so entropy gets real groups."""
    import ray.data as rd

    from lopez_ray.hash import md5_u64_batch

    done = os.path.join(out_dir, f"_DONE_{n_docs}")
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    def widen(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = np.asarray(b["doc_id"], np.int64)
        h = md5_u64_batch([b"lg|%d" % i for i in ids.tolist()])
        lang = np.asarray(_LANGS, object)[(h % np.uint64(5)).astype(np.int64)]
        src = np.asarray(_SOURCES, object)[
            ((h >> np.uint64(8)) % np.uint64(3)).astype(np.int64)
        ]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "text": b["text"],
                "lang": pa.array(lang, pa.string()),
                "source": pa.array(src, pa.string()),
                "n_chars": pc.utf8_length(
                    b["text"].combine_chunks()
                    if isinstance(b["text"], pa.ChunkedArray)
                    else b["text"]
                ).cast(pa.int64()),
            }
        )

    src_path = os.path.join(dedup_dir, "documents.parquet")
    tmp = os.path.join(out_dir, "docs_parts")
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    rd.read_parquet(src_path).map_batches(widen, batch_format="pyarrow").write_parquet(tmp)
    if os.path.exists(path) and os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    os.rename(tmp, path)
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    )
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

    from lopez_ray.util import silence_empty_bundle_noise

    silence_empty_bundle_noise()

    from tools.bench_ann_xl import gen_corpus as gen_vecs
    from tools.bench_dedup_xl import gen_corpus as gen_docs

    stages: dict[str, float] = {}
    rows: dict[str, int] = {}

    t0 = time.perf_counter()
    dedup_dir = f"/tmp/lopez_ray_dedup_xl_{args.docs}"
    gen_docs(dedup_dir, args.docs)
    misc_dir = f"/tmp/lopez_ray_misc_xl_{args.docs}"
    widen_corpus(dedup_dir, misc_dir, args.docs)
    ann_dir = f"/tmp/lopez_ray_ann_xl_{args.vectors}"
    gen_vecs(ann_dir, args.vectors)
    stages["gen"] = round(time.perf_counter() - t0, 2)

    from lopez_ray.pipelines.queries import (
        q_doc_bfs_dist,
        q_doc_graph_components,
        q_doc_triangles,
        q_kmeans_step,
        q_lang_token_entropy,
        q_table_profile,
        q_vocab_overlap,
    )

    def run(name, fn, sdir):
        t0 = time.perf_counter()
        out = fn(sdir)
        rows[name] = out.count() if isinstance(out, rd.Dataset) else len(out)
        stages[name] = round(time.perf_counter() - t0, 2)

    run("doc_triangles", q_doc_triangles, misc_dir)
    run("doc_graph_components", q_doc_graph_components, misc_dir)
    run("doc_bfs_dist", q_doc_bfs_dist, misc_dir)
    run("lang_token_entropy", q_lang_token_entropy, misc_dir)
    run("vocab_overlap", q_vocab_overlap, misc_dir)
    run("table_profile", q_table_profile, misc_dir)
    run("kmeans_step", q_kmeans_step, ann_dir)

    total = round(sum(v for k, v in stages.items() if k != "gen"), 2)
    print(
        json.dumps(
            {
                "metric": "misc-xl pipelines wall (round-5 ops, excl. gen)",
                "value": total,
                "unit": "sec",
                "n_docs": args.docs,
                "n_vectors": args.vectors,
                "stages": stages,
                "rows": rows,
                "num_cpus": args.cpus,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
