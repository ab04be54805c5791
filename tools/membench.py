#!/usr/bin/env python
"""STREAM-style memory-bandwidth microbench: the hardware half of the
8→32 scaling story (round-3 verdict #3).

The crawl's 8→32-CPU efficiency on this single box is capped by shared
memory bandwidth — a ceiling a real 4N-node cluster does not have,
because nodes add memory controllers along with cores. This tool
measures that ceiling directly: K worker THREADS each run the STREAM
triad `c = a + s*b` over private array slices far larger than any
per-core cache, and we report aggregate bandwidth at each K.

Two sandbox adaptations (both measured, both conservative):
- threads, not processes: numpy releases the GIL inside ufunc inner
  loops so threads saturate the memory controllers exactly like Ray's
  worker processes do, and this sandbox charges minutes of kernel time
  per GB of fresh PROCESS pages (one 8-process run = 13 min sys);
- one buffer pool allocated (and first-touched) ONCE, sliced per
  thread and reused across every K and run: first-touch costs ~0.1 s
  of sys time per MB here, so per-run allocation would swamp the
  timed window.

If the hardware's aggregate bandwidth at 32 workers is R× the 8-worker
figure, then a memory-bound pipeline's best possible 8→32 throughput
ratio is R (efficiency R/4) — the crawl cannot scale past the machine.
Published next to the crawl legs in BENCH_scaling_r4 / BASELINE.md.

Usage: python tools/membench.py [--workers 1,8,32] [--mb 16] [--secs 2]
Prints one JSON line: {"triad_gbps": {K: gbps}, "hw_ratio_8_to_32": ...}
"""

from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np


def _worker(
    a: np.ndarray,
    b: np.ndarray,
    c: np.ndarray,
    secs: float,
    start_evt: threading.Event,
    out: list,
) -> None:
    s = 1.7
    # warm-up: every page already touched at pool build; this warms TLB
    np.multiply(b, s, out=c)
    np.add(a, c, out=c)
    start_evt.wait()
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < secs:
        np.multiply(b, s, out=c)  # read b, write c
        np.add(a, c, out=c)  # read a, read c, write c
        iters += 1
    elapsed = time.perf_counter() - t0
    # the two-op triad moves 5 array-streams/iter (b,c then a,c,c);
    # count the classic triad's 3 — understates, never overstates
    out.append(iters * 3 * a.nbytes / elapsed)


class Pool:
    """One contiguous allocation per stream, sliced per worker: slice i
    belongs to worker i for every K, so K=8 and K=32 stream the same
    physical pages (no per-run first-touch cost, identical layout)."""

    def __init__(self, max_workers: int, mb_per_worker: int):
        n = (mb_per_worker * 1024 * 1024) // 8
        self.n = n
        self.a = np.ones(max_workers * n)
        self.b = np.full(max_workers * n, 0.5)
        self.c = np.empty(max_workers * n)
        self.c[:] = 0.0  # first-touch every page once, up front

    def slices(self, i: int):
        sl = slice(i * self.n, (i + 1) * self.n)
        return self.a[sl], self.b[sl], self.c[sl]


def run(pool: Pool, workers: int, secs: float) -> float:
    """Aggregate triad GB/s across `workers` simultaneous threads."""
    start_evt = threading.Event()
    out: list[float] = []
    threads = [
        threading.Thread(
            target=_worker, args=(*pool.slices(i), secs, start_evt, out)
        )
        for i in range(workers)
    ]
    for t in threads:
        t.start()
    time.sleep(0.2)  # let every thread reach the barrier
    start_evt.set()
    for t in threads:
        t.join()
    return sum(out) / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", default="1,8,32")
    ap.add_argument("--mb", type=int, default=16)
    ap.add_argument("--secs", type=float, default=2.0)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    ks = [int(x) for x in args.workers.split(",")]
    pool = Pool(max(ks), args.mb)
    best: dict[int, float] = {}
    samples: dict[int, list[float]] = {k: [] for k in ks}
    for k in ks:
        for _ in range(args.runs):
            g = run(pool, k, args.secs)
            samples[k].append(round(g, 2))
            best[k] = max(best.get(k, 0.0), g)
    out = {
        "metric": "STREAM triad aggregate memory bandwidth (best of runs)",
        "unit": "GB/s",
        "triad_gbps": {str(k): round(v, 2) for k, v in best.items()},
        "samples": {str(k): v for k, v in samples.items()},
        "mb_per_worker": args.mb,
        "secs": args.secs,
    }
    if 8 in best and 32 in best:
        out["hw_ratio_8_to_32"] = round(best[32] / best[8], 3)
        out["hw_efficiency_8_to_32"] = round(best[32] / (4 * best[8]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
