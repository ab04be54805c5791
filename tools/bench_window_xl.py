#!/usr/bin/env python
"""10M-event window/join bench tier.

The window-family operators (as-of join, rolling window, range-join
attribution, per-group top-k) are oracled at sf0.1's ~400k events;
this tier runs them at >=10M rows with ZIPF-SKEWED users so the
user_id hash partition can't hide hot-key behavior behind the sf
tiers' uniform key space: 20% of events land on 100 hot users (worst
partition carries ~1000x the median user's rows), which stresses the
per-partition merge_asof/cumsum kernels exactly where a per-user
Python loop would blow up.

Corpus: deterministic synthetic events (seeded per block — no
external data) in the exact testdata shape (event_id, ts[us],
user_id, event_type, value), written once to /tmp as events.parquet;
a matching orders.parquet (o_orderkey, o_custkey, o_totalprice) feeds
the top-k leg. The table dir doubles as an sf_dir so the REGISTERED
query callables run unmodified.

Prints ONE JSON line:
  {"metric": "window-xl wall (N events, excl. gen)", "value": s,
   "unit": "sec", "n_events": N, "stages": {...}, "rows": {...},
   "num_cpus": C}

Usage: python tools/bench_window_xl.py [--events 10000000] [--cpus 32]
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

BLOCK = 500_000
N_USERS = 1_000_000
N_HOT = 100
HOT_FRAC = 0.2
SPAN_US = 90 * 86_400_000_000  # 90 days
EPOCH0 = 1_700_000_000_000_000  # fixed epoch origin (µs)
ETYPES = np.array(["view", "click", "purchase", "signup", "error"])


def gen_events(out_dir: str, n_events: int) -> None:
    """Seeded parallel generation → <out_dir>/events.parquet +
    <out_dir>/orders.parquet (one order per 10 events)."""
    import ray.data as rd

    done = os.path.join(out_dir, f"_DONE_{n_events}")
    if os.path.exists(done):
        return
    os.makedirs(out_dir, exist_ok=True)
    n_blocks = (n_events + BLOCK - 1) // BLOCK

    def make(batch: pa.Table) -> pa.Table:
        b = int(batch["id"][0].as_py())
        lo, hi = b * BLOCK, min((b + 1) * BLOCK, n_events)
        n = hi - lo
        rng = np.random.default_rng(7_000 + b)
        hot = rng.random(n) < HOT_FRAC
        users = rng.integers(0, N_USERS, n, dtype=np.int64)
        users[hot] = rng.integers(0, N_HOT, int(hot.sum()), dtype=np.int64)
        ts = EPOCH0 + rng.integers(0, SPAN_US, n, dtype=np.int64)
        etype = ETYPES[rng.integers(0, len(ETYPES), n)]
        value = np.round(rng.random(n) * 100.0, 4)
        return pa.table(
            {
                "event_id": pa.array(np.arange(lo, hi, dtype=np.int64), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(etype, pa.string()),
                "value": pa.array(value, pa.float64()),
            }
        )

    def make_orders(batch: pa.Table) -> pa.Table:
        b = int(batch["id"][0].as_py())
        n_orders = n_events // 10
        blk = BLOCK // 10
        lo, hi = b * blk, min((b + 1) * blk, n_orders)
        n = hi - lo
        rng = np.random.default_rng(9_000 + b)
        hot = rng.random(n) < HOT_FRAC
        cust = rng.integers(0, N_USERS, n, dtype=np.int64)
        cust[hot] = rng.integers(0, N_HOT, int(hot.sum()), dtype=np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(np.arange(lo, hi, dtype=np.int64), pa.int64()),
                "o_custkey": pa.array(cust, pa.int64()),
                "o_totalprice": pa.array(
                    np.round(rng.random(n) * 100_000.0, 2), pa.float64()
                ),
            }
        )

    import shutil

    for name, fn in (("events.parquet", make), ("orders.parquet", make_orders)):
        tmp = os.path.join(out_dir, name + ".tmp")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        final = os.path.join(out_dir, name)
        if os.path.exists(final):
            shutil.rmtree(final)
        rd.range(n_blocks).repartition(n_blocks).map_batches(
            fn, batch_format="pyarrow"
        ).write_parquet(tmp)
        os.rename(tmp, final)
    with open(done, "w") as f:
        f.write("ok")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=10_000_000)
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

    out_dir = f"/tmp/lopez_ray_window_xl_{args.events}"
    stages: dict[str, float] = {}
    rows: dict[str, int] = {}

    t0 = time.perf_counter()
    gen_events(out_dir, args.events)
    stages["gen"] = round(time.perf_counter() - t0, 2)

    from lopez_ray.pipelines.queries import QUERIES

    for name in (
        "events_asof",
        "events_rolling",
        "events_range_join",
        "events_debounce",
        "top_orders_per_cust",
    ):
        t0 = time.perf_counter()
        out = QUERIES[name](out_dir)
        rows[name] = out.count() if hasattr(out, "count") else len(out)
        stages[name] = round(time.perf_counter() - t0, 2)

    total = round(sum(v for k, v in stages.items() if k != "gen"), 2)
    print(
        json.dumps(
            {
                "metric": f"window-xl pipelines wall ({args.events} events, excl. gen)",
                "value": total,
                "unit": "sec",
                "n_events": args.events,
                "stages": stages,
                "rows": rows,
                "num_cpus": args.cpus,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
