"""Brute-force property suites for the round-5 partition kernels —
pure pandas/numpy functions, no Ray session needed (mirrors the window
family's test_kernel_props.py standard). Each kernel receives whole key
groups per partition (the partitioned_reduce contract), so feeding it a
full random frame IS the distributed semantics."""

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from lopez_ray.pipelines.queries import (  # noqa: E402
    _DEBOUNCE_GAP_US,
    _debounce_partition,
    _decile_partition,
    _running_total_partition,
    _skyline_partition,
)


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("seed", range(5))
def test_decile_partition_vs_brute(seed):
    r = _rng(seed)
    n = int(r.integers(1, 400))
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": r.choice(["en", "fr", "zh"], n),
            "n_chars": r.integers(0, 50, n).astype(np.int64),  # heavy ties
        }
    )
    out = _decile_partition(df)
    for lang, g in df.groupby("lang"):
        s = g.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        m = len(s)
        buckets = (10 * np.arange(m)) // m
        want = {}
        for b in sorted(set(buckets)):
            vals = s["n_chars"].to_numpy()[buckets == b]
            want[b] = (len(vals), vals[0], vals[-1])
        got = out[out["lang"] == lang]
        assert {
            int(r2["decile"]): (int(r2["n_docs"]), int(r2["lo"]), int(r2["hi"]))
            for _, r2 in got.iterrows()
        } == want


@pytest.mark.parametrize("seed", range(5))
def test_debounce_partition_vs_brute(seed):
    r = _rng(seed)
    n = int(r.integers(1, 500))
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": r.integers(0, 8, n).astype(np.int64),
            "event_type": r.choice(["a", "b"], n),
            # dense timestamps force both kept and dropped rows,
            # including exact-gap boundaries and identical-ts ties
            "ts_us": (
                r.integers(0, 10, n).astype(np.int64) * _DEBOUNCE_GAP_US // 2
            ),
        }
    )
    got = set(_debounce_partition(df.copy())["event_id"])
    want = set()
    for (_, _), g in df.groupby(["user_id", "event_type"]):
        s = g.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        for i in range(len(s)):
            if i == 0 or s["ts_us"][i] - s["ts_us"][i - 1] > _DEBOUNCE_GAP_US:
                want.add(int(s["event_id"][i]))
    assert got == want


@pytest.mark.parametrize("seed", range(8))
def test_skyline_partition_vs_brute(seed):
    r = _rng(seed)
    n = int(r.integers(1, 200))
    # small value domains force heavy ties on one or both axes
    df = pd.DataFrame(
        {
            "o_custkey": np.arange(n, dtype=np.int64),
            "spend_c": r.integers(0, 8, n).astype(np.int64),
            "n_orders": r.integers(0, 8, n).astype(np.int64),
        }
    )
    got = set(_skyline_partition(df.copy())["o_custkey"])
    pts = df[["spend_c", "n_orders"]].to_numpy()
    want = set()
    for i in range(n):
        dominated = False
        for j in range(n):
            if i == j:
                continue
            ge = pts[j][0] >= pts[i][0] and pts[j][1] >= pts[i][1]
            gt = pts[j][0] > pts[i][0] or pts[j][1] > pts[i][1]
            if ge and gt:
                dominated = True
                break
        if not dominated:
            want.add(int(df["o_custkey"][i]))
    assert got == want


def test_skyline_idempotent_combiner():
    # skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)) — the algebra
    # the distributed plan depends on
    r = _rng(7)
    mk = lambda m: pd.DataFrame(  # noqa: E731
        {
            "o_custkey": r.integers(0, 10**6, m).astype(np.int64),
            "spend_c": r.integers(0, 20, m).astype(np.int64),
            "n_orders": r.integers(0, 20, m).astype(np.int64),
        }
    )
    a, b = mk(150), mk(150)
    direct = _skyline_partition(pd.concat([a, b], ignore_index=True))
    merged = _skyline_partition(
        pd.concat(
            [_skyline_partition(a), _skyline_partition(b)], ignore_index=True
        )
    )
    key = lambda d: sorted(  # noqa: E731
        map(tuple, d[["spend_c", "n_orders", "o_custkey"]].to_numpy())
    )
    assert key(direct) == key(merged)


@pytest.mark.parametrize("seed", range(5))
def test_running_total_partition_vs_brute(seed):
    r = _rng(seed)
    n = int(r.integers(1, 300))
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": r.integers(0, 10, n).astype(np.int64),
            "ts": r.integers(0, 5, n).astype(np.int64),  # date ties
            "cents": r.integers(0, 10**9, n).astype(np.int64),
        }
    )
    out = _running_total_partition(df.copy()).set_index("o_orderkey")
    for _, g in df.groupby("o_custkey"):
        s = g.sort_values(["ts", "o_orderkey"]).reset_index(drop=True)
        run = 0
        for _, row in s.iterrows():
            run += int(row["cents"])
            assert out.loc[row["o_orderkey"], "run_total"] == run / 100.0
