"""Property-based hardening of the raw-task hash exchange
(stages/shuffle.py) — the primitive under every dedup/CC/join pipeline.

Hypothesis drives randomized key distributions (including negative and
near-2^63 magnitudes, which exercise the int64→uint64 mixer view, and
heavy duplication) through ``partitioned_reduce`` and
``partitioned_lookup_join`` and compares against plain pandas. Example
counts are deliberately small: every example is a real two-wave Ray
exchange, so the value is in the generator's edge-case corners (empty
inputs, single keys, hot keys, extreme magnitudes), not in volume."""

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
# mix extreme magnitudes with a tiny hot-key space so duplicates occur
KEY = st.one_of(I64, st.integers(min_value=-2, max_value=2))
SMALL = st.integers(min_value=-1000, max_value=1000)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(
    rows=st.lists(st.tuples(KEY, SMALL), min_size=0, max_size=80),
    n_parts=st.sampled_from([1, 3, 8]),
)
@_SETTINGS
def test_partitioned_reduce_equals_pandas_groupby(ray_session, rows, n_parts):
    import ray.data as rd

    from lopez_ray.stages.shuffle import partitioned_reduce

    k = np.array([r[0] for r in rows], dtype=np.int64)
    v = np.array([r[1] for r in rows], dtype=np.int64)
    tbl = pa.table({"k": pa.array(k, pa.int64()), "v": pa.array(v, pa.int64())})
    out = partitioned_reduce(
        rd.from_arrow(tbl),
        ["k"],
        lambda g: g.groupby("k", as_index=False).agg(
            s=("v", "sum"), n=("v", "size")
        ),
        n_parts=n_parts,
    ).to_pandas()

    want = (
        pd.DataFrame({"k": k, "v": v})
        .groupby("k", as_index=False)
        .agg(s=("v", "sum"), n=("v", "size"))
    )
    assert len(out) == len(want)
    if len(want):
        got = out.sort_values("k").reset_index(drop=True).astype("int64")
        exp = want.sort_values("k").reset_index(drop=True).astype("int64")
        pd.testing.assert_frame_equal(got[["k", "s", "n"]], exp[["k", "s", "n"]])


@given(
    left_keys=st.lists(KEY, min_size=1, max_size=60),
    right_rows=st.lists(st.tuples(KEY, SMALL), min_size=0, max_size=40),
    how=st.sampled_from(["left", "inner"]),
)
@_SETTINGS
def test_partitioned_lookup_join_equals_pandas_merge(
    ray_session, left_keys, right_rows, how
):
    import ray.data as rd

    from lopez_ray.stages.shuffle import partitioned_lookup_join

    # right side is a lookup table: unique keys (contract)
    right = {}
    for kk, vv in right_rows:
        right.setdefault(kk, vv)
    lk = np.array(left_keys, dtype=np.int64)
    lt = pa.table(
        {
            "k": pa.array(lk, pa.int64()),
            "lv": pa.array(np.arange(len(lk)), pa.int64()),
        }
    )
    rt = pa.table(
        {
            "k": pa.array(np.array(list(right.keys()), dtype=np.int64), pa.int64()),
            "rv": pa.array(
                np.array(list(right.values()), dtype=np.int64), pa.int64()
            ),
        }
    )
    out = partitioned_lookup_join(
        rd.from_arrow(lt), rd.from_arrow(rt), ["k"], how=how, n_parts=4
    ).to_pandas()

    want = lt.to_pandas().merge(rt.to_pandas(), how=how, on="k")
    assert len(out) == len(want)
    if len(want):
        got = out.sort_values(["k", "lv"]).reset_index(drop=True)
        exp = want.sort_values(["k", "lv"]).reset_index(drop=True)
        assert got["k"].astype("int64").tolist() == exp["k"].astype("int64").tolist()
        assert got["lv"].astype("int64").tolist() == exp["lv"].astype("int64").tolist()
        # rv may be nullable on the left path; compare as object with NaN→None
        g_rv = [None if pd.isna(x) else int(x) for x in got["rv"]]
        e_rv = [None if pd.isna(x) else int(x) for x in exp["rv"]]
        assert g_rv == e_rv


def test_escalated_reduce_matches_unescalated(ray_session, monkeypatch):
    """Force the second-level sub-split (LOPEZ_PART_CAP_BYTES=1 makes
    every byte overflow the cap) and check the escalated exchange is
    output-identical to the normal path and to pandas."""
    import ray.data as rd

    from lopez_ray.stages.shuffle import partitioned_reduce

    rng = np.random.default_rng(7)
    k = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    k[::7] = 42  # a hot key spanning many blocks
    v = rng.integers(-1000, 1000, size=5000, dtype=np.int64)
    tbl = pa.table({"k": pa.array(k), "v": pa.array(v)})
    red = lambda g: g.groupby("k", as_index=False).agg(
        s=("v", "sum"), n=("v", "size")
    )

    plain = partitioned_reduce(
        rd.from_arrow(tbl), ["k"], red, n_parts=8
    ).to_pandas()
    monkeypatch.setenv("LOPEZ_PART_CAP_BYTES", "1")
    esc = partitioned_reduce(
        rd.from_arrow(tbl), ["k"], red, n_parts=8
    ).to_pandas()

    want = red(pd.DataFrame({"k": k, "v": v}))
    for got in (plain, esc):
        g = got.sort_values("k", ignore_index=True).astype("int64")
        e = want.sort_values("k", ignore_index=True).astype("int64")
        pd.testing.assert_frame_equal(g[["k", "s", "n"]], e[["k", "s", "n"]])


def test_escalated_join_matches_unescalated(ray_session, monkeypatch):
    import ray.data as rd

    from lopez_ray.stages.shuffle import partitioned_lookup_join

    rng = np.random.default_rng(9)
    lk = rng.integers(0, 300, size=2000, dtype=np.int64)
    lt = pa.table(
        {"k": pa.array(lk), "lv": pa.array(np.arange(2000, dtype=np.int64))}
    )
    rk = np.arange(0, 200, dtype=np.int64)  # keys 200..299 miss
    rt = pa.table({"k": pa.array(rk), "rv": pa.array(rk * 10)})

    def run():
        return (
            partitioned_lookup_join(
                rd.from_arrow(lt), rd.from_arrow(rt), ["k"], how="left", n_parts=8
            )
            .to_pandas()
            .sort_values(["k", "lv"], ignore_index=True)
        )

    plain = run()
    monkeypatch.setenv("LOPEZ_PART_CAP_BYTES", "1")
    esc = run()
    want = (
        lt.to_pandas()
        .merge(rt.to_pandas(), how="left", on="k")
        .sort_values(["k", "lv"], ignore_index=True)
    )
    for got in (plain, esc):
        assert len(got) == len(want)
        assert got["k"].tolist() == want["k"].tolist()
        g_rv = [None if pd.isna(x) else int(x) for x in got["rv"]]
        e_rv = [None if pd.isna(x) else int(x) for x in want["rv"]]
        assert g_rv == e_rv
