"""Property-based hardening of the window-family per-partition kernels
(pipelines/queries.py): as-of join, 7-day rolling sum, range-join
attribution, and the per-group order statistic.

Each kernel is a pure pandas function (module-level exactly so this
suite can drive it without a Ray exchange), compared against a
deliberately naive O(n²) Python reference. The generators are
tie-heavy: timestamps from a tiny integer space force duplicate event
times (click == view instants, same-timestamp purchases), multiple hot
users, and empty sides — the corners where merge_asof boundary
semantics (allow_exact_matches, backward direction, probe-order
output) would drift from the SQL definitions."""

import sys

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from lopez_ray.pipelines.queries import (  # noqa: E402
    _HOUR_US,
    _asof_partition,
    _median_partition,
    _range_join_partition,
    _rolling_partition,
)

_SETTINGS = settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

USER = st.integers(min_value=0, max_value=3)  # hot users → real groups
# µs timestamps clustered tightly so exact ties and sub-hour gaps occur
TS_US = st.integers(min_value=0, max_value=4 * _HOUR_US)
ETYPE = st.sampled_from(["click", "view", "purchase", "error"])

EVENTS = st.lists(st.tuples(USER, TS_US, ETYPE), min_size=0, max_size=60)


def _events_frame(rows):
    return pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "ts": pd.to_datetime(
                np.array([r[1] for r in rows], dtype="int64"), unit="us"
            ).astype("datetime64[us]"),
            "event_type": [r[2] for r in rows],
        }
    )


@given(rows=EVENTS)
@_SETTINGS
def test_asof_partition_equals_bruteforce(rows):
    g = _events_frame(rows)
    got = _asof_partition(g[g["event_type"].isin(["click", "view"])])
    want = []
    ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    for i in range(len(g)):
        if g["event_type"].iloc[i] != "click":
            continue
        prior = [
            ts_us[j]
            for j in range(len(g))
            if g["event_type"].iloc[j] == "view"
            and g["user_id"].iloc[j] == g["user_id"].iloc[i]
            and ts_us[j] <= ts_us[i]
        ]
        want.append(
            (
                int(g["event_id"].iloc[i]),
                int(g["user_id"].iloc[i]),
                int(ts_us[i]),
                max(prior) if prior else -1,
            )
        )
    got_rows = sorted(map(tuple, got.to_numpy().tolist()))
    assert got_rows == sorted(want)


@given(rows=EVENTS)
@_SETTINGS
def test_range_join_partition_equals_bruteforce(rows):
    g = _events_frame(rows)
    got = _range_join_partition(g[g["event_type"].isin(["click", "purchase"])])
    ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    want = []
    for i in range(len(g)):
        if g["event_type"].iloc[i] != "click":
            continue
        n = sum(
            1
            for j in range(len(g))
            if g["event_type"].iloc[j] == "purchase"
            and g["user_id"].iloc[j] == g["user_id"].iloc[i]
            and ts_us[i] < ts_us[j] <= ts_us[i] + _HOUR_US
        )
        want.append((int(g["event_id"].iloc[i]), int(g["user_id"].iloc[i]), n))
    got_rows = sorted(map(tuple, got.to_numpy().tolist()))
    assert got_rows == sorted(want)


DAILY = st.lists(
    st.tuples(
        USER,
        # include negative (pre-1970) days: floor-bucketing must hold
        st.integers(min_value=-12, max_value=25),  # tight → windows overlap
        # quarter-step floats: exercise the float path while keeping
        # the brute-force reference exact in any summation order
        st.integers(min_value=-200, max_value=200).map(lambda n: n / 4.0),
    ),
    min_size=0,
    max_size=60,
)


@given(rows=DAILY)
@_SETTINGS
def test_rolling_partition_equals_bruteforce(rows):
    g = pd.DataFrame(
        {
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "day": np.array([r[1] for r in rows], dtype=np.int64),
            "value_sum": np.array([r[2] for r in rows], dtype=np.float64),
        }
    )
    got = _rolling_partition(g)
    daily = {}
    for u, d, v in rows:
        daily[(u, d)] = daily.get((u, d), 0.0) + v
    want = sorted(
        (
            u,
            d,
            round(
                sum(v2 for (u2, d2), v2 in daily.items() if u2 == u and d - 6 <= d2 <= d),
                6,
            ),
        )
        for (u, d) in daily
    )
    got_rows = sorted(
        (int(r.user_id), int(r.day), float(r.roll7))
        for r in got.itertuples(index=False)
    )
    assert got_rows == want


CUSTOMERS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # nation
        st.integers(min_value=-10, max_value=10),  # balance: ties likely
    ),
    min_size=0,
    max_size=50,
)


@given(rows=CUSTOMERS)
@_SETTINGS
def test_median_partition_equals_bruteforce(rows):
    g = pd.DataFrame(
        {
            "c_custkey": np.arange(len(rows), dtype=np.int64),
            "c_nationkey": np.array([r[0] for r in rows], dtype=np.int64),
            "c_acctbal": np.array([r[1] for r in rows], dtype=np.float64),
        }
    )
    got = _median_partition(g)
    want = []
    for nat in sorted(set(r[0] for r in rows)):
        grp = sorted(
            (bal, key)
            for key, (n, bal) in enumerate(rows)
            if n == nat
        )
        bal, _ = grp[(len(grp) + 1) // 2 - 1]
        want.append((nat, len(grp), round(float(bal), 2)))
    got_rows = sorted(
        (int(r.c_nationkey), int(r.n_cust), float(r.median_acctbal))
        for r in got.itertuples(index=False)
    )
    assert got_rows == sorted(want)


def test_asof_partition_empty_and_no_views():
    g = _events_frame([])
    out = _asof_partition(g)
    assert len(out) == 0
    assert list(out.columns) == ["event_id", "user_id", "ts_us", "view_ts_us"]
    g2 = _events_frame([(1, 100, "click"), (2, 50, "click")])
    out2 = _asof_partition(g2)
    assert (out2["view_ts_us"] == -1).all()


def test_heavy_hitters_mg_compression_exact(ray_session, tmp_path):
    """Misra-Gries path with the compression ENGAGED (vocab > K=2000 —
    the sf corpora's 31-token vocab never compresses): the exact
    recount must equal a brute-force count despite sketch undercounts,
    because MG guarantees every true heavy hitter survives as a
    candidate."""
    import os
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    docs = []
    for _ in range(2000):
        words = [f"h{j}" for j in rng.integers(0, 10, 20)] + [
            f"t{j:04d}" for j in rng.integers(0, 5000, 30)
        ]
        docs.append(" ".join(words))
    d = tmp_path / "hh"
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs),
            }
        ),
        str(d / "documents.parquet"),
    )

    from lopez_ray.pipelines.queries import QUERIES

    got = (
        QUERIES["heavy_hitters"](str(d))
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    toks: list[str] = []
    for s in docs:
        toks.extend(re.findall(r"[a-z0-9_]+", s.lower()))
    vc = pd.Series(toks).value_counts()
    thr = len(toks) // 1000
    want = (
        vc[vc > thr]
        .rename_axis("token")
        .reset_index(name="cnt")
        .sort_values("token")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["token", "cnt"]], want[["token", "cnt"]], check_dtype=False
    )
    assert len(got) == 10  # exactly the planted heavy head


def test_heavy_hitters_drained_summary_still_counts(ray_session, tmp_path):
    """A batch whose MG compression DRAINS the summary (every token
    distinct and > K of them: d = 1, vc - 1 drops every row) must still
    contribute its token count to N. Round-4 rode N on the first
    summary row, so such a batch silently undercounted N, lowered the
    threshold, and admitted tokens the true-N oracle rejects; the
    unconditional sentinel row fixes it. One heavy doc + one
    all-distinct doc wide enough to flip the answer if N drops."""
    import os
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    # doc A: token "hot" appears 30 times -> cnt 30
    # doc B: 29_970 distinct singleton tokens (> K=2000, all c=1)
    # N = 30_000 -> threshold 30 -> "hot" (cnt 30) is NOT > 30: empty
    # answer. If doc B's count were lost, N=30 -> threshold 0 -> "hot"
    # would wrongly be emitted.
    docs = [
        " ".join(["hot"] * 30),
        " ".join(f"u{j:05d}" for j in range(29_970)),
    ]
    d = tmp_path / "hh2"
    # one parquet file per doc so the all-singleton doc is its own
    # read block -> its own mg_summary batch -> the drain engages
    os.makedirs(d / "documents.parquet", exist_ok=True)
    for i, txt in enumerate(docs):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([i], pa.int64()),
                    "text": pa.array([txt]),
                }
            ),
            str(d / "documents.parquet" / f"part-{i}.parquet"),
        )

    from lopez_ray.pipelines.queries import QUERIES

    got = QUERIES["heavy_hitters"](str(d))
    toks: list[str] = []
    for s in docs:
        toks.extend(re.findall(r"[a-z0-9_]+", s.lower()))
    thr = len(toks) // 1000
    vc = pd.Series(toks).value_counts()
    assert set(vc[vc > thr].index) == set()  # true answer IS empty
    assert got.count() == 0  # the buggy lost-N path emitted "hot" here
    assert got.schema().names == ["token", "cnt"]


def test_text_stats_null_text_propagates():
    """NULL text must propagate as NULL counts (the SQL oracles'
    regexp_extract_all(NULL) semantics) — not crash (review finding:
    the int64 cast of a NaN-bearing difference raised ArrowInvalid)
    and not silently read as zero."""
    import pyarrow as pa

    from lopez_ray.stages.text import gopher_stats, repetition_stats

    b = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a a b", None, ""], pa.string()),
        }
    )
    rep = repetition_stats(b).to_pydict()
    assert rep["n_tokens"] == [3, None, 0]
    assert rep["n_distinct_tokens"] == [2, None, 0]
    assert rep["n_dup_tokens"] == [1, None, 0]
    gop = gopher_stats(b).to_pydict()
    assert gop["n_words"] == [3, None, 0]
    assert gop["keep"] == [False, None, False]


from lopez_ray.pipelines.queries import (  # noqa: E402
    _funnel_partition,
    _pivot_partition,
    _retention_partition,
)

PARTIAL_EVENTS = st.lists(
    st.tuples(
        USER,
        st.sampled_from(["view", "click", "purchase", "signup", "error"]),
        st.integers(min_value=0, max_value=200),  # small ts space → ties
        st.integers(min_value=1, max_value=3),  # partial count
    ),
    min_size=1,
    max_size=50,
)


@given(rows=PARTIAL_EVENTS)
@_SETTINGS
def test_funnel_partition_equals_bruteforce(rows):
    g = pd.DataFrame(
        {
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "event_type": [r[1] for r in rows],
            "ts_us_min": np.array([r[2] for r in rows], dtype=np.int64),
        }
    )
    g = g[g["event_type"].isin(["view", "click", "purchase"])]
    if not len(g):
        return
    got = sorted(map(tuple, _funnel_partition(g).to_numpy().tolist()))
    want = []
    for u in sorted(set(g["user_id"])):
        rows_u = g[g["user_id"] == u]
        firsts = {}
        for st_ in ["view", "click", "purchase"]:
            sub = rows_u[rows_u["event_type"] == st_]
            firsts[st_] = int(sub["ts_us_min"].min()) if len(sub) else -1
        done = (
            firsts["view"] >= 0
            and firsts["click"] > firsts["view"]
            and firsts["purchase"] > firsts["click"]
        )
        want.append(
            (int(u), firsts["view"], firsts["click"], firsts["purchase"], done)
        )
    assert got == sorted(want)


@given(rows=PARTIAL_EVENTS)
@_SETTINGS
def test_pivot_partition_equals_bruteforce(rows):
    g = pd.DataFrame(
        {
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "event_type": [r[1] for r in rows],
            "n_sum": np.array([r[3] for r in rows], dtype=np.int64),
        }
    )
    got = sorted(map(tuple, _pivot_partition(g).to_numpy().tolist()))
    want = []
    for u in sorted(set(g["user_id"])):
        rows_u = g[g["user_id"] == u]
        counts = tuple(
            int(rows_u.loc[rows_u["event_type"] == ty, "n_sum"].sum())
            for ty in ["click", "error", "purchase", "signup", "view"]
        )
        want.append((int(u),) + counts)
    assert got == sorted(want)


ACTIVITY = st.lists(
    st.tuples(USER, st.integers(min_value=0, max_value=20)),
    min_size=1,
    max_size=60,
)


@given(rows=ACTIVITY)
@_SETTINGS
def test_retention_partition_equals_bruteforce(rows):
    g = pd.DataFrame(
        {
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "day": np.array([r[1] for r in rows], dtype=np.int64),
        }
    )
    got = sorted(map(tuple, _retention_partition(g).to_numpy().tolist()))
    act = set(map(tuple, g.to_numpy().tolist()))
    want = {}
    for u, d in act:
        na, nr = want.get(d, (0, 0))
        want[d] = (na + 1, nr + (1 if (u, d + 7) in act else 0))
    want_rows = sorted((d, na, nr) for d, (na, nr) in want.items())
    assert got == want_rows
