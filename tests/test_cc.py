"""Connected-components stage tests: correctness vs a union-find
oracle on random graphs, the chain-shaped worst case the pointer
jumps exist for, and edge cases (empty input, self-loops, dupes)."""

import numpy as np
import pyarrow as pa
import pytest


def _uf_oracle(edges):
    """Union-find ground truth: node -> component min."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {v: find(v) for v in list(parent)}


def _run(edges, **kw):
    from lopez_ray.stages.cc import connected_components

    tbl = pa.table(
        {
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    out = connected_components(tbl, **kw).to_pandas()
    if out.empty:
        return {}
    return dict(zip(out["node"].astype(int), out["group_id"].astype(int)))


def test_cc_random_graph_matches_union_find(ray_session):
    rng = np.random.default_rng(11)
    # 400 nodes in a sparse random graph: a mix of singleton pairs,
    # mid-size components, and one big blob
    edges = [tuple(map(int, e)) for e in rng.integers(0, 400, size=(300, 2))]
    edges = [e for e in edges if e[0] != e[1]]
    got = _run(edges)
    want = _uf_oracle(edges)
    assert got == want


def test_cc_chain_converges_in_log_rounds(ray_session):
    # a 512-node path graph: naive min propagation needs ~512 rounds;
    # path halving must finish within max_rounds=16 (~log2 + slack)
    n = 512
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run(edges, max_rounds=16)
    assert set(got.values()) == {0}
    assert len(got) == n


def test_cc_handles_dupes_self_loops_and_reversed_edges(ray_session):
    edges = [(5, 3), (3, 5), (5, 5), (3, 5), (7, 7), (9, 8)]
    got = _run(edges)
    assert got == {3: 3, 5: 3, 7: 7, 8: 8, 9: 8}


def test_cc_empty_input(ray_session):
    got = _run([])
    assert got == {}


def test_dedup_groups_query_matches_duckdb(ray_session, tmp_path):
    """q_dedup_groups / q_dedup_keep vs their recursive-CTE oracle at
    sf0.001 — the same compare the driver runs (sorted columns, full
    value equality)."""
    import duckdb

    from lopez_ray.pipelines.queries import ORACLES, QUERIES

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    for name in ("dedup_groups", "dedup_keep"):
        got = (
            QUERIES[name](sf_dir)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        want = (
            con.execute(ORACLES[name])
            .df()
            .sort_values("doc_id", ignore_index=True)
        )
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)].astype(got.dtypes.to_dict())
        assert got.equals(want), name


def test_curate_neardup_matches_duckdb(ray_session):
    """Flagship near-dup curation vs its end-to-end SQL oracle (filter
    CTE + md5-reproduced minhash pair SQL + recursive closure)."""
    import duckdb

    from lopez_ray.pipelines.queries import ORACLES, QUERIES

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    got = (
        QUERIES["curate_neardup"](sf_dir)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = (
        con.execute(ORACLES["curate_neardup"])
        .df()
        .sort_values("doc_id", ignore_index=True)
    )
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(got.dtypes.to_dict())
    assert len(got) > 0
    assert got.equals(want)


def test_cc_escalated_ranges_match_union_find(ray_session, monkeypatch):
    """LOPEZ_PART_CAP_BYTES=1 forces the composite second-level range
    escalation (RE = R*k ranges); labels must equal the plain path."""
    rng = np.random.default_rng(23)
    edges = [tuple(map(int, e)) for e in rng.integers(0, 500, size=(400, 2))]
    edges += [(i, i + 1) for i in range(1000, 1040)]  # a chain component
    want = _uf_oracle(edges)
    plain = _run(edges, n_ranges=4)
    monkeypatch.setenv("LOPEZ_PART_CAP_BYTES", "1")
    esc = _run(edges, n_ranges=4)
    assert plain == want
    assert esc == want
