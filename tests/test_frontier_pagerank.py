"""Frontier shard semantics (fetch.sql ordering, first-wins merge,
reset_queue, checkpoint) and PageRank (numpy vs reference semantics,
plus equivalence of the distributed Ray Data variant)."""

import numpy as np
import pytest

from lopez_ray.crawler.frontier import FrontierShard
from lopez_ray.crawler.pagerank import power_iteration
from lopez_ray.hash import page_id as pid_of
from lopez_ray.state.cuckoo import CuckooFilter


def test_cuckoo_filter_basics():
    f = CuckooFilter(10_000)
    keys = [pid_of(f"https://x.test/{i}") & 0xFFFFFFFFFFFFFFFF for i in range(5000)]
    for k in keys:
        assert f.add_hash(k)
    assert all(f.contains_hash(k) for k in keys)  # no false negatives
    other = [pid_of(f"https://y.test/{i}") & 0xFFFFFFFFFFFFFFFF for i in range(5000)]
    fp = sum(f.contains_hash(k) for k in other) / len(other)
    assert fp < 0.05  # ~3% expected


def test_frontier_ordering_matches_fetch_sql():
    """count = # open pages in domain with depth <= row depth (peers
    included), order by (count, depth, page_id)."""
    s = FrontierShard(0, 1)
    # domain a: three pages at depth 0 → each count=3
    for i in range(3):
        s.stage([(f"https://a.test/{i}", 0)])
    # domain b: one page depth 2 → count=1 (comes first!)
    s.stage([("https://b.test/only", 2)])
    # domain c: depth 0 and depth 1 → counts 1 and 2
    s.stage([("https://c.test/0", 0), ("https://c.test/1", 1)])
    s.commit_wave(0)
    cands = s.candidates(10, max_depth=7)
    counts = [c[0] for c in cands]
    assert counts == sorted(counts)
    # first candidates are the count-1 rows: c.test/0 (depth 0) then b (depth 2)
    assert cands[0][3] == "https://c.test/0"
    assert cands[1][3] == "https://b.test/only"
    assert cands[2][0] == 2 and cands[2][3] == "https://c.test/1"
    # remaining three all count=3, ordered by page_id
    tail = cands[3:]
    assert all(c[0] == 3 for c in tail)
    assert [c[2] for c in tail] == sorted(c[2] for c in tail)


def test_frontier_first_wins_and_dedup():
    s = FrontierShard(0, 1)
    s.stage([("https://a.test/x", 5), ("https://a.test/x", 2)])
    s.commit_wave(0)
    # min depth wins within a wave (sorted commit)
    (cand,) = s.candidates(10, 7)
    assert cand[1] == 2
    # later waves can't lower the depth (first-discovery wins)
    s.stage([("https://a.test/x", 0)])
    s.commit_wave(1)
    (cand,) = s.candidates(10, 7)
    assert cand[1] == 2
    assert s.counters["deduped"] >= 1


def test_frontier_take_complete_reset(tmp_path):
    s = FrontierShard(0, 1)
    s.seed(["https://a.test/1", "https://a.test/2"])
    cands = s.candidates(1, 7)
    pid = cands[0][2]
    s.take([pid])
    assert s.taken_count() == 1
    assert s.open_count(7) == 1
    s.complete([(pid, "error", None, "timed_out")])
    assert s.counters["errors"] == 1 and s.counters["timed_out"] == 1
    # reset_queue reopens errors (crash recovery semantics)
    assert s.reset_queue() == 1
    assert s.open_count(7) == 2
    # checkpoint / restore roundtrip
    s.checkpoint(str(tmp_path))
    s2 = FrontierShard(0, 1)
    assert s2.restore(str(tmp_path))
    assert s2.status_rows() == s.status_rows()
    assert s2.candidates(10, 7) == s.candidates(10, 7)


def _random_graph(n=200, m=1000, seed=3):
    r = np.random.default_rng(seed)
    edges = r.integers(0, n, size=(m, 2)).astype(np.int64)
    return edges[edges[:, 0] != edges[:, 1]]


def test_power_iteration_properties():
    edges = _random_graph()
    nodes, ranks = power_iteration(edges, iterations=8)
    assert (ranks > 0).all()
    assert abs(ranks.sum() - 1.0) < 1e-6  # lost-mass redistribution conserves
    # a sink-heavy node should outrank an isolated-ish one
    star = np.array([[i, 0] for i in range(1, 50)], dtype=np.int64)
    nodes2, ranks2 = power_iteration(star)
    assert ranks2[nodes2 == 0][0] == ranks2.max()


def test_pagerank_ray_matches_numpy(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from lopez_ray.crawler.pagerank import pagerank_ray

    edges = _random_graph(n=100, m=400, seed=11)
    ds = rd.from_arrow(
        pa.table(
            {
                "from_id": pa.array(edges[:, 0], pa.int64()),
                "to_id": pa.array(edges[:, 1], pa.int64()),
            }
        )
    ).repartition(4)
    out = pagerank_ray(ds, iterations=5)
    nodes, ranks = power_iteration(edges, iterations=5)
    got = dict(zip(out["page_id"].to_pylist(), out["rank"].to_pylist()))
    for n_, r_ in zip(nodes, ranks):
        assert got[int(n_)] == pytest.approx(float(r_), rel=1e-9)


def test_candidates_url_free_and_take_with_urls():
    """Wave-merge wire contract (waves.py _fetch_batch): candidate
    tables ship WITHOUT url strings; the driver pulls urls only for the
    selected winners via take_with_urls, which also marks them taken."""
    s = FrontierShard(0, 1)
    urls = [f"https://a.test/{i}" for i in range(6)]
    s.seed(urls)
    t = s.commit_then_candidates(-1, 10, 7)
    assert "url" not in t.column_names  # url-free wire format
    assert set(t.column_names) == {"count", "depth", "page_id", "host_hash"}
    pids = t["page_id"].to_pylist()[:3]
    out = s.take_with_urls(pids)
    # urls come back aligned to the requested page ids, and the rows
    # are now taken (a second candidates pull excludes them)
    got = dict(zip(out["page_id"].to_pylist(), out["url"].to_pylist()))
    assert set(got) == set(pids)
    assert all(u in urls for u in got.values())
    assert s.taken_count() == 3
    t2 = s.candidates_table(10, 7)
    assert set(t2["page_id"].to_pylist()).isdisjoint(pids)
    # with_urls variant still carries urls (single-URL CLI path)
    assert "url" in t2.column_names
