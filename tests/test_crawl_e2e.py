"""End-to-end crawl parity: the Ray engine vs the single-process DuckDB
oracle (fetch.sql ordering + first-wins merge + status transitions), plus
the per-row payload invariants and resume-from-checkpoint."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from lopez_ray.fixtures.gen import generate

from _oracle import oracle_crawl

CONFIG = """
seed "https://host0.test/p/0";
seed "https://host1.test/p/0";
seed "https://host2.test/p/0";
allow "^https://host[0-9]+\\.test/";
disallow "/p/19$";
ignore param "utm_source";
use param *;
set quota = 150;
set max_hits_per_sec = 1000.0;
set max_depth = 7;
select head title { title: first(text); }
select a { n-links: count; }
select p[class="caption"] { caption: first(text pretty); }
"""


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("fix")
    return generate(str(d), tier="t1", seed=42)


@pytest.fixture(scope="module")
def fixture_maps(fixture_paths):
    web = {r["url"]: r for r in pq.read_table(fixture_paths["web"]).to_pylist()}
    robots = {
        r["host"]: r["robots_txt"]
        for r in pq.read_table(fixture_paths["robots"]).to_pylist()
        if r["robots_txt"] is not None
    }
    return web, robots


def run_job(fixture_paths, out_dir, quota=None, resume=False, batch_size=50):
    from lopez_ray.crawler.waves import CrawlJob

    src = CONFIG if quota is None else CONFIG.replace("set quota = 150;", f"set quota = {quota};")
    job = CrawlJob(
        src,
        web_path=fixture_paths["web"],
        corpus_path=fixture_paths["corpus"],
        robots_path=fixture_paths["robots"],
        out_dir=out_dir,
        n_shards=3,
        n_fetchers=2,
        batch_size=batch_size,
    )
    return job, job.run(resume=resume)


def read_waves(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "wave", "wave=*", "*.parquet")))
    tables = [pq.read_table(f) for f in files]
    import pyarrow as pa

    return pa.concat_tables(tables, promote_options="permissive")


def test_engine_matches_oracle(ray_session, fixture_paths, fixture_maps, tmp_path):
    web_map, robots_map = fixture_maps
    out_dir = str(tmp_path / "run1")
    _job, summary = run_job(fixture_paths, out_dir)
    assert summary["fetched"] == 150

    status_engine = pq.read_table(
        os.path.join(out_dir, "wave", "status.parquet")
    ).to_pylist()
    oracle_status, oracle_order = oracle_crawl(CONFIG, web_map, robots_map, batch_size=50)

    # 1. identical final URL-seen set
    engine_urls = {r["url"] for r in status_engine}
    oracle_urls = {rec["url"] for rec in oracle_status.values()}
    assert engine_urls == oracle_urls

    # 2. identical per-URL status + depth (+ code)
    engine_by_url = {r["url"]: r for r in status_engine}
    for pid, rec in oracle_status.items():
        e = engine_by_url[rec["url"]]
        assert e["page_id"] == pid
        assert e["search_status"] == rec["search_status"], rec["url"]
        assert e["depth"] == rec["depth"], rec["url"]
        assert e["status_code"] == rec["status_code"], rec["url"]

    # 3. identical crawl (emission) order
    waves = read_waves(out_dir)
    got = sorted(zip(waves["seq"].to_pylist(), waves["url"].to_pylist()))
    want = [(s, u) for s, u, _d in oracle_order]
    assert got == want

    # 4. per-row payload invariants: every decoded payload matched phash
    #    and caption (north rule)
    ph = [v for v in waves["phash_ok"].to_pylist() if v is not None]
    cm = [v for v in waves["caption_match"].to_pylist() if v is not None]
    assert ph and all(ph)
    assert cm and all(cm)

    # 5. analyses columns present and typed
    assert "rule.title" in waves.column_names
    titles = [t for t in waves["rule.title"].to_pylist() if t is not None]
    assert titles and all(t.startswith("Page https://") for t in titles)

    # 6. counters
    assert summary["completed"] + summary["errors"] == 150


def test_resume_matches_segmented_oracle(ray_session, fixture_paths, fixture_maps, tmp_path):
    """Run to quota 100, then resume to 150. The reference's reset_queue
    reopens error pages at the resume boundary (they compete for quota
    again), so the split run is compared against an oracle modelling the
    same segmented semantics — not against a one-shot run."""
    web_map, robots_map = fixture_maps
    out_b = str(tmp_path / "split")
    run_job(fixture_paths, out_b, quota=100)
    _job, summary_b = run_job(fixture_paths, out_b, quota=150, resume=True)
    assert summary_b["fetched"] == 50

    oracle_status, oracle_order = oracle_crawl(
        CONFIG, web_map, robots_map, batch_size=50, quota_schedule=[100, 150]
    )
    sb = pq.read_table(os.path.join(out_b, "wave", "status.parquet")).to_pylist()
    engine_by_url = {r["url"]: r for r in sb}
    assert set(engine_by_url) == {rec["url"] for rec in oracle_status.values()}
    for pid, rec in oracle_status.items():
        e = engine_by_url[rec["url"]]
        assert (e["search_status"], e["depth"]) == (
            rec["search_status"],
            rec["depth"],
        ), rec["url"]
    # emission order across both segments matches
    waves = read_waves(out_b)
    got = sorted(zip(waves["seq"].to_pylist(), waves["url"].to_pylist()))
    want = [(s, u) for s, u, _d in oracle_order]
    assert got == want


def test_crawl_to_exhaustion_and_pagerank(ray_session, fixture_paths, tmp_path):
    out_dir = str(tmp_path / "full")
    src = CONFIG.replace("set quota = 150;", "set quota = 100000;")
    from lopez_ray.crawler.waves import CrawlJob

    job = CrawlJob(
        src,
        web_path=fixture_paths["web"],
        corpus_path=fixture_paths["corpus"],
        robots_path=fixture_paths["robots"],
        out_dir=out_dir,
        n_shards=3,
        n_fetchers=2,
        batch_size=64,
    )
    summary = job.run()
    # frontier drained: every discovered page completed or errored
    assert summary["completed"] + summary["errors"] == summary["discovered"]
    # robots_denied counter fired (host0 /private/ links hit robots rules)
    assert summary.get("robots_denied", 0) > 0

    # PageRank over harvested ahref edges between closed pages
    import numpy as np

    from lopez_ray.crawler.pagerank import power_iteration
    from lopez_ray.hash import page_id as pid_of

    waves = read_waves(out_dir)
    closed = {
        r["page_id"]
        for r in pq.read_table(os.path.join(out_dir, "wave", "status.parquet")).to_pylist()
        if r["search_status"] == "closed"
    }
    edges = []
    for row in waves.to_pylist():
        for url, reason in zip(row["link_urls"], row["link_reasons"]):
            if reason == "ahref" and row["page_id"] in closed and pid_of(url) in closed:
                edges.append((row["page_id"], pid_of(url)))
    nodes, ranks = power_iteration(np.array(edges, dtype=np.int64))
    assert len(nodes) > 50
    assert abs(ranks.sum() - 1.0) < 0.05  # stochastic-ish up to lost mass
    assert (ranks > 0).all()


def test_fused_fetch_analyze_matches_split(ray_session, fixture_paths, tmp_path):
    """LOPEZ_FUSE_ANALYZE path (fetch->analyze->push inside the fetch
    actor, payload never enters plasma) must be output-identical to the
    split path: same status table, same wave rows, same analyses."""
    from lopez_ray.crawler.waves import CrawlJob

    outs = {}
    for name, fuse in (("split", False), ("fused", True)):
        out_dir = str(tmp_path / name)
        job = CrawlJob(
            CONFIG,
            web_path=fixture_paths["web"],
            corpus_path=fixture_paths["corpus"],
            robots_path=fixture_paths["robots"],
            out_dir=out_dir,
            n_shards=3,
            n_fetchers=2,
            batch_size=50,
            fuse_analyze=fuse,
        )
        summary = job.run()
        status = pq.read_table(os.path.join(out_dir, "wave", "status.parquet"))
        waves = read_waves(out_dir)
        outs[name] = (summary, status, waves)

    s0, st0, w0 = outs["split"]
    s1, st1, w1 = outs["fused"]
    timing = {"elapsed_sec", "urls_per_sec", "phase_sec"}
    assert {k: v for k, v in s0.items() if k not in timing} == {
        k: v for k, v in s1.items() if k not in timing
    }
    key = st0.column_names
    assert sorted(map(tuple, st0.to_pylist()), key=str) == sorted(
        map(tuple, st1.to_pylist()), key=str
    )
    assert w0.column_names == w1.column_names
    rows0 = sorted(w0.to_pylist(), key=lambda r: r["seq"])
    rows1 = sorted(w1.to_pylist(), key=lambda r: r["seq"])
    assert rows0 == rows1
