"""Single-process crawl oracle (the independent cross-check engine).

Re-implements the wave-synchronous crawl semantics WITHOUT any of the
distributed machinery: frontier ordering is delegated to DuckDB running
the *actual* fetch.sql window query (reference
postgres-lopez/src/sql/fetch.sql:1-40) over a plain status DataFrame,
the merge is an in-process dict, and link edges / PageRank come from a
dense-matrix power iteration — so the Ray engine's sharded candidate
selection, first-wins merge, status transitions, edge harvest and
distributed rank pipeline are all validated against a second
implementation that shares only the per-page building blocks (HTML
parse, clean_links, robots — themselves pinned by unit vectors).

Used two ways:
- pytest e2e parity (tests/test_crawl_e2e.py) — full per-URL
  status/order equality at several quota/resume shapes;
- driver-visible DuckDB oracles: ``write_oracle_artifacts`` persists the
  sim's status + pagerank tables as parquet, and ``oracle_sql()`` in
  pipelines/queries.py returns ``read_parquet(...)`` SQL over them, so
  the crawl queries get rows+schema+hash checks like the relational
  ones.
"""

from __future__ import annotations

import numpy as np

from .fetch import robots_for_host
from .urls import BadLink, checked_join, host_of
from ..dsl.directives import Directives
from ..fixtures.gen import render_page
from ..hash import page_id as pid_of
from ..html.cssselect import compile_selector
from ..html.dom import parse_html

FETCH_SQL = """
with numbered as (
    select
        page_id, url, depth,
        count(*) over (
            partition by regexp_extract(url, '^https?://([^/]*)/', 1)
            order by depth
        ) as cnt
    from status
    where search_status = 'open' and depth <= ?
)
select page_id, url, depth from numbered
order by cnt, depth, page_id
limit ?
"""

_A = compile_selector("a[href]")
_CANON = compile_selector('link[rel="canonical"]')


def oracle_crawl(
    directives_source: str,
    web_map: dict,
    robots_map: dict,
    batch_size: int,
    quota_schedule: list[int] | None = None,
):
    """Returns (status, order, edges):
    - status: {page_id: {url, depth, search_status, status_code}}
    - order: [(seq, url, depth)] — global emission order
    - edges: [(from_pid, to_pid)] per cleaned ahref link occurrence on a
      fetched page (target-closedness is filtered post-hoc by callers).

    quota_schedule: cumulative quota checkpoints modelling run+resume
    segments — between segments the reference's reset_queue flips
    taken|error → open (sql/reset_queue.sql), so reopened errors compete
    for quota again. Default: one segment at the directives quota."""
    import duckdb

    d = Directives.from_source(directives_source)
    boundaries = d.boundaries()
    params = d.parameters()

    status: dict[int, dict] = {}
    order: list[tuple[int, str, int]] = []  # (seq, url, depth)
    edges: list[tuple[int, int]] = []

    def insert(url: str, depth: int) -> None:
        pid = pid_of(url)
        if pid not in status:
            status[pid] = {"url": url, "depth": depth, "search_status": "open", "status_code": None}

    for seed in d.seeds():
        insert(seed, 0)

    con = duckdb.connect()
    seq = 0
    if quota_schedule is None:
        quota_schedule = [params.quota]
    n_sent = 0
    for target in quota_schedule:
        if n_sent > 0:
            # resume boundary: reset_queue reopens errors
            for rec in status.values():
                if rec["search_status"] in ("taken", "error"):
                    rec["search_status"] = "open"
        remaining = target - n_sent
        n_sent += _crawl_segment(
            con, status, order, edges, web_map, robots_map, boundaries, params,
            batch_size, remaining, seq_start=seq,
        )
        seq = len(order)
    return status, order, edges


def _crawl_segment(
    con, status, order, edges, web_map, robots_map, boundaries, params,
    batch_size, remaining, seq_start,
):
    import pandas as pd

    seq = seq_start
    sent = 0
    while remaining > 0:
        df = pd.DataFrame(
            [
                {"page_id": pid, "url": rec["url"], "depth": rec["depth"], "search_status": rec["search_status"]}
                for pid, rec in status.items()
            ]
        )
        con.register("status", df)
        budget = min(batch_size, remaining)
        batch = con.execute(FETCH_SQL, [params.max_depth, budget]).fetchall()
        if not batch:
            break
        staged: list[tuple[int, int, str]] = []  # (depth, pid, url)
        for pid, url, depth in batch:
            status[pid]["search_status"] = "taken"
            order.append((seq, url, depth))
            seq += 1
            rec = status[pid]
            host = host_of(url)
            robots = robots_for_host(robots_map, host, "lopez")
            if robots is not None and not robots.allows(url):
                rec["search_status"] = "error"
                continue
            row = web_map.get(url.split("#", 1)[0])
            if row is None:
                rec["search_status"] = "error"
                rec["status_code"] = 404
                continue
            if row["latency_ms"] > params.request_timeout * 1000.0:
                rec["search_status"] = "error"
                continue
            code = row["status_code"]
            rec["status_code"] = code
            links: list[str] = []
            if 300 <= code < 400:
                rec["search_status"] = "closed"
                loc = row["redirect_to"]
                if loc is not None and not boundaries.is_frontier(url):
                    try:
                        target = boundaries.clean_query_params(checked_join(url, loc))
                        if boundaries.is_allowed(target):
                            links = [target]
                    except BadLink:
                        pass
            elif code == 200:
                rec["search_status"] = "closed"
                html = render_page(url, row["links"], row["canonical"], "cap", row["image_id"])
                doc = parse_html(html)
                raw = [("ahref", el.attrs["href"]) for el in doc.select(_A)]
                raw += [("canonical", el.attrs.get("href", "")) for el in doc.select(_CANON)]
                cleaned = boundaries.clean_links(url, raw)
                links = [u for _r, u in cleaned]
                edges.extend(
                    (pid, pid_of(u)) for r, u in cleaned if r == "ahref"
                )
            else:
                rec["search_status"] = "closed"
            for link in links:
                staged.append((depth + 1, pid_of(link), link))
        # wave barrier: deterministic first-wins merge
        staged.sort(key=lambda t: (t[0], t[1]))
        for depth, pid, url in staged:
            if pid not in status:
                status[pid] = {
                    "url": url,
                    "depth": depth,
                    "search_status": "open",
                    "status_code": None,
                }
        remaining -= len(batch)
        sent += len(batch)
        con.unregister("status")
    return sent


def dense_pagerank(
    edges: list[tuple[int, int]],
    closed: set[int],
    iterations: int = 8,
    damping: float = 0.85,
) -> tuple[np.ndarray, np.ndarray]:
    """Closed→closed PageRank via an explicit dense column-stochastic
    matrix — a deliberately different formulation from the engine's
    scatter-add (crawler/pagerank.py) and its distributed groupby twin,
    so rank values cross-check the whole edge-harvest + iteration
    pipeline."""
    kept = [(f, t) for f, t in edges if f in closed and t in closed]
    if not kept:
        return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
    arr = np.array(kept, dtype=np.int64)
    nodes = np.unique(arr.reshape(-1))
    n = len(nodes)
    fi = np.searchsorted(nodes, arr[:, 0])
    ti = np.searchsorted(nodes, arr[:, 1])
    out_deg = np.bincount(fi, minlength=n).astype(np.float64)
    dangling = out_deg == 0
    m = np.zeros((n, n))
    np.add.at(m, (ti, fi), 1.0)
    m /= np.where(dangling, 1.0, out_deg)[None, :]
    state = np.full(n, 1.0 / n)
    for _ in range(iterations):
        lost = state[dangling].sum()
        state = damping * (m @ state) + (1.0 - damping + damping * lost) / n
    return nodes, state


def write_oracle_artifacts(
    directives_source: str,
    fixture_paths: dict,
    out_dir: str,
    batch_size: int,
) -> dict:
    """Run the sim once and persist its status + pagerank tables as
    parquet for read_parquet() driver oracles. Idempotent: keyed by the
    (deterministic) inputs, skipped when the files already exist."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    status_path = os.path.join(out_dir, "status.parquet")
    rank_path = os.path.join(out_dir, "pagerank.parquet")
    if os.path.exists(status_path) and os.path.exists(rank_path):
        return {"status": status_path, "pagerank": rank_path}

    web_map = {r["url"]: r for r in pq.read_table(fixture_paths["web"]).to_pylist()}
    robots_map = {
        r["host"]: r["robots_txt"]
        for r in pq.read_table(fixture_paths["robots"]).to_pylist()
        if r["robots_txt"] is not None
    }
    status, _order, edges = oracle_crawl(
        directives_source, web_map, robots_map, batch_size=batch_size
    )
    pids = sorted(status)
    table = pa.table(
        {
            "url": pa.array([status[p]["url"] for p in pids], pa.string()),
            "page_id": pa.array(pids, pa.int64()),
            "search_status": pa.array(
                [status[p]["search_status"] for p in pids], pa.string()
            ),
            "status_code": pa.array(
                [status[p]["status_code"] for p in pids], pa.int32()
            ),
            "depth": pa.array([status[p]["depth"] for p in pids], pa.int32()),
        }
    )
    closed = {p for p in pids if status[p]["search_status"] == "closed"}
    nodes, ranks = dense_pagerank(edges, closed)
    rank_table = pa.table(
        {
            "page_id": pa.array(nodes, pa.int64()),
            "rank": pa.array(np.round(ranks, 8), pa.float64()),
        }
    )
    for path, t in ((status_path, table), (rank_path, rank_table)):
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    return {"status": status_path, "pagerank": rank_path}
