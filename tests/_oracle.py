"""Single-process crawl oracle for end-to-end parity tests.

Independently re-implements the wave-synchronous crawl semantics with the
frontier ordering delegated to DuckDB running the *actual* fetch.sql window
query (postgres-lopez/src/sql/fetch.sql:1-40) over a status DataFrame —
so the engine's sharded per-host candidate selection is validated against
the SQL the reference executes. Per-page functions (HTML render/parse,
clean_links, robots) are the unit-tested shared building blocks; what this
oracle cross-checks is the distributed orchestration: emission order,
first-wins dedup/merge, status transitions, quota handling.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from lopez_ray.crawler.fetch import robots_for_host
from lopez_ray.crawler.urls import BadLink, checked_join, host_of
from lopez_ray.dsl.directives import Directives
from lopez_ray.fixtures.gen import render_page
from lopez_ray.hash import page_id as pid_of
from lopez_ray.html.cssselect import compile_selector
from lopez_ray.html.dom import parse_html

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
    """quota_schedule: cumulative quota checkpoints modelling run+resume
    segments — between segments the reference's reset_queue flips
    taken|error → open (sql/reset_queue.sql), so reopened errors compete
    for quota again. Default: one segment at the directives quota."""
    d = Directives.from_source(directives_source)
    boundaries = d.boundaries()
    params = d.parameters()

    status: dict[int, dict] = {}
    order: list[tuple[int, str, int]] = []  # (seq, url, depth)

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
            con, status, order, web_map, robots_map, boundaries, params,
            batch_size, remaining, seq_start=seq,
        )
        seq = len(order)
    return status, order


def _crawl_segment(
    con, status, order, web_map, robots_map, boundaries, params,
    batch_size, remaining, seq_start,
):
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
                links = [u for _r, u in boundaries.clean_links(url, raw)]
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
