"""Fetch stage: actor-pool ``map_batches`` class simulating the downloader.

Stands in for the reference's downloader + per-origin machinery
(``crawler/downloader/mod.rs:72-161``, ``crawler/worker/origins.rs``):

- per-origin robots.txt resolution with walk-up-the-domain retry
  (robots.rs:124-179), cached per actor;
- politeness: ``crawl_delay = max(1/max_hits_per_sec, robots delay)``,
  serialized per host (origins.rs:37-67). Within a wave every URL of a
  host lands in one batch (host-hash partitioning), so same-host fetches
  are spaced by crawl_delay inside the actor; across waves the wave
  barrier provides the gap. Divergence from the per-thread reference is
  bounded by one crawl_delay at wave boundaries and documented here;
- outcomes mirror the ``Downloaded``/``Crawled`` enums: success(html) /
  bad_status / redirect / timed_out, plus robots_denied (the reference
  leaves robots-denied pages `taken` forever — crawl_task returns without
  storing, worker/mod.rs:314-317; we close them as `error` and count them
  so the crawl terminates; divergence documented);
- the synthetic "server" is the fixture web table (metadata broadcast
  once via ``ray.put``) + the image corpus parquet (opened memory-mapped
  per actor, payload bytes fetched by row index per batch — payloads are
  never broadcast, mirroring a real fetch-from-storage path).

The per-URL simulated latency drives only the timeout branch
(``latency_ms > request_timeout*1000`` → timed_out); it is not slept, so
benchmarks measure engine throughput, not arithmetic sleeps.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..fixtures.gen import render_page
from .robots import RobotExclusion, crawl_delay_for
from .urls import host_of

def robots_for_host(robots_map: dict, host: str, agent: str) -> RobotExclusion | None:
    """Walk-up-domain robots resolution (robots.rs:151-179): try the host,
    then strip leading labels until only a TLD would remain."""
    parts = host.split(".")
    while len(parts) >= 2:
        body = robots_map.get(".".join(parts))
        if body is not None:
            return RobotExclusion(body, agent)
        parts = parts[1:]
    return None


def _build_index(table: pa.Table | None, col: str):
    """(sorted_hashes, row_indices) for hash-searchsorted URL lookup."""
    if table is None:
        return None
    from ..hash import page_ids

    ids = page_ids(table[col].to_pylist())
    order = np.argsort(ids, kind="stable")
    return ids[order], order.astype(np.int64)


def _resolve_index(x):
    if x is None:
        return None
    return ray.get(x) if isinstance(x, ray.ObjectRef) else x


def _lookup(hidx, hashes: np.ndarray) -> np.ndarray:
    """Vectorized hash → row index; -1 for misses."""
    if hidx is None or len(hashes) == 0 or len(hidx[0]) == 0:
        return np.full(len(hashes), -1, dtype=np.int64)
    sorted_ids, row_idx = hidx
    pos = np.searchsorted(sorted_ids, hashes)
    pos = np.minimum(pos, len(sorted_ids) - 1)
    hit = sorted_ids[pos] == hashes
    return np.where(hit, row_idx[pos], -1)


class FetchStage:
    """Callable class for ``map_batches(..., concurrency=N)``; state
    (robots cache, corpus index, politeness clocks) built once per actor."""

    def __init__(
        self,
        web_ref,
        robots_ref,
        corpus_ref=None,
        max_hits_per_sec: float = 2.5,
        request_timeout: float = 60.0,
        user_agent: str = "lopez",
        enforce_politeness: bool = True,
        web_index_ref=None,
        corpus_index_ref=None,
        max_body_size: int = 10_000_000,
        webdriver_patterns: list[str] | None = None,
        directives_source: str | None = None,
        shard_handles: list | None = None,
        n_shards: int = 0,
    ):
        # The web and corpus fixtures arrive as ObjectRefs to ARROW TABLES
        # put in plasma ONCE by the driver — every actor on a node then
        # maps the same shared buffers zero-copy. (An earlier version had
        # each actor read the corpus parquet privately: at 32 actors ×
        # 575 MB that was ~20 GB of redundant decompression inside the
        # timed crawl and made 32 CPUs run SLOWER than 8.) Per-actor state
        # is only the url→row-index dicts.
        def _resolve(x):
            if x is None:
                return None
            if isinstance(x, str):  # path convenience (CLI single-URL mode)
                x = pq.read_table(x)
            if isinstance(x, ray.ObjectRef):
                x = ray.get(x)
            # take() on multi-chunk tables is pathologically slow; the
            # driver pre-combines before plasma put (no-op then).
            if isinstance(x, pa.Table) and any(
                x[c].num_chunks > 1 for c in x.column_names
            ):
                x = x.combine_chunks()
            return x

        self.web: pa.Table = _resolve(web_ref)
        self.robots_map: dict = _resolve(robots_ref) or {}
        self.agent = user_agent
        self.max_hits_per_sec = max_hits_per_sec
        self.request_timeout = request_timeout
        self.max_body_size = max_body_size
        self.enforce_politeness = enforce_politeness
        self.robots_cache: dict[str, RobotExclusion | None] = {}
        self.last_hit: dict[str, float] = {}
        self.corpus = _resolve(corpus_ref)
        # URL → row-index as SORTED HASH ARRAYS, not dicts: a dict of 2M
        # url strings costs ~400 MB × n_actors; two int64 numpy arrays
        # cost 32 MB and (when driver-provided via plasma) are shared
        # zero-copy. Lookup = vectorized page_ids + searchsorted per
        # batch; 64-bit SipHash collisions are negligible at fixture
        # scales (and a miss only yields a 404-style not_found row).
        self.web_hidx = _resolve_index(web_index_ref)
        if self.web_hidx is None:
            self.web_hidx = _build_index(self.web, "url")
        self.corpus_hidx = _resolve_index(corpus_index_ref)
        if self.corpus_hidx is None:
            self.corpus_hidx = _build_index(self.corpus, "image_id")
        self._cap_arr = (
            self.corpus["caption"].combine_chunks()
            if self.corpus is not None
            else None
        )
        # Per-URL downloader routing (SelectiveDownloader,
        # directives/mod.rs:164-177): URLs matching a `use webdriver on`
        # pattern take the WebDriver protocol path. Compiled once per
        # actor; with no patterns the check is a single falsy test.
        from .webdriver import WebDriverSelector

        self.wd_selector = (
            WebDriverSelector(webdriver_patterns) if webdriver_patterns else None
        )
        # LOPEZ_WEBDRIVER_URL points the session leg at a REAL WebDriver
        # server (chromedriver/geckodriver) via HttpTransport; unset, the
        # fixture browser answers the protocol in-process.
        import os as _os

        self.webdriver_url = _os.environ.get("LOPEZ_WEBDRIVER_URL")
        # fused fetch→analyze→push wiring (see fetch_analyze): closures
        # built lazily on first use so the split path pays nothing
        self.directives_source = directives_source
        self.shard_handles = list(shard_handles) if shard_handles else None
        self.n_shards = n_shards
        self._fused_analyze = None

    def fetch(self, batch: pa.Table) -> pa.Table:
        """Actor-method alias for direct per-partition calls (waves.py)."""
        return self(batch)

    def fetch_analyze(self, batch: pa.Table):
        """FUSED fetch→analyze→push for one chunk, entirely inside this
        actor: the payload-bearing fetched table (html + image bytes, by
        far the wave's largest intermediate) never enters the object
        store — only the analyzed, payload-dropped output does. Halves
        plasma byte traffic per wave vs the split path (fetch actor
        return → plasma → _process_block task), which is the dominant
        shared-memory-bandwidth consumer capping 8→32 scaling on one
        box. Returns (analyzed table, row count); callers use
        ``.options(num_returns=2)`` and barrier on the tiny count so
        task failures surface before the wave commits (waves.py)."""
        if self._fused_analyze is None:
            if self.directives_source is None or self.shard_handles is None:
                raise RuntimeError(
                    "fetch_analyze requires directives_source + shard_handles "
                    "at actor construction"
                )
            # runtime import: waves.py imports this module at load time
            from .waves import _analyze_fn, _push_fn

            fn = _analyze_fn(self.directives_source)
            push = _push_fn(self.shard_handles, self.n_shards)
            self._fused_analyze = lambda t: push(fn(t))
        out = self._fused_analyze(self(batch))
        return out, out.num_rows

    def _robots(self, host: str) -> RobotExclusion | None:
        if host not in self.robots_cache:
            self.robots_cache[host] = robots_for_host(self.robots_map, host, self.agent)
        return self.robots_cache[host]

    def _polite_wait(self, host: str, delay: float) -> None:
        if not self.enforce_politeness or delay <= 0:
            return
        now = time.monotonic()
        nxt = self.last_hit.get(host, 0.0) + delay
        if nxt > now:
            # time.sleep() overshoots sub-millisecond waits by ~10×
            # (timer resolution), which made a hot host with a 0.1 ms
            # budget pay ~1 ms/URL — sleep only the coarse part and spin
            # the last millisecond so the enforced delay is exact.
            wait = nxt - now
            if wait > 0.002:
                time.sleep(wait - 0.001)
            while time.monotonic() < nxt:
                pass
            now = nxt
        self.last_hit[host] = now

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        page_ids = batch["page_id"].to_pylist()
        depths = batch["depth"].to_pylist()
        seqs = (
            batch["seq"].to_pylist() if "seq" in batch.column_names else [0] * len(urls)
        )

        out = {
            "url": urls,
            "page_id": page_ids,
            "depth": depths,
            "seq": seqs,
            "outcome": [],
            "status_code": [],
            "html": [],
            "redirect_to": [],
            "image_row": [],  # corpus row index or -1
        }
        # Batched row gather: one take() against the shared web table per
        # batch (the server never sees the fragment; the page keeps its
        # fragment-bearing identity, like the reference's hyper client).
        from ..hash import page_ids as _page_ids

        bases = [u.split("#", 1)[0] for u in urls]
        idxs = _lookup(self.web_hidx, _page_ids(bases)) if bases else []
        # Hot-host salting: when a host's wave share is split over k
        # owners, each owner spaces its hits by delay×k, so the host-wide
        # rate still respects the politeness ceiling (waves.py routing).
        salts = (
            batch["salt_k"].to_pylist()
            if "salt_k" in batch.column_names
            else [1] * len(urls)
        )
        need = sorted({int(i) for i in idxs if i >= 0})
        rowmap: dict[int, dict] = {}
        if need:
            taken_rows = self.web.take(pa.array(need, pa.int64())).to_pylist()
            rowmap = dict(zip(need, taken_rows))
        # corpus row per fetched web row, one vectorized hash pass
        corpus_of: dict[int, int] = {}
        if rowmap and self.corpus is not None:
            keys = [i for i, r in rowmap.items() if r["image_id"] is not None]
            if keys:
                crows = _lookup(
                    self.corpus_hidx,
                    _page_ids([rowmap[i]["image_id"] for i in keys]),
                )
                corpus_of = {k: int(c) for k, c in zip(keys, crows) if c >= 0}

        for pos, url in enumerate(urls):
            host = host_of(url)
            robots = self._robots(host)
            if robots is not None and not robots.allows(url):
                out["outcome"].append("robots_denied")
                out["status_code"].append(None)
                out["html"].append(None)
                out["redirect_to"].append(None)
                out["image_row"].append(-1)
                continue
            delay = crawl_delay_for(robots, self.max_hits_per_sec)
            self._polite_wait(host, delay * max(1, salts[pos]))
            row = rowmap.get(int(idxs[pos]))
            if row is None:
                out["outcome"].append("not_found")
                out["status_code"].append(404)
                out["html"].append(None)
                out["redirect_to"].append(None)
                out["image_row"].append(-1)
                continue
            if row["latency_ms"] > self.request_timeout * 1000.0:
                out["outcome"].append("timed_out")
                out["status_code"].append(None)
                out["html"].append(None)
                out["redirect_to"].append(None)
                out["image_row"].append(-1)
                continue
            code = row["status_code"]
            if 300 <= code < 400:
                out["outcome"].append("redirect")
                out["status_code"].append(code)
                out["html"].append(None)
                out["redirect_to"].append(row["redirect_to"])
                out["image_row"].append(-1)
            elif code == 200:
                image_id = row["image_id"]
                idx = corpus_of.get(int(idxs[pos]), -1)
                cap = self._cap_arr[idx].as_py() if idx >= 0 else None
                if self.wd_selector is not None and self.wd_selector.use_webdriver(url):
                    # WebDriver route: the REAL protocol client (session →
                    # goto → execute-async snapshot → quit) against the
                    # fixture browser; fresh transport per download like
                    # the reference (web_driver.rs:46-48). Note: the
                    # reference's webdriver path has NO max_body_size
                    # truncation (that lives in SimpleDownloader's body
                    # stream, mod.rs:114-135) — mirrored here.
                    from .webdriver import (
                        FixtureWebDriverTransport,
                        HttpTransport,
                        WebDriverDownloader,
                    )

                    if self.webdriver_url:
                        connect = lambda url=self.webdriver_url: HttpTransport(url)  # noqa: E731
                    else:
                        connect = lambda r=row, c=cap: FixtureWebDriverTransport(  # noqa: E731
                            lambda u, r=r, c=c: render_page(
                                u, r["links"], r["canonical"], c, r["image_id"]
                            )
                        )
                    dl = WebDriverDownloader(
                        connect=connect,
                        user_agent=self.agent,
                        direct_get=lambda _u, sc=code: (sc, None),
                    )
                    html = dl.download(url)["content"].decode("utf-8")
                else:
                    html = render_page(
                        url, row["links"], row["canonical"], cap, image_id
                    )
                    # max_body_size truncation (reference crawler/downloader/
                    # mod.rs:114-135: body bytes past the cap are cut, then
                    # the truncated buffer is decoded lossily) — a too-big
                    # page PARSES DIFFERENTLY, it doesn't error. Simple
                    # route only.
                    if len(html) * 4 > self.max_body_size:  # cheap UTF-8 bound
                        body = html.encode("utf-8")
                        if len(body) > self.max_body_size:
                            html = body[: self.max_body_size].decode("utf-8", "replace")
                out["outcome"].append("success")
                out["status_code"].append(code)
                out["html"].append(html)
                out["redirect_to"].append(None)
                out["image_row"].append(idx)
            else:
                out["outcome"].append("bad_status")
                out["status_code"].append(code)
                out["html"].append(None)
                out["redirect_to"].append(None)
                out["image_row"].append(-1)

        table = pa.table(
            {
                "url": pa.array(out["url"], pa.large_utf8()),
                "page_id": pa.array(out["page_id"], pa.int64()),
                "depth": pa.array(out["depth"], pa.int32()),
                "seq": pa.array(out["seq"], pa.int64()),
                "outcome": pa.array(out["outcome"], pa.string()),
                "status_code": pa.array(out["status_code"], pa.int32()),
                "html": pa.array(out["html"], pa.large_utf8()),
                "redirect_to": pa.array(out["redirect_to"], pa.string()),
                "image_row": pa.array(out["image_row"], pa.int32()),
            }
        )
        return self._attach_payload(table)

    def _attach_payload(self, table: pa.Table) -> pa.Table:
        """Fetch image payload columns by corpus row index (batched take —
        the only place payload bytes enter the pipeline)."""
        idx = table["image_row"].to_numpy(zero_copy_only=False)
        have = idx >= 0
        n = len(idx)
        if self.corpus is None or not have.any():
            empties = {
                "bytes": pa.nulls(n, pa.large_binary()),
                "fmt": pa.nulls(n, pa.string()),
                "w": pa.nulls(n, pa.int32()),
                "h": pa.nulls(n, pa.int32()),
                "caption": pa.nulls(n, pa.string()),
                "phash": pa.nulls(n, pa.int64()),
            }
            for k, v in empties.items():
                table = table.append_column(k, v)
            return table
        taken = self.corpus.take(pa.array(np.where(have, idx, 0), pa.int64()))
        mask = pa.array(~have)
        import pyarrow.compute as pc

        for col in ("bytes", "fmt", "w", "h", "caption", "phash"):
            vals = pc.if_else(mask, pa.nulls(n, taken[col].type), taken[col].combine_chunks())
            table = table.append_column(col, vals)
        return table
