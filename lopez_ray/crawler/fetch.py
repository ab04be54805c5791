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


class FetchStage:
    """Callable class for ``map_batches(..., concurrency=N)``; state
    (robots cache, corpus index, politeness clocks) built once per actor."""

    def __init__(
        self,
        web_ref,
        robots_ref,
        corpus_path: str | None,
        max_hits_per_sec: float = 2.5,
        request_timeout: float = 60.0,
        user_agent: str = "lopez",
        enforce_politeness: bool = True,
    ):
        # Args may arrive as ObjectRefs (when nested in structures) or
        # already resolved (Ray auto-derefs top-level task/actor args).
        def _resolve(x):
            if x is None:
                return {}
            return ray.get(x) if isinstance(x, ray.ObjectRef) else x

        self.web: dict = _resolve(web_ref)
        self.robots_map: dict = _resolve(robots_ref)
        self.agent = user_agent
        self.max_hits_per_sec = max_hits_per_sec
        self.request_timeout = request_timeout
        self.enforce_politeness = enforce_politeness
        self.robots_cache: dict[str, RobotExclusion | None] = {}
        self.last_hit: dict[str, float] = {}
        if corpus_path:
            self.corpus = pq.read_table(
                corpus_path, columns=["image_id", "bytes", "fmt", "w", "h", "caption", "phash"],
                memory_map=True,
            )
            ids = self.corpus["image_id"].to_pylist()
            self.corpus_index = {u: i for i, u in enumerate(ids)}
        else:
            self.corpus = None
            self.corpus_index = {}

    def fetch(self, batch: pa.Table) -> pa.Table:
        """Actor-method alias for direct per-partition calls (waves.py)."""
        return self(batch)

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
            time.sleep(nxt - now)
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
        for url in urls:
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
            self._polite_wait(host, delay)
            # The server never sees the fragment; the page keeps its
            # fragment-bearing identity (like the reference's hyper client).
            row = self.web.get(url.split("#", 1)[0])
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
                cap = None
                if image_id is not None and image_id in self.corpus_index:
                    idx = self.corpus_index[image_id]
                    cap = self.corpus["caption"][idx].as_py()
                else:
                    idx = -1
                html = render_page(url, row["links"], row["canonical"], cap, image_id)
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
                "bytes": pa.nulls(n, pa.binary()),
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
