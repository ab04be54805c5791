"""Sharded URL frontier — the engine's only custom distributed state.

Each shard is a Ray actor owning a disjoint set of hosts
(``shard_id = page_hash(host) % n_shards``), holding:

- a cuckoo-filter pre-filter + exact page store (URL-seen set with
  open/taken/closed/error status, mirroring the reference's ``status``
  table state machine, postgres migrations init/up.sql);
- per-host open sets feeding the batch selection;
- staged per-wave link deltas, committed deterministically at the wave
  barrier (first-wins like ``on conflict do nothing``,
  postgres-lopez/src/worker.rs:58-108, but applied in sorted
  (depth, page_id) order so runs are reproducible);
- counters (discovered, deduped, completed, errors) with per-wave lineage.

Batch selection reproduces ``fetch.sql`` (postgres-lopez/src/sql/
fetch.sql:1-40): for every open page, ``count`` = number of open pages in
the same domain with depth <= its depth (the SQL window ``count(*) over
(partition by domain order by depth)`` in RANGE mode counts peers), then
order by (count, depth) limit B — ties broken by page_id for determinism
(the SQL leaves them unspecified). Domains never span shards, so the
shard-local top-B union contains the global top-B exactly.
"""

from __future__ import annotations

import os
import pickle
from collections import defaultdict
from heapq import nsmallest

import numpy as np
import pyarrow as pa

from ..hash import page_id as page_id_of
from ..state.cuckoo import CuckooFilter
from .urls import host_of

CANDIDATE_SCHEMA = pa.schema(
    [
        ("count", pa.int64()),
        ("depth", pa.int32()),
        ("page_id", pa.int64()),
        ("url", pa.large_utf8()),
        ("host_hash", pa.int64()),
    ]
)

OPEN, TAKEN, CLOSED, ERROR = "open", "taken", "closed", "error"


def shard_of(host: str, n_shards: int) -> int:
    return page_id_of(host) % n_shards


class FrontierShard:
    """Plain class; wrapped with ray.remote by the driver (waves.py)."""

    def __init__(self, shard_id: int, n_shards: int, filter_capacity: int = 1 << 21):
        self.shard_id = shard_id
        self.n_shards = n_shards
        # page_id -> [url, depth, status, status_code, host]
        self.pages: dict[int, list] = {}
        self.open_by_host: dict[str, dict[int, int]] = defaultdict(dict)
        self.prefilter = CuckooFilter(filter_capacity)
        # (depth, url, page_id, host) deltas staged during the wave
        self.staged: list[tuple[int, str, int, str]] = []
        self.counters: dict[str, int] = defaultdict(int)
        self.wave_log: list[dict] = []  # per-wave lineage

    # ----- seeding / merging -----

    def _insert_new(self, pid: int, url: str, depth: int, host: str | None = None) -> bool:
        if pid in self.pages:
            self.counters["deduped"] += 1
            return False
        if host is None:
            host = host_of(url)
        self.pages[pid] = [url, depth, OPEN, None, host]
        self.open_by_host[host][pid] = depth
        self.prefilter.add_hash(pid & 0xFFFFFFFFFFFFFFFF)
        self.counters["discovered"] += 1
        return True

    def seed(self, urls: list[str]) -> int:
        n = 0
        for url in urls:
            if self._insert_new(page_id_of(url), url, 0):
                n += 1
        return n

    def stage(self, rows: list[tuple[str, int]]) -> None:
        """Stage (url, depth) link deltas (scalar tuple path, kept for
        tests/small callers; hashes computed here)."""
        if not rows:
            return
        urls = [u for u, _ in rows]
        depths = np.fromiter((d for _, d in rows), np.int64, len(rows))
        from ..hash import page_ids

        self.stage_batch(urls, depths, page_ids(urls), None)

    def stage_batch(self, urls: list[str], depths, pids, hosts) -> None:
        """Vectorized staging: pids precomputed by the push stage (one
        numpy SipHash pass per wave batch instead of a Python hash per
        link), definite-new answered by the cuckoo filter in bulk."""
        pids = np.asarray(pids, np.int64)
        maybe = self.prefilter.contains_many(pids.view(np.uint64))
        pages = self.pages
        staged = self.staged
        dup = 0
        for k in range(len(urls)):
            pid = int(pids[k])
            if maybe[k] and pid in pages:
                dup += 1
                continue
            staged.append(
                (int(depths[k]), urls[k], pid, hosts[k] if hosts is not None else None)
            )
        self.counters["deduped"] += dup

    def commit_wave(self, wave: int) -> dict:
        """Apply staged deltas deterministically: sorted by (depth,
        page_id); first occurrence of a page wins (first-discovery depth,
        `on conflict do nothing` semantics)."""
        self.staged.sort(key=lambda t: (t[0], t[2]))
        added = 0
        for depth, url, pid, host in self.staged:
            if self._insert_new(pid, url, depth, host):
                added += 1
        self.staged.clear()
        entry = {
            "wave": wave,
            "added": added,
            "open": sum(len(v) for v in self.open_by_host.values()),
            **{k: int(v) for k, v in self.counters.items()},
        }
        self.wave_log.append(entry)
        return entry

    def commit_then_candidates(
        self, wave: int, limit: int, max_depth: int
    ) -> pa.Table:
        """Fused wave barrier: apply the previous wave's staged deltas,
        then return this shard's candidate table — ONE actor round-trip
        per shard per wave instead of two sequential driver barriers
        (commit … then candidates was ~2 RTT + two ray.get fan-ins on
        the serial path that caps scaling efficiency). ``wave < 0``
        skips the commit (first wave / fresh resume). URLs are NOT
        included — the driver pulls urls for the global winners only
        (``take_with_urls``), so the merge transfer is 32 B/candidate
        instead of shipping n_shards×B url strings every wave."""
        if wave >= 0:
            self.commit_wave(wave)
        return self.candidates_table(limit, max_depth, with_urls=False)

    # ----- batch selection (fetch.sql) -----

    def candidates(self, limit: int, max_depth: int) -> list[tuple[int, int, int, str]]:
        """Shard-local top-`limit` open pages as (count, depth, page_id,
        url) under the fetch.sql comparator. Does not mark taken."""
        entries: list[tuple[int, int, int, str]] = []
        for host, opens in self.open_by_host.items():
            if not opens:
                continue
            eligible = [(d, pid) for pid, d in opens.items() if d <= max_depth]
            if not eligible:
                continue
            eligible.sort()
            depths = [d for d, _ in eligible]
            # count for row i = # rows with depth <= depths[i] (peers incl.)
            n = len(depths)
            j = 0
            counts = [0] * n
            for i in range(n):
                while j < n and depths[j] <= depths[i]:
                    j += 1
                counts[i] = j
            for i, (d, pid) in enumerate(eligible):
                entries.append((counts[i], d, pid, self.pages[pid][0]))
        return nsmallest(limit, entries)

    def candidates_table(
        self, limit: int, max_depth: int, with_urls: bool = True
    ) -> pa.Table:
        """Vectorized ``candidates``: same comparator ((count, depth,
        page_id) via np.lexsort ≡ nsmallest over tuples), returned as an
        Arrow table with the cached host hash so the driver's merge,
        take-routing, and fetcher partitioning are all numpy ops instead
        of Python tuple churn (the per-wave driver serial path is what
        caps scaling efficiency)."""
        counts: list[np.ndarray] = []
        depths: list[np.ndarray] = []
        pids: list[np.ndarray] = []
        urls: list[str] = []
        hhs: list[np.ndarray] = []
        if not hasattr(self, "_host_hash"):
            self._host_hash: dict[str, int] = {}
        for host, opens in self.open_by_host.items():
            if not opens:
                continue
            eligible = [(d, pid) for pid, d in opens.items() if d <= max_depth]
            if not eligible:
                continue
            eligible.sort()
            d_arr = np.fromiter((d for d, _ in eligible), np.int32, len(eligible))
            p_arr = np.fromiter((p for _, p in eligible), np.int64, len(eligible))
            c_arr = np.searchsorted(d_arr, d_arr, side="right").astype(np.int64)
            hh = self._host_hash.get(host)
            if hh is None:
                hh = self._host_hash[host] = page_id_of(host)
            counts.append(c_arr)
            depths.append(d_arr)
            pids.append(p_arr)
            if with_urls:
                urls.extend(self.pages[p][0] for p in p_arr)
            hhs.append(np.full(len(eligible), hh, np.int64))
        if not pids:
            schema = (
                CANDIDATE_SCHEMA
                if with_urls
                else pa.schema([f for f in CANDIDATE_SCHEMA if f.name != "url"])
            )
            return schema.empty_table()
        cnt = np.concatenate(counts)
        dep = np.concatenate(depths)
        pid = np.concatenate(pids)
        hh_all = np.concatenate(hhs)
        order = np.lexsort((pid, dep, cnt))[:limit]
        cols = {
            "count": pa.array(cnt[order], pa.int64()),
            "depth": pa.array(dep[order], pa.int32()),
            "page_id": pa.array(pid[order], pa.int64()),
            "host_hash": pa.array(hh_all[order], pa.int64()),
        }
        if with_urls:
            url_arr = pa.array(urls, pa.large_utf8()).take(pa.array(order))
            cols = {
                "count": cols["count"],
                "depth": cols["depth"],
                "page_id": cols["page_id"],
                "url": url_arr,
                "host_hash": cols["host_hash"],
            }
        return pa.table(cols)

    def take(self, page_ids) -> None:
        for pid in page_ids:
            pid = int(pid)  # accept numpy arrays from the vectorized path
            rec = self.pages.get(pid)
            if rec is not None and rec[2] == OPEN:
                rec[2] = TAKEN
                self.open_by_host[rec[4]].pop(pid, None)

    def take_with_urls(self, page_ids) -> pa.Table:
        """``take`` + return (page_id, url) for the taken winners — the
        driver fetch-batch pulls url strings ONLY for the global top-B
        rows (candidates ship url-free; see commit_then_candidates)."""
        urls: list[str] = []
        pids_out: list[int] = []
        for pid in page_ids:
            pid = int(pid)
            rec = self.pages.get(pid)
            if rec is None:
                continue
            if rec[2] == OPEN:
                rec[2] = TAKEN
                self.open_by_host[rec[4]].pop(pid, None)
            pids_out.append(pid)
            urls.append(rec[0])
        return pa.table(
            {
                "page_id": pa.array(pids_out, pa.int64()),
                "url": pa.array(urls, pa.large_utf8()),
            }
        )

    # ----- completion -----

    def complete(self, results: list[tuple[int, str, int | None, str]]) -> None:
        """[(page_id, final_status, status_code, outcome)] — close or error
        taken pages (ensure_closed.sql / ensure_error.sql); outcome feeds
        the north-rule counters (robots_denied, timed_out, ...)."""
        for pid, status, code, outcome in results:
            rec = self.pages.get(pid)
            if rec is None:
                continue
            rec[2] = status
            rec[3] = code
            self.counters["completed" if status == CLOSED else "errors"] += 1
            if outcome in ("robots_denied", "timed_out", "not_found"):
                self.counters[outcome] += 1

    # ----- control -----

    def open_count(self, max_depth: int) -> int:
        return sum(
            1
            for opens in self.open_by_host.values()
            for d in opens.values()
            if d <= max_depth
        )

    def taken_count(self) -> int:
        return sum(1 for rec in self.pages.values() if rec[2] == TAKEN)

    def reset_queue(self) -> int:
        """reset_queue.sql: taken | error → open (crash recovery)."""
        n = 0
        for pid, rec in self.pages.items():
            if rec[2] in (TAKEN, ERROR):
                rec[2] = OPEN
                self.open_by_host[rec[4]][pid] = rec[1]
                n += 1
        return n

    def status_rows(self) -> list[tuple[str, int, str, int | None, int]]:
        return [
            (rec[0], pid, rec[2], rec[3], rec[1]) for pid, rec in self.pages.items()
        ]

    def write_status(self, directory: str) -> str:
        """Shard-local status write: each shard persists its own slice of
        the status table as ``<directory>/shard-K.parquet`` so the final
        crawl status never funnels through the driver (the full table is
        O(total URLs) — the first thing that dies at the 10^10-URL design
        point). Readers open the directory as one parquet dataset."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        urls, pids, statuses, codes, depths = [], [], [], [], []
        for pid, rec in self.pages.items():
            urls.append(rec[0])
            pids.append(pid)
            statuses.append(rec[2])
            codes.append(rec[3])
            depths.append(rec[1])
        table = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "page_id": pa.array(pids, pa.int64()),
                "search_status": pa.array(statuses, pa.string()),
                "status_code": pa.array(codes, pa.int32()),
                "depth": pa.array(depths, pa.int32()),
            }
        )
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"shard-{self.shard_id}.parquet")
        from ..sources.corpus import write_table

        write_table(table, path)
        return path

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "pages": len(self.pages),
            "open": self.open_count(10**9),
            **{k: int(v) for k, v in self.counters.items()},
        }

    def wave_lineage(self) -> list[dict]:
        return self.wave_log

    # ----- checkpoint / restore -----

    def checkpoint(self, directory: str) -> str:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"frontier-shard-{self.shard_id}.pkl")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(
                {
                    "shard_id": self.shard_id,
                    "n_shards": self.n_shards,
                    "pages": self.pages,
                    "open_by_host": dict(self.open_by_host),
                    "prefilter": self.prefilter.state(),
                    "counters": dict(self.counters),
                    "wave_log": self.wave_log,
                },
                f,
                protocol=pickle.HIGHEST_PROTOCOL,
            )
        os.replace(tmp, path)  # atomic per-shard checkpoint
        return path

    def restore(self, directory: str) -> bool:
        path = os.path.join(directory, f"frontier-shard-{self.shard_id}.pkl")
        if not os.path.exists(path):
            return False
        with open(path, "rb") as f:
            st = pickle.load(f)
        self.pages = st["pages"]
        self.open_by_host = defaultdict(dict, st["open_by_host"])
        self.prefilter = CuckooFilter.from_state(st["prefilter"])
        self.counters = defaultdict(int, st["counters"])
        self.wave_log = st["wave_log"]
        return True
