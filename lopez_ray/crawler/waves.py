"""The crawl wave loop — lopez's master loop re-expressed over Ray Data.

Reference: ``crawler/master.rs:114-183`` (fetch batch → sort → route →
dispatch → poll-done), re-shaped wave-synchronously (SURVEY.md §3.1):

  loop:
    1. frontier shards emit their local top-B candidates under the
       fetch.sql comparator; the driver merges to the global top-B and
       marks them taken (two-phase = fetch.sql's UPDATE...RETURNING);
    2. the wave batch becomes a Dataset with one Arrow block per
       host-hash partition; long-lived fetch actors (politeness clocks,
       robots caches, corpus index held across waves) fetch each
       partition — ``from_arrow_refs`` turns their outputs into blocks
       without copying through the driver;
    3. analyze runs as stateless ``map_batches`` tasks (per-process
       memoized Analyzer), link deltas and completions are pushed to the
       owning frontier shards from inside the final stage (synchronous
       actor calls, so stream completion implies delivery);
    4. the wave output (status + analyses + link list columns) streams to
       ``out_dir/wave=N/`` via write_parquet — one consumption, no
       driver materialization;
    5. at the barrier the shards commit staged deltas deterministically
       and checkpoint; quota/termination mirror master.rs:159-183.

Determinism: candidate order is total ((count, depth, page_id)); staged
merges commit sorted by (depth, page_id) with first-wins. Any reference
execution could have produced this order; ours always does.

Scale: nothing here materializes the corpus — payload bytes flow only
fetch-actor → analyze-task → (dropped before write). The frontier is
O(pages) per shard with cuckoo pre-filtering; wave size and shard/fetcher
counts are the scaling knobs (at 256 nodes: thousands of shards, wave
batches of millions, same code path).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..dsl.directives import Directives
from .analyze import AnalyzeStage
from .fetch import FetchStage
from .frontier import FrontierShard, shard_of
from .urls import host_of

_ANALYZE_CACHE: dict[int, AnalyzeStage] = {}


def _analyze_fn(directives_source: str):
    key = hash(directives_source)

    def fn(batch: pa.Table) -> pa.Table:
        stage = _ANALYZE_CACHE.get(key)
        if stage is None:
            stage = _ANALYZE_CACHE[key] = AnalyzeStage(directives_source)
        return stage(batch)

    return fn


@ray.remote(num_returns=2)
def _process_block(tbl: pa.Table, directives_source: str, shard_handles, n_shards: int):
    """Raw-task analyze+push for ONE fetched block: parse/select rules,
    then push link deltas + completions to the owning frontier shards
    (the push ray.get inside the task means a completed task implies
    its frontier messages have landed). Replaces the per-wave Ray Data
    pipeline — the streaming executor cost ~0.5-1 s of spin-up PER WAVE
    on the serial path that caps scaling efficiency; a plain task graph
    has none. The compiled AnalyzeStage is cached per worker process
    (module-global keyed by the directives source).

    Two returns: (analyzed table, row count). The driver barriers on
    ``ray.get`` of the COUNTS — a plain ``ray.wait`` barrier never
    raises, so a failed analyze/push task would otherwise be swallowed
    and the wave would commit on a diverged frontier; getting the tiny
    int surfaces the error before commit without shipping the table."""
    fn = _analyze_fn(directives_source)
    push = _push_fn(shard_handles, n_shards)
    out = push(fn(tbl))
    return out, out.num_rows


@ray.remote
def _write_wave_block(tbl: pa.Table, directory: str, index: int) -> str:
    """Async wave-output writer (format seam): runs OFF the wave
    barrier's critical path; the driver joins all pending writes before
    checkpoints and at crawl end so durability ordering is preserved."""
    from ..sources.corpus import write_block

    return write_block(tbl, directory, index)


def _push_fn(shard_handles: list, n_shards: int):
    """Final stage: push link deltas + completions to the owning shards.
    Synchronous (ray.get) so that full stream consumption implies all
    frontier messages have landed before the wave barrier.

    Everything is vectorized: link page-ids are one numpy SipHash pass,
    hosts one regex kernel, shard routing one modulo + argsort — the
    shards receive precomputed hashes so their serial work is dict/list
    ops only (a Python hash per link serialized the shards at xxl
    scale)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..hash import page_ids
    from .urls import hosts_of_batch

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        futures = []
        link_pid_col = None
        if n:
            page_hosts = hosts_of_batch(batch["url"])
            page_shards = page_ids(page_hosts) % n_shards
            pids = batch["page_id"].to_pylist()
            statuses = batch["final_status"].to_pylist()
            codes = batch["status_code"].to_pylist()
            outcomes = batch["outcome"].to_pylist()
            completions: dict[int, list] = defaultdict(list)
            for i in range(n):
                completions[int(page_shards[i])].append(
                    (pids[i], statuses[i], codes[i], outcomes[i])
                )

            links_col = batch["link_urls"]
            if isinstance(links_col, pa.ChunkedArray):
                links_col = links_col.combine_chunks()
            flat = pc.list_flatten(links_col)
            link_urls = flat.to_pylist()
            if link_urls:
                counts = pc.list_value_length(links_col).to_numpy(
                    zero_copy_only=False
                )
                depths = batch["depth"].to_numpy()
                link_depths = np.repeat(depths + 1, counts)
                link_pids = page_ids(link_urls)
                # Persist link target ids alongside the wave output so
                # edge harvesting (pagerank) never re-hashes URLs.
                offsets = np.zeros(n + 1, dtype=np.int32)
                np.cumsum(counts, out=offsets[1:])
                link_pid_col = pa.ListArray.from_arrays(
                    pa.array(offsets), pa.array(link_pids.view(np.int64))
                )
                link_hosts = hosts_of_batch(flat)
                link_shards = page_ids(link_hosts) % n_shards
                order = np.argsort(link_shards, kind="stable")
                bounds = np.flatnonzero(np.diff(link_shards[order])) + 1
                for grp in np.split(order, bounds):
                    s = int(link_shards[grp[0]])
                    futures.append(
                        shard_handles[s].stage_batch.remote(
                            [link_urls[i] for i in grp],
                            link_depths[grp],
                            link_pids[grp],
                            [link_hosts[i] for i in grp],
                        )
                    )
            futures += [
                shard_handles[s].complete.remote(rows)
                for s, rows in completions.items()
            ]
            ray.get(futures)
        # Payload bytes end here: drop before the write stage.
        if link_pid_col is None:
            link_pid_col = pa.nulls(n, pa.list_(pa.int64()))
        batch = batch.append_column("link_pids", link_pid_col)
        return batch.drop_columns(
            [c for c in ("html", "bytes") if c in batch.column_names]
        )

    return fn


class CrawlJob:
    def __init__(
        self,
        directives_source: str,
        web_path: str,
        corpus_path: str | None,
        robots_path: str | None,
        out_dir: str,
        wave_name: str = "wave",
        n_shards: int = 4,
        n_fetchers: int = 4,
        batch_size: int = 1024,
        max_quota: int | None = None,
        enforce_politeness: bool = True,
        checkpoint_every: int = 1,
        fetch_chunk_rows: int = 256,
        salt_threshold: int = 512,
        fuse_analyze: bool | None = None,
    ):
        self.directives_source = directives_source
        self.directives = Directives.from_source(directives_source)
        self.params = self.directives.parameters()
        self.web_path = web_path
        self.corpus_path = corpus_path
        self.robots_path = robots_path
        self.out_dir = out_dir
        self.wave_name = wave_name
        self.n_shards = n_shards
        self.n_fetchers = n_fetchers
        self.batch_size = batch_size
        self.max_quota = max_quota
        self.enforce_politeness = enforce_politeness
        self.checkpoint_every = checkpoint_every
        self.fetch_chunk_rows = fetch_chunk_rows
        self.salt_threshold = salt_threshold
        # Fused fetch→analyze→push (fetch.py:fetch_analyze): the payload
        # table never transits plasma. A/B-able via LOPEZ_FUSE_ANALYZE=0/1;
        # the trade is dynamic analyze load-balancing (split path spreads
        # analyze tasks over ALL cores regardless of fetch partition skew)
        # vs halved object-store byte traffic (fused).
        if fuse_analyze is None:
            fuse_analyze = os.environ.get("LOPEZ_FUSE_ANALYZE", "0") == "1"
        self.fuse_analyze = fuse_analyze
        self.wave_dir = os.path.join(out_dir, wave_name)
        self.ckpt_dir = os.path.join(self.wave_dir, "checkpoint")

    # ----- setup -----

    def _broadcast_fixture(self):
        """Read each fixture table ONCE and put the Arrow tables in the
        object store; every fetch actor maps the same plasma buffers
        zero-copy (never ship per-actor copies, never re-read parquet
        per actor — ray_guide broadcast pattern)."""
        # combine_chunks before put: pa.Table.take on a multi-chunk table
        # with a large binary column is ~400× slower than on a single
        # chunk (measured 0.45 s vs 1 ms for 256 rows of the xl corpus),
        # and take is the fetch hot path.
        from .fetch import _build_index

        web = pq.read_table(self.web_path).combine_chunks()
        robots_map = {}
        if self.robots_path and os.path.exists(self.robots_path):
            for row in pq.read_table(self.robots_path).to_pylist():
                if row["robots_txt"] is not None:
                    robots_map[row["host"]] = row["robots_txt"]
        corpus_ref = None
        corpus = None
        if self.corpus_path:
            corpus = pq.read_table(
                self.corpus_path,
                columns=["image_id", "bytes", "fmt", "w", "h", "caption", "phash"],
            )
            # 64-bit offsets: the xxl corpus payload column exceeds 2 GB,
            # which overflows binary's 32-bit offsets on combine/take.
            corpus = corpus.set_column(
                corpus.column_names.index("bytes"),
                "bytes",
                corpus["bytes"].cast(pa.large_binary()),
            )
            corpus = corpus.combine_chunks()
            corpus_ref = ray.put(corpus)
        # hash indexes computed ONCE on the driver, shared via plasma
        # (numpy arrays → zero-copy for every actor)
        web_index_ref = ray.put(_build_index(web, "url"))
        corpus_index_ref = (
            ray.put(_build_index(corpus, "image_id")) if corpus is not None else None
        )
        return (
            ray.put(web),
            ray.put(robots_map),
            corpus_ref,
            web_index_ref,
            corpus_index_ref,
        )

    def _spawn(self):
        ShardActor = ray.remote(num_cpus=0)(FrontierShard)
        self.shards = [
            ShardActor.remote(i, self.n_shards) for i in range(self.n_shards)
        ]
        (
            web_ref,
            robots_ref,
            corpus_ref,
            web_index_ref,
            corpus_index_ref,
        ) = self._broadcast_fixture()
        # Fractional CPU: fetch is a short per-wave burst (politeness
        # waits + dict lookups), not sustained compute; a small
        # reservation keeps (n_fetchers actors + Dataset map tasks)
        # schedulable in a 4-CPU test session and leaves most cores for
        # the analyze/decode tasks, which dominate wave CPU.
        FetchActor = ray.remote(num_cpus=0.25)(FetchStage)
        self.fetchers = [
            FetchActor.remote(
                web_ref,
                robots_ref,
                corpus_ref,
                max_hits_per_sec=self.params.max_hits_per_sec,
                request_timeout=self.params.request_timeout,
                user_agent="lopez",
                enforce_politeness=self.enforce_politeness,
                web_index_ref=web_index_ref,
                corpus_index_ref=corpus_index_ref,
                max_body_size=self.params.max_body_size,
                webdriver_patterns=self.directives.webdriver_patterns(),
                directives_source=(
                    self.directives_source if self.fuse_analyze else None
                ),
                shard_handles=self.shards if self.fuse_analyze else None,
                n_shards=self.n_shards,
            )
            for _ in range(self.n_fetchers)
        ]

    # ----- wave loop -----

    def run(self, resume: bool = False) -> dict:
        try:
            return self._run(resume)
        finally:
            self._shutdown()

    def _shutdown(self) -> None:
        """Release actors so their CPU reservations return to the pool
        (idle fetch actors would otherwise starve later pipelines)."""
        for a in getattr(self, "fetchers", []) + getattr(self, "shards", []):
            try:
                ray.kill(a)
            except Exception:
                pass
        self.fetchers, self.shards = [], []

    def _run(self, resume: bool = False) -> dict:
        ctx = rd.DataContext.get_current()
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
        import logging

        logging.getLogger("ray.data").setLevel(logging.WARNING)
        os.makedirs(self.wave_dir, exist_ok=True)
        self._spawn()
        restored = False
        if resume:
            flags = ray.get([s.restore.remote(self.ckpt_dir) for s in self.shards])
            restored = all(flags) and len(flags) > 0
        if restored:
            ray.get([s.reset_queue.remote() for s in self.shards])
        else:
            seeds = self.directives.seeds()
            by_shard = defaultdict(list)
            for u in seeds:
                by_shard[shard_of(host_of(u), self.n_shards)].append(u)
            ray.get(
                [self.shards[s].seed.remote(urls) for s, urls in by_shard.items()]
            )

        stats = ray.get([s.stats.remote() for s in self.shards])
        consumed = sum(s.get("completed", 0) + s.get("errors", 0) for s in stats)
        effective_quota = min(
            self.params.quota, self.max_quota if self.max_quota else 10**18
        )
        remaining_quota = max(0, effective_quota - consumed)

        self._seq = consumed  # global emission counter (crawl-order lineage)
        self._phase = defaultdict(float)  # wall per phase (perf lineage)
        self._pending_writes: list = []
        n_sent = 0
        wave = self._next_wave_index()
        uncommitted = -1  # wave whose staged deltas await commit
        t0 = time.monotonic()
        while remaining_quota - n_sent > 0:
            budget = min(self.batch_size, remaining_quota - n_sent)
            tp = time.monotonic()
            # fused barrier: commit of the PREVIOUS wave rides the same
            # actor round-trip as this wave's candidate pull (one RTT +
            # one fan-in instead of two on the serial path)
            batch = self._fetch_batch(budget, commit_wave=uncommitted)
            uncommitted = -1
            self._phase["candidates"] += time.monotonic() - tp
            if batch is None:
                break
            self._run_wave(wave, batch)
            n_sent += batch.num_rows
            uncommitted = wave
            if self.checkpoint_every and wave % self.checkpoint_every == 0:
                # durability ordering: staged deltas committed and all
                # wave files on disk BEFORE the checkpoint snapshots
                tp = time.monotonic()
                ray.get([s.commit_wave.remote(wave) for s in self.shards])
                uncommitted = -1
                self._phase["commit"] += time.monotonic() - tp
                ray.get(self._pending_writes)
                self._pending_writes.clear()
                ray.get([s.checkpoint.remote(self.ckpt_dir) for s in self.shards])
                self._write_manifest(wave, n_sent)
            wave += 1
        if uncommitted >= 0:
            tp = time.monotonic()
            ray.get([s.commit_wave.remote(uncommitted) for s in self.shards])
            self._phase["commit"] += time.monotonic() - tp
        ray.get(self._pending_writes)
        self._pending_writes.clear()
        elapsed = time.monotonic() - t0

        # Final authoritative status table + lineage. Each shard writes
        # its own slice under status.parquet/ (a parquet *directory* —
        # pq.read_table opens it transparently); the O(total-URLs) table
        # never transits the driver.
        status_dir = os.path.join(self.wave_dir, "status.parquet")
        ray.get([s.write_status.remote(status_dir) for s in self.shards])
        ray.get([s.checkpoint.remote(self.ckpt_dir) for s in self.shards])
        self._write_manifest(wave, n_sent, final=True)
        stats = ray.get([s.stats.remote() for s in self.shards])
        counters = defaultdict(int)
        for s in stats:
            for k, v in s.items():
                if k not in ("shard",):
                    counters[k] += v
        summary = {
            "waves": wave,
            "fetched": n_sent,
            "elapsed_sec": elapsed,
            "urls_per_sec": (n_sent / elapsed) if elapsed > 0 else 0.0,
            "phase_sec": {k: round(v, 2) for k, v in self._phase.items()},
            # termination cause (north-rule counter): True when the loop
            # stopped because the quota ran out with frontier work left,
            # False when the frontier drained first
            "quota_exhausted": bool(remaining_quota - n_sent <= 0),
            **{k: int(v) for k, v in counters.items()},
        }
        with open(os.path.join(self.wave_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        return summary

    def _fetch_batch(self, budget: int, commit_wave: int = -1):
        """Global top-`budget` under the fetch.sql comparator, as an Arrow
        table. Shards pre-sort locally (domains never span shards, so the
        union of shard-local top-B contains the global top-B); the driver
        merge is one np.lexsort over ≤ n_shards×B rows. ``commit_wave``
        ≥ 0 commits that wave's staged deltas in the same round-trip."""
        import numpy as np

        tables = ray.get(
            [
                s.commit_then_candidates.remote(
                    commit_wave, budget, self.params.max_depth
                )
                for s in self.shards
            ]
        )
        nonempty = [tb for tb in tables if tb.num_rows]
        if not nonempty:
            return None
        t = pa.concat_tables(nonempty)
        cnt = t["count"].to_numpy()
        dep = t["depth"].to_numpy()
        pid = t["page_id"].to_numpy()
        if len(pid) > budget * 2 and dep.max() < (1 << 16):
            # two-stage selection: O(n) argpartition on a packed
            # (count, depth) key prunes to ~budget rows (+ boundary
            # ties) before the exact lexsort — the full n_shards×B
            # lexsort was ~0.3-0.5 s of driver-serial per wave.
            # The 16-bit depth pack is guarded: a depth ≥ 2^16 (absurd
            # but configurable) falls through to the exact lexsort
            # instead of silently corrupting the comparator.
            packed = (cnt.astype(np.uint64) << np.uint64(16)) | dep.astype(
                np.uint64
            )
            kth = np.partition(packed, budget - 1)[budget - 1]
            keep = np.flatnonzero(packed <= kth)
            cnt, dep, pid = cnt[keep], dep[keep], pid[keep]
            t = t.take(pa.array(keep))
        order = np.lexsort((pid, dep, cnt))[:budget]
        sel = t.take(pa.array(order))
        hh = sel["host_hash"].to_numpy()
        pids = sel["page_id"].to_numpy()
        shard_idx = hh % self.n_shards
        futures = [
            self.shards[s].take_with_urls.remote(pids[shard_idx == s])
            for s in np.unique(shard_idx)
        ]
        url_tbl = pa.concat_tables(ray.get(futures))
        upid = url_tbl["page_id"].to_numpy()
        # loud join validation: a pid the shards did not return (a
        # routing or restore inconsistency) would otherwise searchsorted
        # onto a NEIGHBOR's slot and fetch the wrong URL under this
        # page_id with no error
        if len(upid) != len(pids):
            missing = sorted(set(map(int, pids)) - set(map(int, upid)))[:5]
            raise RuntimeError(
                f"frontier take/url mismatch: {len(pids)} selected, "
                f"{len(upid)} returned, missing~{missing}"
            )
        uorder = np.argsort(upid)
        pos = uorder[np.searchsorted(upid[uorder], pids)]
        if not np.array_equal(upid[pos], pids):
            raise RuntimeError("frontier take/url mismatch: pid sets differ")
        return sel.append_column("url", url_tbl["url"].take(pa.array(pos)))

    def _run_wave(self, wave: int, batch: pa.Table) -> None:
        import numpy as np

        tp = time.monotonic()
        n = batch.num_rows
        tbl = pa.table(
            {
                "url": batch["url"],
                "page_id": batch["page_id"],
                "depth": batch["depth"],
                "seq": pa.array(
                    np.arange(self._seq, self._seq + n, dtype=np.int64)
                ),
            }
        )
        self._seq += n
        # Host-affine fetcher routing (same key the reference's master
        # uses, crawler/master.rs:148), fully vectorized: slot = cached
        # host hash % n_fetchers; grouping via one stable argsort keeps
        # the comparator order within each fetcher partition.
        #
        # Hot-host salting (north rule / SURVEY §4): a host whose wave
        # share exceeds salt_threshold rows would serialize on one actor,
        # so its rows are spread over k = ceil(count/threshold) salted
        # slots (k ≤ n_fetchers); each salted owner enforces delay×k so
        # the aggregate per-host politeness rate still honors the global
        # ceiling. salt is page_id-derived → deterministic.
        hh = batch["host_hash"].to_numpy()
        pid = batch["page_id"].to_numpy()
        uniq, inv, cnts = np.unique(hh, return_inverse=True, return_counts=True)
        k_per_host = np.minimum(
            np.ceil(cnts / self.salt_threshold).astype(np.int64),
            self.n_fetchers,
        )
        k_row = k_per_host[inv]
        salt = np.where(k_row > 1, pid % k_row, 0)
        slot = (hh + salt) % self.n_fetchers
        tbl = tbl.append_column("salt_k", pa.array(k_row, pa.int32()))
        order = np.argsort(slot, kind="stable")
        bounds = np.flatnonzero(np.diff(slot[order])) + 1
        # One fetch CALL per ≤chunk_rows slice, all slices of a partition
        # on the SAME actor (serial per actor → per-host politeness clocks
        # stay exact) — but each call yields its own Arrow block, so the
        # analyze stage parallelizes across chunks instead of stalling on
        # one hot-host mega-block (observed 1.6 s straggler per wave when
        # the Zipf-hot host was a single block).
        # Adaptive chunk: small waves split fine for parallelism; huge
        # waves cap total call/task count at ~8 chunks per fetcher so
        # scheduler dispatch doesn't become the serial bottleneck.
        chunk = max(self.fetch_chunk_rows, n // (8 * self.n_fetchers) + 1)
        # ONE chunking pass for both dispatch modes (the fused and split
        # paths are contractually output-identical — keeping a single
        # copy of the salted-slot chunk logic is what guarantees a future
        # chunking change can't diverge them).
        chunks: list[tuple[int, pa.Table]] = []
        for g in np.split(order, bounds):
            p = int(slot[g[0]])
            sub = tbl.take(pa.array(g))
            for off in range(0, len(g), chunk):
                chunks.append((p, sub.slice(off, chunk)))
        if self.fuse_analyze:
            # FUSED path: fetch+analyze+push run inside the fetch actor
            # per chunk; the payload-bearing intermediate never enters
            # plasma (fetch.py:fetch_analyze). The count barrier below is
            # simultaneously the fetch, analyze and push barrier.
            out_refs, cnt_refs = [], []
            for p, sub in chunks:
                t_ref, c_ref = self.fetchers[p].fetch_analyze.options(
                    num_returns=2
                ).remote(sub)
                out_refs.append(t_ref)
                cnt_refs.append(c_ref)
            self._phase["partition"] += time.monotonic() - tp
            tp = time.monotonic()
            ray.get(cnt_refs)
            self._phase["dataset"] += time.monotonic() - tp
            out_dir = os.path.join(self.wave_dir, f"wave={wave:05d}")
            self._pending_writes.extend(
                _write_wave_block.remote(r, out_dir, i)
                for i, r in enumerate(out_refs)
            )
            return
        refs = [
            self.fetchers[p].fetch.remote(sub) for p, sub in chunks
        ]
        self._phase["partition"] += time.monotonic() - tp
        # Fetch barrier BEFORE the analyze dataset: fetch actors reserve
        # 0.25 CPU but burn a full core during their burst; letting that
        # burst overlap the analyze tasks oversubscribes the node and
        # measurably slows the whole wave (~25% at 16 CPUs). Serialized,
        # fetch uses all cores for ~1 s/wave, then analyze does.
        tp = time.monotonic()
        ray.wait(refs, num_returns=len(refs))
        self._phase["fetch_wait"] += time.monotonic() - tp
        # Raw-task analyze+push per fetched block (no per-wave streaming
        # executor — its ~0.5-1 s spin-up was pure serial-fraction); a
        # completed task implies its frontier pushes landed, so waiting
        # on all of them IS the wave's push barrier.
        tp = time.monotonic()
        out_refs, cnt_refs = [], []
        for r in refs:
            t_ref, c_ref = _process_block.remote(
                r, self.directives_source, self.shards, self.n_shards
            )
            out_refs.append(t_ref)
            cnt_refs.append(c_ref)
        # barrier on the COUNTS: surfaces any analyze/push task failure
        # BEFORE this wave commits (ray.wait never raises), at the cost
        # of shipping one int per block
        ray.get(cnt_refs)
        self._phase["dataset"] += time.monotonic() - tp
        # wave-output writes happen OFF the critical path (joined before
        # checkpoints and at crawl end) through the format seam
        out_dir = os.path.join(self.wave_dir, f"wave={wave:05d}")
        self._pending_writes.extend(
            _write_wave_block.remote(r, out_dir, i) for i, r in enumerate(out_refs)
        )

    # ----- outputs -----

    def _next_wave_index(self) -> int:
        existing = [
            d for d in os.listdir(self.wave_dir) if d.startswith("wave=")
        ] if os.path.isdir(self.wave_dir) else []
        return (
            max(int(d.split("=")[1]) for d in existing) + 1 if existing else 0
        )

    def _write_manifest(self, wave: int, n_sent: int, final: bool = False) -> None:
        with open(os.path.join(self.wave_dir, "manifest.json"), "w") as f:
            json.dump(
                {"wave": wave, "n_sent": n_sent, "final": final, "name": self.wave_name},
                f,
            )

