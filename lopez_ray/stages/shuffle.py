"""High-cardinality shuffle reductions.

Ray Data's ``groupby(keys).aggregate(...)`` sort-aggregates with a
Python-level per-row accumulator, which is fine for a handful of groups
(a 5-language count) but collapses when the number of DISTINCT keys is
O(rows): measured on this box, 80k distinct (a, b) pairs aggregate at
~700 rows/s from pandas blocks and ~5k rows/s from Arrow blocks — a
pair-dedup that should be milliseconds takes minutes, and the cost is
linear in the corpus.

``partitioned_reduce`` keeps the shuffle but bounds the group count:
rows are hash-partitioned on the key columns into ``n_parts`` buckets
and the real per-key reduction runs INSIDE each partition as one
C-speed pandas groupby. The shuffle itself is a RAW-TASK hash exchange
(one split task per input block fanning out ``n_parts`` sub-tables via
``num_returns``, one reduce task per partition concatenating its chunks
— sub-tables flow task-to-task through the object store, never the
driver), NOT Ray's sort-based ``groupby``: the sort path samples,
range-partitions and sorts every block, costing seconds of fixed
overhead per barrier even on kilobyte inputs (measured 3-5 s per
shuffle at 32 CPUs; four chained shuffles made a 60 ms verify take
25 s). Same key co-location guarantee, same contract, two task waves.

``n_parts`` is the FLOOR of the exchange fan-out, sized for the
cluster; the effective fan-out grows with the data. The streamed
intake measures total bytes (free — RefBundle metadata), and when a
reduce/join partition would exceed ``LOPEZ_PART_CAP_BYTES`` (default
256 MB) each slot is re-split by a second-level hash
(``(h // n_parts) % k``) into ``k`` sub-slots — one extra task wave,
taken only on inputs past ``n_parts × cap`` (~16 GB at defaults), so
per-partition memory stays bounded at any corpus size while small
inputs never pay for it. Key co-location is preserved: a key's
(slot, sub-slot) is a pure function of its hash.

Intake is STREAMING (round-4): split tasks launch per block as the
producer emits it (``iter_internal_ref_bundles``), so the exchange
overlaps the producing map stage instead of waiting for it to finish —
measured -35% wall on the 300k-doc dedup tier, outputs identical.
``partitioned_lookup_join`` reuses the same exchange (same key mixer ⇒
same partition from either side) for the size-gated broadcast joins'
fallback leg.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import table_from_pandas

_PHI = np.uint64(0x9E3779B97F4A7C15)

# target input bytes per reduce/join task when sizing the fan-out from
# the streamed byte count (small enough that a CPU-heavy reduce_fn
# parallelizes, large enough that task overhead stays negligible)
_REDUCE_TARGET_BYTES = 16 << 20


def _mix_columns(batch: pa.Table, key_cols: list[str]) -> np.ndarray:
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in key_cols:
            v = batch[c].to_numpy(zero_copy_only=False)
            if v.dtype.kind in "iu":
                v = v.astype(np.int64, copy=False).view(np.uint64)
            else:
                # string/float/bool keys: vectorized C-speed SipHash
                # with pandas' FIXED default key — deterministic across
                # workers and runs, so both sides of a join agree. None
                # hashes as its own stable value (null keys co-locate).
                import pandas as pd

                v = pd.util.hash_array(v, categorize=False).astype(np.uint64)
            h = h * _PHI + v
        # finalizer so low-entropy keys still spread over parts
        h ^= h >> np.uint64(33)
        h = h * _PHI
    return h


def _split_table(tbl: pa.Table, key_cols: list[str], n_parts: int):
    """Hash-partition one Arrow block on ``key_cols`` into ``n_parts``
    slices (None for empty slices). Shared by ``partitioned_reduce`` and
    ``partitioned_lookup_join`` so both sides of a join land on the same
    partition for the same key. Integer keys hash zero-copy (viewed as
    int64); string/float/bool keys (and nulls) go through a vectorized
    deterministic hash — see ``_mix_columns``."""
    if tbl.num_rows == 0:
        return tuple(None for _ in range(n_parts))
    missing = [c for c in key_cols if c not in tbl.column_names]
    if missing:
        # loud: silently dropping mis-schemaed NON-empty blocks
        # turns a caller's typo into an empty (not wrong-looking)
        # result; only schema-less empty blocks are skippable
        raise KeyError(
            f"hash exchange: block missing key column(s) {missing}; "
            f"has {tbl.column_names}"
        )
    part = (_mix_columns(tbl, key_cols) % np.uint64(n_parts)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    bounds = np.searchsorted(part[order], np.arange(n_parts + 1))
    return tuple(
        sorted_tbl.slice(bounds[b], bounds[b + 1] - bounds[b])
        if bounds[b + 1] > bounds[b]
        else None
        for b in range(n_parts)
    )


def _streamed_split(ds, split_task, n_slots: int):
    """Launch one split task per input block, consuming blocks AS THEY
    LAND via ``iter_internal_ref_bundles()`` (default) so the split wave
    overlaps the producing map_batches stage instead of waiting behind a
    ``to_arrow_refs()`` full-materialization barrier
    (``LOPEZ_SHUFFLE_STREAM=0`` restores the materialized intake for
    A/B). Holding the block refs in ``per_slot`` keeps them alive until
    the downstream wave consumes them; peak object-store footprint is
    unchanged (an all-to-all holds every block either way), but the
    wall-clock no longer serializes produce → split. Returns
    ``(per_slot, n_blocks, total_bytes)`` — bytes come free from the
    RefBundle metadata on the streaming path (0 when unknown, e.g. the
    materialized A/B path), and size the downstream fan-out."""
    import os

    import ray

    @ray.remote
    def _first_part(parts):
        return parts[0]

    per_slot: list[list] = [[] for _ in range(n_slots)]
    n_blocks = 0
    total_bytes = 0
    if os.environ.get("LOPEZ_SHUFFLE_STREAM", "1") != "0":

        def block_iter():
            nonlocal total_bytes
            for bundle in ds.iter_internal_ref_bundles():
                b = bundle.size_bytes()
                total_bytes += b if b else 0
                yield from bundle.block_refs

        blocks = block_iter()
    else:
        blocks = iter(ds.to_arrow_refs())
    for ref in blocks:
        n_blocks += 1
        refs = split_task.options(num_returns=n_slots).remote(ref)
        if n_slots == 1:
            # with num_returns=1 Ray does NOT unpack the split task's
            # 1-tuple — the single ref's VALUE would be the tuple and
            # downstream tasks would crash on .num_rows; unwrap it
            refs = [_first_part.remote(refs)]
        for b, r in enumerate(refs):
            per_slot[b].append(r)
    return per_slot, n_blocks, total_bytes


def _subsplit_factor(total_bytes: int, n_slots: int, max_k: int | None = None) -> int:
    """How many sub-slots each slot needs so no reduce/join partition
    exceeds ``LOPEZ_PART_CAP_BYTES`` (default 256 MB), assuming even
    hash spread. 1 (no escalation) until the input passes
    ``n_slots × cap``; the env knob exists so tests can force the
    escalated path on kilobyte inputs. Capped at ``max_k`` (default
    ``LOPEZ_MAX_SUBSPLIT``, 64) so a pathological byte count can't turn
    one exchange into tens of thousands of sub-slot tasks — past the
    ceiling, partitions grow beyond the cap again, which is the honest
    trade (64 × 64 slots × 256 MB ≈ 4 TB per exchange before that)."""
    import os

    cap = int(os.environ.get("LOPEZ_PART_CAP_BYTES", 256 << 20))
    if max_k is None:
        max_k = int(os.environ.get("LOPEZ_MAX_SUBSPLIT", 64))
    if total_bytes <= 0 or cap <= 0:
        return 1
    need = -(-total_bytes // cap)  # ceil: partitions needed overall
    return min(max_k, max(1, -(-need // n_slots)))


def _escalate_slots(per_slot, key_cols, n_slots: int, k: int):
    """Second-level hash split: each slot's chunks are concatenated and
    re-partitioned by ``(h // n_slots) % k`` into ``k`` sub-slots (one
    task per slot, task-to-task through the object store). Returns the
    new ``n_slots × k`` slot list, each holding ONE chunk ref. A key's
    sub-slot is a pure function of its hash, so both sides of a join
    escalated with the same ``k`` still co-locate."""
    import ray

    @ray.remote
    def subsplit(*chunks):
        got = [t for t in chunks if t is not None and t.num_rows]
        if not got:
            return tuple(None for _ in range(k))
        tbl = pa.concat_tables(got, promote_options="default")
        sub = (
            (_mix_columns(tbl, key_cols) // np.uint64(n_slots))
            % np.uint64(k)
        ).astype(np.int64)
        order = np.argsort(sub, kind="stable")
        st = tbl.take(pa.array(order))
        bounds = np.searchsorted(sub[order], np.arange(k + 1))
        return tuple(
            st.slice(bounds[b], bounds[b + 1] - bounds[b])
            if bounds[b + 1] > bounds[b]
            else None
            for b in range(k)
        )

    out: list[list] = []
    for s in range(n_slots):
        refs = subsplit.options(num_returns=k).remote(*per_slot[s])
        out.extend([r] for r in refs)
    return out


def partitioned_reduce(ds, key_cols: list[str], reduce_fn, n_parts: int = 64):
    """groupby(key_cols) → ``reduce_fn`` for key spaces with O(rows)
    distinct keys. ``reduce_fn`` receives one partition's rows as a
    pandas DataFrame (all rows of any given key, guaranteed — the
    partition is a superset of whole key-groups) and must itself group
    by ``key_cols`` (one vectorized pandas groupby) and return the
    reduced frame. Returns a Ray Dataset of the reduced rows."""
    import os

    import ray
    import ray.data as rd

    if os.environ.get("LOPEZ_SHUFFLE") == "sort":
        return _partitioned_reduce_sort(ds, key_cols, reduce_fn, n_parts)

    n_slots = n_parts  # split fan-out is FIXED so splits can launch
    # while the producer is still streaming; the reduce fan-out is
    # decided after the stream ends (slots group into reduce tasks)

    @ray.remote
    def split(tbl):
        if not isinstance(tbl, pa.Table):  # pandas block from upstream
            tbl = table_from_pandas(tbl)
        return _split_table(tbl, key_cols, n_slots)

    @ray.remote(num_returns=2)
    def reduce_part(*chunks):
        got = [t for t in chunks if t is not None and t.num_rows]
        if not got:
            # -1 ("no input at all") vs 0 ("reduced to zero rows"):
            # a zero-row reduced table still CARRIES THE OUTPUT SCHEMA,
            # which the driver keeps one of when every partition drains
            # — downstream stages (unions, joins, schema resolution)
            # need a schema-bearing empty, and Ray Data warns on
            # zero-column blocks in a RefBundle (VERDICT r4 #4)
            return None, -1
        df = pa.concat_tables(got, promote_options="default").to_pandas()
        out = table_from_pandas(reduce_fn(df))
        return out, out.num_rows

    per_slot, n_blocks, total_bytes = _streamed_split(ds, split, n_slots)
    if not n_blocks:
        return rd.from_items([])
    # scale the exchange with the DATA, in both directions:
    #   up — when even hash spread would leave a reduce partition over
    #   the byte cap, re-split each slot into k sub-slots (one extra
    #   task wave, only past ~n_parts × 256 MB), so per-partition
    #   memory stays bounded at any corpus size;
    #   down — a toy input in 2 blocks doesn't need 64 reduce tasks'
    #   scheduling latency per barrier (5 chained barriers at sf0.1
    #   paid ~2-3 s of pure task overhead). Block count is a size proxy
    #   because Ray Data bounds blocks at target_max_block_size
    #   (~128 MB). A caller feeding ONE oversized from_arrow() block
    #   would under-read the size — every producer in this repo goes
    #   through map_batches / read_parquet, which re-blocks. Whole
    #   slots map to one reduce task (contiguous ranges), so key
    #   co-location is preserved either way.
    k = _subsplit_factor(total_bytes, n_slots)
    n_eff = n_slots * k
    if k > 1:
        per_slot = _escalate_slots(per_slot, key_cols, n_slots, k)
    # block count alone under-reads fan-out when the producer emitted
    # few LARGE blocks (e.g. a materialized 1M-row signature table is
    # 1-2 blocks → 4 reduce tasks grinding a CPU-heavy reduce_fn for
    # minutes — the img-xl pair-search straggler): also scale with the
    # streamed bytes, targeting ~16 MB of input per reduce task
    n_by_bytes = -(-total_bytes // _REDUCE_TARGET_BYTES)
    n_reduce = min(n_eff, max(4, 2 * n_blocks, n_by_bytes))
    if os.environ.get("LOPEZ_SHUFFLE_DEBUG"):
        print(
            f"[shuffle] reduce fan-out: n_blocks={n_blocks} "
            f"bytes={total_bytes} k={k} n_reduce={n_reduce}",
            flush=True,
        )
    tbl_refs, cnt_refs = [], []
    for j in range(n_reduce):
        lo = j * n_eff // n_reduce
        hi = (j + 1) * n_eff // n_reduce
        chunks = [r for s in range(lo, hi) for r in per_slot[s]]
        t_ref, c_ref = reduce_part.remote(*chunks)
        tbl_refs.append(t_ref)
        cnt_refs.append(c_ref)
    # only the per-partition ROW COUNTS touch the driver; the reduced
    # tables stay in the object store and flow into the Dataset by ref
    counts = ray.get(cnt_refs)
    keep = [r for r, c in zip(tbl_refs, counts) if c > 0]
    if not keep:
        # every partition reduced to zero rows: keep ONE schema-bearing
        # empty table so the result Dataset still resolves a schema
        keep = [r for r, c in zip(tbl_refs, counts) if c == 0][:1]
    if not keep:
        return rd.from_items([])
    return rd.from_arrow_refs(keep)


def grouped_sum_max(partials, key_cols, sums: dict, maxes: dict | None = None,
                    n_parts: int = 16):
    """Final merge of per-batch combiner partials: per key-group, SUM
    every ``sums`` source column and MAX every ``maxes`` source column,
    renaming ``src → dst``. Replaces ``Dataset.groupby().aggregate()``
    — Ray's sort-based all-to-all both over-moves data for the
    low-cardinality keys these partials have (O(groups) rows per batch)
    and emits zero-column blocks when output partitions outnumber
    groups, tripping the executor's "different schema … new schema: ."
    warning. ``partitioned_reduce`` keeps empties schema-bearing and
    ships only the partial rows. Null keys form their own group
    (``dropna=False``), matching SQL GROUP BY and pyarrow group_by."""
    maxes = maxes or {}

    def red(df):
        spec = {dst: (src, "sum") for src, dst in sums.items()}
        spec.update({dst: (src, "max") for src, dst in maxes.items()})
        return df.groupby(key_cols, as_index=False, dropna=False).agg(**spec)

    return partitioned_reduce(partials, key_cols, red, n_parts=n_parts)


def _partitioned_reduce_sort(ds, key_cols, reduce_fn, n_parts: int = 64):
    """The Ray-sort-based variant (groupby(__part).map_groups), kept for
    A/B comparison via LOPEZ_SHUFFLE=sort."""

    def add_part(batch: pa.Table) -> pa.Table:
        part = (_mix_columns(batch, key_cols) % np.uint64(n_parts)).astype(
            np.int64
        )
        return batch.append_column("__part", pa.array(part, pa.int64()))

    def run(group):
        return reduce_fn(group.drop(columns="__part"))

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(run, batch_format="pandas")
    )


def partitioned_lookup_join(
    left_ds,
    right_ds,
    key_cols: list[str],
    how: str = "left",
    n_parts: int = 64,
):
    """Partitioned equi-join for when the lookup side is too big to
    broadcast (the fallback leg of the size-gated broadcast joins,
    VERDICT r3 #7). Both sides are hash-exchanged on ``key_cols`` with
    the same raw-task exchange (and the same key mixer — so a key lands
    on the same partition from either side) as ``partitioned_reduce``,
    then every partition is joined with ONE vectorized pandas merge.
    No driver materialization: sub-tables flow task-to-task through the
    object store; only per-partition row counts touch the driver.

    ``key_cols`` must exist under the SAME names in both sides (rename
    before calling) and be integer-typed and non-null. ``how`` is
    "left" (unmatched left rows keep null right columns — matching the
    broadcast paths' null-on-miss semantics) or "inner". Right-side keys
    are assumed unique (a lookup table); duplicate right keys would
    multiply rows, exactly like a SQL join."""
    import ray
    import ray.data as rd

    # The right schema is needed to null-fill left-join partitions that
    # got no right chunks. Dataset.schema() on a read->map pipeline
    # resolves from parquet metadata / one block, not a full execution.
    rschema = right_ds.schema()
    right_arrow_schema = pa.schema(
        [(n, t) for n, t in zip(rschema.names, rschema.types)]
    )

    n_slots = n_parts  # fixed split fan-out; join fan-out adapts below

    @ray.remote
    def split(tbl):
        if not isinstance(tbl, pa.Table):
            tbl = table_from_pandas(tbl)
        return _split_table(tbl, key_cols, n_slots)

    @ray.remote(num_returns=2)
    def join_part(n_left: int, *chunks):
        lt = [t for t in chunks[:n_left] if t is not None and t.num_rows]
        rt = [t for t in chunks[n_left:] if t is not None and t.num_rows]
        if not lt:
            return None, -1  # no left input: nothing, not even a schema
        if not rt:
            if how == "inner":
                # inner join with an empty right side drops every left
                # row but the joined SCHEMA is still known — emit a
                # zero-row schema-bearing table (kept by the driver iff
                # every partition drains; see partitioned_reduce)
                rt = [right_arrow_schema.empty_table()]
                lt = [lt[0].slice(0, 0)]
            else:
                rt = [right_arrow_schema.empty_table()]
        import pandas as pd

        # Integer columns map to pandas NULLABLE dtypes so a left join's
        # introduced missing values never force a float64 upcast — a
        # plain-int64 frame would silently ROUND values above 2^53
        # (md5-derived keys/labels live near 2^63) before the cast-back
        # below could run.
        _nullable_int = {
            pa.int8(): pd.Int8Dtype(),
            pa.int16(): pd.Int16Dtype(),
            pa.int32(): pd.Int32Dtype(),
            pa.int64(): pd.Int64Dtype(),
            pa.uint8(): pd.UInt8Dtype(),
            pa.uint16(): pd.UInt16Dtype(),
            pa.uint32(): pd.UInt32Dtype(),
            pa.uint64(): pd.UInt64Dtype(),
        }.get
        left = pa.concat_tables(lt, promote_options="default").to_pandas(
            types_mapper=_nullable_int
        )
        right = pa.concat_tables(rt, promote_options="default").to_pandas(
            types_mapper=_nullable_int
        )
        out = left.merge(right, how=how, on=key_cols)
        tbl = table_from_pandas(out)
        # Cast remaining drifted columns (e.g. int32 → Int32 → int64
        # promotions) back to their Arrow source types where the data
        # allows (null-free columns cast back losslessly).
        fields = {f.name: f.type for f in right_arrow_schema}
        cols = {}
        for name in tbl.column_names:
            col = tbl[name]
            want = fields.get(name)
            if want is not None and col.type != want and col.null_count == 0:
                col = col.cast(want)
            cols[name] = col
        tbl = pa.table(cols)
        return tbl, tbl.num_rows

    left_slots, n_left_blocks, left_bytes = _streamed_split(
        left_ds, split, n_slots
    )
    right_slots, n_right_blocks, right_bytes = _streamed_split(
        right_ds, split, n_slots
    )
    if not n_left_blocks:
        return rd.from_items([])
    # adaptive JOIN fan-out, same rationale (and byte cap) as
    # partitioned_reduce; BOTH sides escalate with the same k so a key
    # still lands on the same (slot, sub-slot) from either side; whole
    # slots map to one join task so key co-location is preserved
    k = _subsplit_factor(max(left_bytes, right_bytes), n_slots)
    n_eff = n_slots * k
    if k > 1:
        left_slots = _escalate_slots(left_slots, key_cols, n_slots, k)
        right_slots = _escalate_slots(right_slots, key_cols, n_slots, k)
    n_by_bytes = -(-max(left_bytes, right_bytes) // _REDUCE_TARGET_BYTES)
    n_join = min(
        n_eff, max(4, 2 * max(n_left_blocks, n_right_blocks), n_by_bytes)
    )
    tbl_refs, cnt_refs = [], []
    for j in range(n_join):
        lo = j * n_eff // n_join
        hi = (j + 1) * n_eff // n_join
        lchunks = [r for s in range(lo, hi) for r in left_slots[s]]
        rchunks = [r for s in range(lo, hi) for r in right_slots[s]]
        t_ref, c_ref = join_part.remote(len(lchunks), *lchunks, *rchunks)
        tbl_refs.append(t_ref)
        cnt_refs.append(c_ref)
    counts = ray.get(cnt_refs)
    keep = [r for r, c in zip(tbl_refs, counts) if c > 0]
    if not keep:
        keep = [r for r, c in zip(tbl_refs, counts) if c == 0][:1]
    if not keep:
        return rd.from_items([])
    return rd.from_arrow_refs(keep)
