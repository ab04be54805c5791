"""Distributed connected components over a dup-pair edge list.

The missing last step of the dedup family: ``minhash_dedup_pairs`` /
``ngram_jaccard_pairs`` / ``simhash_near_dups`` emit PAIRS, but "keep
one document per duplicate *cluster*" needs the transitive closure —
pairs (a,b) and (b,c) must collapse to one group even though (a,c) was
never emitted. ``connected_components`` computes, for every node that
appears in at least one pair, the minimum node id of its component
(the canonical "keeper" id).

Algorithm: BSP min-label propagation with POINTER JUMPING (path
halving), the classic PRAM/MapReduce construction (cf. Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014 — same
min-id contraction idea, different round structure). Each round every
node v updates

    lbl(v) <- min( lbl(v),  min_{(u,v) in E} lbl(u),  lbl(lbl(v)) )

The first two terms are plain neighbor propagation (converges in
O(diameter) rounds alone); the third — "ask my current label for ITS
label" — halves label-chain depth every round, so chain-shaped
components converge in O(log n) rounds instead of O(n). Labels are
node ids, start at min(v, neighbors), and only ever decrease, so the
fixpoint (no label changed) is exactly "every edge has equal endpoint
labels and every label is self-rooted" = per-component constant = the
component min.

Ray shape (all state stays in the object store; the driver holds only
O(R) refs and a per-round changed-counter):

  - edges are hash-partitioned ONCE into R fixed ranges (same
    ``_mix_columns`` mixer as stages/shuffle.py) and cached per-range
    as single compacted Arrow tables — the static edge set never
    re-ships after round 0.
  - labels live as one (node, lbl) table per range, co-partitioned
    with the edges by construction.
  - each round is three raw-task waves of R tasks:
      A: per range, join labels onto edges (vectorized pandas merge),
         emit edge-messages (other, lbl(node)) and jump-requests
         (lbl(node), node); both split by destination into R slices.
      B: per range, answer jump-requests from the local label table:
         (node, lbl(t)) for each request (t, node); split by node.
      C: per range, new labels = min over (self, edge-messages, jump
         replies); returns the new label table ref + a changed count.
    Message volume per round is 2|E| + O(|V|) rows of two int64
    columns; the barriers are task-to-task (num_returns fan-out),
    never through the driver.

At the 10^10-doc design point the pair graph is sparse (|E| ~ dup
rate x corpus) and components are near-cliques (diameter <= 3), so
the loop ends in ~3-4 rounds; the pointer jumps are insurance against
adversarial chain components (a->b->c->... of pairwise-similar docs),
which would otherwise cost O(chain length) rounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import table_from_pandas
from .shuffle import _mix_columns, _split_table

_SCHEMA = pa.schema([("node", pa.int64()), ("lbl", pa.int64())])


def _split_composite(tbl: pa.Table, key_cols, R0: int, k: int):
    """Hash-split into ``R0 × k`` ranges with the composite id
    ``(h % R0) * k + (h // R0) % k`` — the id a row lands on when the
    round-0 exchange (``h % R0`` slots) is escalated by a second-level
    ``(h // R0) % k`` sub-split (shuffle._escalate_slots). With k=1 this
    is exactly ``_split_table``. Messages routed with the SAME composite
    always reach the range that owns the destination node."""
    if k == 1:
        return _split_table(tbl, key_cols, R0)
    n = R0 * k
    if tbl.num_rows == 0:
        return tuple(None for _ in range(n))
    h = _mix_columns(tbl, key_cols)
    part = (
        (h % np.uint64(R0)) * np.uint64(k)
        + (h // np.uint64(R0)) % np.uint64(k)
    ).astype(np.int64)
    order = np.argsort(part, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    bounds = np.searchsorted(part[order], np.arange(n + 1))
    return tuple(
        sorted_tbl.slice(bounds[b], bounds[b + 1] - bounds[b])
        if bounds[b + 1] > bounds[b]
        else None
        for b in range(n)
    )


def _concat(chunks, schema: pa.Schema) -> pa.Table:
    got = [t for t in chunks if t is not None and t.num_rows]
    if not got:
        return schema.empty_table()
    return pa.concat_tables(got, promote_options="default")


def connected_components(
    pairs,
    a_col: str = "a",
    b_col: str = "b",
    n_ranges: int = 16,
    max_rounds: int = 100,
):
    """Component-min labels for every node appearing in ``pairs``.

    ``pairs`` is a Ray Dataset (or a pyarrow Table — the pair
    producers in stages/dedup.py return driver-side tables, pairs
    being O(dup rate), not O(corpus)) with two integer id columns,
    each row an undirected edge. Returns a Ray Dataset of (node:int64,
    group_id:int64) where group_id is the smallest node id in the
    node's connected component. Nodes not present in any pair do not
    appear (callers union singletons back if needed).
    """
    import ray
    import ray.data as rd

    from .shuffle import _escalate_slots, _streamed_split, _subsplit_factor

    if isinstance(pairs, pa.Table):
        pairs = rd.from_arrow(pairs)

    R = n_ranges

    @ray.remote
    def split_edges(tbl):
        if not isinstance(tbl, pa.Table):
            tbl = table_from_pandas(tbl)
        if tbl.num_rows == 0:
            return tuple(None for _ in range(R))
        a = tbl[a_col].combine_chunks().cast(pa.int64())
        b = tbl[b_col].combine_chunks().cast(pa.int64())
        und = pa.table(
            {
                "node": pa.chunked_array([a, b]).combine_chunks(),
                "other": pa.chunked_array([b, a]).combine_chunks(),
            }
        )
        return _split_table(und, ["node"], R)

    # --- round 0: partition edges once (streaming intake) ------------
    per_slot, n_blocks, total_bytes = _streamed_split(pairs, split_edges, R)
    if not n_blocks:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "group_id": pa.array([], pa.int64())})
        )
    # Scale the range count with the EDGE bytes (×2: split_edges emits
    # both directions): past R × LOPEZ_PART_CAP_BYTES each slot is
    # re-split by the second-level hash into k sub-ranges, bounding
    # per-range edge/label tables at any graph size; R stays the floor.
    # All message routing below uses the matching composite id.
    # RE is additionally capped (default 64 ranges) because each BSP
    # round builds RE×RE chunk matrices and RE-return tasks on the
    # driver — past that, raise n_ranges itself rather than k.
    import os as _os

    _re_cap = int(_os.environ.get("LOPEZ_CC_MAX_RANGES", "64"))
    k = _subsplit_factor(2 * total_bytes, R, max_k=max(1, _re_cap // R))
    RE = R * k
    if k > 1:
        per_slot = _escalate_slots(per_slot, ["node"], R, k)

    @ray.remote(num_returns=3)
    def compact_range(*chunks):
        """One edge table + the initial labels for this range's nodes:
        lbl0(v) = min(v, neighbors) — one propagation round for free."""
        edges = _concat(
            chunks, pa.schema([("node", pa.int64()), ("other", pa.int64())])
        )
        if edges.num_rows == 0:
            return edges, _SCHEMA.empty_table(), 0
        df = edges.to_pandas()
        lab = df.groupby("node", as_index=False).agg(lbl=("other", "min"))
        lab["lbl"] = np.minimum(lab["lbl"].to_numpy(), lab["node"].to_numpy())
        labels = table_from_pandas(lab).cast(_SCHEMA)
        return edges, labels, edges.num_rows

    @ray.remote(num_returns=2 * RE)
    def gen_messages(edges: pa.Table, labels: pa.Table):
        """Edge-messages (dst=other, lbl) and jump-requests (dst=lbl,
        src=node), each composite-hash-split by dst into RE slices."""
        if edges.num_rows == 0:
            return tuple(None for _ in range(2 * RE))
        e = edges.to_pandas()
        l = labels.to_pandas()
        m = e.merge(l, on="node", how="left")
        # every edge endpoint is a node of this range and has a label
        msgs = pa.table(
            {
                "node": pa.array(m["other"].to_numpy(), pa.int64()),
                "lbl": pa.array(m["lbl"].to_numpy(), pa.int64()),
            }
        )
        jump = l[l["lbl"] != l["node"]]
        reqs = pa.table(
            {
                "t": pa.array(jump["lbl"].to_numpy(), pa.int64()),
                "src": pa.array(jump["node"].to_numpy(), pa.int64()),
            }
        )
        return _split_composite(msgs, ["node"], R, k) + _split_composite(
            reqs, ["t"], R, k
        )

    @ray.remote(num_returns=RE)
    def answer_jumps(labels: pa.Table, *req_chunks):
        """For each request (t, src): reply (node=src, lbl=lbl(t)),
        split by src. t is always a node id owned by this range."""
        reqs = _concat(
            req_chunks, pa.schema([("t", pa.int64()), ("src", pa.int64())])
        )
        if reqs.num_rows == 0 or labels.num_rows == 0:
            return tuple(None for _ in range(RE))
        r = reqs.to_pandas()
        l = labels.to_pandas().rename(columns={"node": "t"})
        m = r.merge(l, on="t", how="inner")
        replies = pa.table(
            {
                "node": pa.array(m["src"].to_numpy(), pa.int64()),
                "lbl": pa.array(m["lbl"].to_numpy(), pa.int64()),
            }
        )
        return _split_composite(replies, ["node"], R, k)

    @ray.remote(num_returns=2)
    def min_reduce(labels: pa.Table, *incoming):
        """New labels = min(self, incoming) per node; count changes."""
        if labels.num_rows == 0:
            return labels, 0
        inc = _concat(incoming, _SCHEMA)
        if inc.num_rows == 0:
            return labels, 0
        both = pd.concat(
            [labels.to_pandas(), inc.to_pandas()], ignore_index=True
        )
        new = both.groupby("node", as_index=False).agg(lbl=("lbl", "min"))
        old = labels.to_pandas().sort_values("node", ignore_index=True)
        new = new.sort_values("node", ignore_index=True)
        # incoming dsts are always existing nodes, so the node sets match
        changed = int((new["lbl"].to_numpy() < old["lbl"].to_numpy()).sum())
        return table_from_pandas(new).cast(_SCHEMA), changed

    # --- derive initial labels per (possibly escalated) range --------
    edge_refs, label_refs, cnt_refs = [], [], []
    for r in range(RE):
        e_ref, l_ref, c_ref = compact_range.remote(*per_slot[r])
        edge_refs.append(e_ref)
        label_refs.append(l_ref)
        cnt_refs.append(c_ref)
    edge_counts = ray.get(cnt_refs)
    if sum(edge_counts) == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "group_id": pa.array([], pa.int64())})
        )

    # --- iterate: A (messages) -> B (jump replies) -> C (min) --------
    # Ranges with NO edges are skipped in every wave: they hold empty
    # label tables, generate nothing, and (because a node's edges hash
    # to the node's own range) can never be a message/jump destination.
    live = [r for r in range(RE) if edge_counts[r]]
    for _ in range(max_rounds):
        msg_chunks = [[None] * RE for _ in range(RE)]  # [dst][src]
        req_chunks = [[None] * RE for _ in range(RE)]
        for r in live:
            outs = gen_messages.options(num_returns=2 * RE).remote(
                edge_refs[r], label_refs[r]
            )
            for d in range(RE):
                msg_chunks[d][r] = outs[d]
                req_chunks[d][r] = outs[RE + d]
        reply_chunks = [[None] * RE for _ in range(RE)]
        for r in live:
            outs = answer_jumps.options(num_returns=RE).remote(
                label_refs[r], *req_chunks[r]
            )
            for d in range(RE):
                reply_chunks[d][r] = outs[d]
        new_labels = list(label_refs)
        changed_refs = []
        for r in live:
            l_ref, c_ref = min_reduce.remote(
                label_refs[r], *msg_chunks[r], *reply_chunks[r]
            )
            new_labels[r] = l_ref
            changed_refs.append(c_ref)
        label_refs = new_labels
        if sum(ray.get(changed_refs)) == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    @ray.remote
    def finish(labels: pa.Table) -> pa.Table:
        return labels.rename_columns(["node", "group_id"])

    # Empty ranges (no edges hashed there) carry empty label tables;
    # dropping them here keeps every downstream block schema-bearing
    # (Ray Data warns on zero-column empty blocks in a RefBundle).
    return rd.from_arrow_refs(
        [finish.remote(l) for l, c in zip(label_refs, edge_counts) if c]
    )
