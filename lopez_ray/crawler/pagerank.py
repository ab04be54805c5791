"""PageRank over the harvested link graph.

Reference: ``lib-lopez/src/page_rank.rs:4-155`` — 8 power iterations,
damping 0.85, "lost juice" (dangling mass) redistributed through the
restart term: ``new = 0.85 * M @ state + (0.15 + 0.85 * lost) / n``.
Edge feed per ``postgres-lopez/src/sql/linkage.sql``: ahref edges whose
endpoints are both closed pages.

Two implementations:

- ``power_iteration`` — single-process numpy, semantically identical to
  the reference's tiled sparse multiply (used for parity tests and small
  graphs; f64 instead of the reference's f32, documented);
- ``pagerank_ray`` — the distributed path: the edge list stays a Ray
  Dataset; each iteration is one map_batches (per-batch partial
  contributions against the broadcast rank vector — pre-aggregation, so
  the shuffle input is one row per (batch, to-node)) + one
  groupby-aggregate shuffle keyed on ``to_id``. The rank vector is
  broadcast via ``ray.put`` once per iteration. At 10^10-node scale the
  rank vector itself would be hash-partitioned alongside the edges
  (bucketed join); the per-batch partial-sum structure is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def harvest_edges(wave_dir: str, reason: str = "ahref"):
    """Closed→closed link edges from a crawl's wave output, as a Ray
    Dataset (from_id, to_id) — the linkage.sql feed. Fully distributed:
    one vectorized ``map_batches`` explode per wave block, target ids
    taken from the crawl-time ``link_pids`` column (no URL re-hashing;
    falls back to a vectorized hash of ``link_urls`` for pre-column
    outputs), and the closed-id membership test is a broadcast sorted
    int64 array + searchsorted — no driver-side row loops anywhere."""
    import os

    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..sources.corpus import dataset_schema, list_wave_dirs, read_table

    status = read_table(
        os.path.join(wave_dir, "status.parquet"),
        columns=["page_id", "search_status"],
    )
    closed = np.sort(
        status.filter(pc.equal(status["search_status"], "closed"))["page_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    closed_ref = ray.put(closed)

    def explode(batch: pa.Table) -> pa.Table:
        keys = ray.get(closed_ref)

        def member(v: np.ndarray) -> np.ndarray:
            if len(keys) == 0:
                return np.zeros(len(v), dtype=bool)
            pos = np.minimum(np.searchsorted(keys, v), len(keys) - 1)
            return keys[pos] == v

        pids = batch["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if "link_pids" in batch.column_names:
            lists = batch["link_pids"]
            if isinstance(lists, pa.ChunkedArray):
                lists = lists.combine_chunks()
            to_id = (
                pc.list_flatten(lists).to_numpy(zero_copy_only=False).astype(np.int64)
            )
        else:
            from ..hash import page_ids

            lists = batch["link_urls"]
            if isinstance(lists, pa.ChunkedArray):
                lists = lists.combine_chunks()
            flat = pc.list_flatten(lists)
            to_id = (
                page_ids(flat.to_pylist()).view(np.int64)
                if len(flat)
                else np.array([], dtype=np.int64)
            )
        counts = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
            zero_copy_only=False
        )
        from_id = np.repeat(pids, counts)
        reasons = pc.list_flatten(batch["link_reasons"])
        mask = (
            (reasons.to_numpy(zero_copy_only=False) == reason)
            & member(from_id)
            & member(to_id)
        )
        return pa.table(
            {
                "from_id": pa.array(from_id[mask], pa.int64()),
                "to_id": pa.array(to_id[mask], pa.int64()),
            }
        )

    wave_paths = list_wave_dirs(wave_dir)
    if not wave_paths:
        # zero dispatched waves (or an empty crawl): no edges
        return rd.from_arrow(
            pa.table(
                {
                    "from_id": pa.array([], pa.int64()),
                    "to_id": pa.array([], pa.int64()),
                }
            )
        )
    schema = dataset_schema(wave_paths[0])
    cols = ["page_id", "link_urls", "link_reasons"]
    if "link_pids" in schema.names:
        cols = ["page_id", "link_pids", "link_reasons"]
    from ..sources.corpus import read_dataset_dirs

    waves = read_dataset_dirs(wave_paths, columns=cols)
    return waves.map_batches(explode, batch_format="pyarrow")


def power_iteration(
    edges: np.ndarray, iterations: int = 8, damping: float = 0.85
) -> tuple[np.ndarray, np.ndarray]:
    """edges: (m, 2) int64 [from, to] → (node_ids sorted, ranks)."""
    if len(edges) == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
    nodes, inverse = np.unique(edges.reshape(-1), return_inverse=True)
    n = len(nodes)
    from_idx = inverse[0::2]
    to_idx = inverse[1::2]
    out_deg = np.bincount(from_idx, minlength=n)
    state = np.full(n, 1.0 / n)
    dangling = out_deg == 0
    safe_deg = np.where(dangling, 1, out_deg)
    for _ in range(iterations):
        share = state / safe_deg
        contrib = np.zeros(n)
        np.add.at(contrib, to_idx, share[from_idx])
        lost = state[dangling].sum()
        state = damping * contrib + (1.0 - damping + damping * lost) / n
    return nodes, state


def pagerank_ray(
    edges_ds, iterations: int = 8, damping: float = 0.85
) -> "pa.Table":
    """Distributed power iteration over an edges Dataset with columns
    (from_id:int64, to_id:int64). Returns pa.Table(page_id, rank)."""
    import ray

    # Node universe + out-degrees: two small aggregate passes.
    def degree_batch(batch: pa.Table) -> pa.Table:
        f = batch["from_id"].to_numpy(zero_copy_only=False)
        t = batch["to_id"].to_numpy(zero_copy_only=False)
        ids, counts = np.unique(f, return_counts=True)
        all_ids = np.unique(np.concatenate([f, t]))
        deg = np.zeros(len(all_ids), dtype=np.int64)
        deg[np.searchsorted(all_ids, ids)] = counts
        return pa.table({"node": all_ids, "deg": deg})

    from ..stages.shuffle import partitioned_reduce

    # O(nodes) distinct keys → partitioned C-speed reduce, not a Ray
    # aggregate (stages/shuffle.py).
    deg_table = partitioned_reduce(
        edges_ds.map_batches(degree_batch, batch_format="pyarrow"),
        ["node"],
        lambda g: g.groupby("node", as_index=False)["deg"].sum(),
    ).to_pandas()
    nodes = deg_table["node"].to_numpy(dtype=np.int64)
    order = np.argsort(nodes)
    nodes = nodes[order]
    out_deg = deg_table["deg"].to_numpy(dtype=np.int64)[order]
    n = len(nodes)
    if n == 0:
        return pa.table({"page_id": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())})
    state = np.full(n, 1.0 / n)
    dangling = out_deg == 0
    safe_deg = np.where(dangling, 1, out_deg)

    for _ in range(iterations):
        share_ref = ray.put(state / safe_deg)
        nodes_ref = ray.put(nodes)

        def contrib_batch(batch: pa.Table) -> pa.Table:
            share = ray.get(share_ref)
            node_index = ray.get(nodes_ref)
            f = batch["from_id"].to_numpy(zero_copy_only=False)
            t = batch["to_id"].to_numpy(zero_copy_only=False)
            fi = np.searchsorted(node_index, f)
            # partial per-batch aggregation: one row per distinct target
            tu, inv = np.unique(t, return_inverse=True)
            partial = np.zeros(len(tu))
            np.add.at(partial, inv, share[fi])
            return pa.table({"to_id": tu, "contrib": partial})

        agg = partitioned_reduce(
            edges_ds.map_batches(contrib_batch, batch_format="pyarrow"),
            ["to_id"],
            lambda g: g.groupby("to_id", as_index=False)["contrib"].sum(),
        ).to_pandas()
        contrib = np.zeros(n)
        ti = np.searchsorted(nodes, agg["to_id"].to_numpy(dtype=np.int64))
        contrib[ti] = agg["contrib"].to_numpy()
        lost = state[dangling].sum()
        state = damping * contrib + (1.0 - damping + damping * lost) / n

    return pa.table({"page_id": nodes, "rank": state})
