"""Approximate nearest-neighbor search over an embedding column.

- ``brute_force_topk``: the exactness baseline — per-batch numpy matmul
  of the block's embeddings against a broadcast query matrix, emitting
  per-batch partial top-k; the driver merges partials (k × n_queries
  rows — tiny). This is the canonical broadcast-small-side pattern: the
  query matrix ships via ``ray.put`` once, never per batch.
- ``ivf_topk``: the scale path — a small k-means (trained on a driver
  sample) assigns each vector to a centroid list; queries probe the
  ``nprobe`` nearest centroids only. Recall vs brute force is the test
  gate; at 100 TB the lists become hash-partitioned datasets keyed by
  centroid id (same layout, bigger k).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def vecs_of(batch: pa.Table, col: str, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from a list<float> column — zero-copy flatten of
    the Arrow values buffer + reshape, never a Python list round-trip.
    Assumes fixed-length lists (the embedding-table contract)."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, -1).astype(dtype, copy=False)


def brute_force_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Top-k cosine per query row. Returns (query_idx, vec_id, score)
    sorted by (query_idx, -score, vec_id)."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        vecs = vecs_of(batch, vec_col)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        sims = _normalize(vecs) @ qm.T  # (n, nq)
        nq = qm.shape[0]
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        rows = {"query_idx": [], id_col: [], "score": []}
        for qi in range(nq):
            for r in top[:, qi]:
                rows["query_idx"].append(qi)
                rows[id_col].append(int(ids[r]))
                rows["score"].append(float(sims[r, qi]))
        return pa.table(
            {
                "query_idx": pa.array(rows["query_idx"], pa.int32()),
                id_col: pa.array(rows[id_col], pa.int64()),
                "score": pa.array(rows["score"], pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    import ray as _r

    tables = [t for t in (_r.get(r) for r in partials) if t.num_rows]
    merged = pa.concat_tables(tables)
    # driver-side final top-k per query (tiny)
    out = {"query_idx": [], id_col: [], "score": []}
    df = merged.to_pandas()
    for qi, g in df.groupby("query_idx"):
        best = heapq.nsmallest(k, g.itertuples(index=False), key=lambda t: (-t.score, getattr(t, id_col)))
        for t in best:
            out["query_idx"].append(qi)
            out[id_col].append(getattr(t, id_col))
            out["score"].append(t.score)
    return pa.table(
        {
            "query_idx": pa.array(out["query_idx"], pa.int32()),
            id_col: pa.array(out[id_col], pa.int64()),
            "score": pa.array(out["score"], pa.float64()),
        }
    )


class IVFIndex:
    """Tiny IVF: k-means centroids + inverted lists, built from a Dataset."""

    def __init__(self, n_centroids: int = 16, iters: int = 10, seed: int = 3):
        self.n_centroids = n_centroids
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def fit(self, sample: np.ndarray) -> "IVFIndex":
        x = _normalize(np.asarray(sample, dtype=np.float64))
        r = np.random.default_rng(self.seed)
        c = x[r.choice(len(x), size=min(self.n_centroids, len(x)), replace=False)]
        for _ in range(self.iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(len(c)):
                members = x[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
            c = _normalize(c)
        self.centroids = c
        return self

    def assign_batch(self, batch: pa.Table, vec_col: str) -> pa.Table:
        vecs = _normalize(vecs_of(batch, vec_col))
        assign = np.argmax(vecs @ self.centroids.T, axis=1).astype(np.int32)
        return batch.append_column("centroid", pa.array(assign, pa.int32()))


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF-probed top-k: only blocks of the nprobe closest centroids are
    scanned per query."""
    sample = np.array(
        ds.limit(4096).to_pandas()[vec_col].tolist(), dtype=np.float64
    )
    index = IVFIndex(n_centroids=n_centroids).fit(sample)
    assigned = ds.map_batches(
        lambda b: index.assign_batch(b, vec_col), batch_format="pyarrow"
    )
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(q @ index.centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_sets = [set(map(int, row)) for row in probes]

    def partial(batch: pa.Table) -> pa.Table:
        vecs = _normalize(vecs_of(batch, vec_col))
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        cents = np.asarray(batch["centroid"].to_pylist(), dtype=np.int32)
        rows = {"query_idx": [], id_col: [], "score": []}
        for qi in range(len(q)):
            mask = np.isin(cents, list(probe_sets[qi]))
            if not mask.any():
                continue
            sims = vecs[mask] @ q[qi]
            sub_ids = ids[mask]
            kk = min(k, len(sub_ids))
            top = np.argpartition(-sims, kk - 1)[:kk]
            for r in top:
                rows["query_idx"].append(qi)
                rows[id_col].append(int(sub_ids[r]))
                rows["score"].append(float(sims[r]))
        return pa.table(
            {
                "query_idx": pa.array(rows["query_idx"], pa.int32()),
                id_col: pa.array(rows[id_col], pa.int64()),
                "score": pa.array(rows["score"], pa.float64()),
            }
        )

    import ray

    tables = [
        t
        for t in (ray.get(r) for r in assigned.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows
    ]
    if not tables:
        return pa.table(
            {"query_idx": pa.array([], pa.int32()), id_col: pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )
    df = pa.concat_tables(tables).to_pandas()
    out = {"query_idx": [], id_col: [], "score": []}
    for qi, g in df.groupby("query_idx"):
        best = heapq.nsmallest(k, g.itertuples(index=False), key=lambda t: (-t.score, getattr(t, id_col)))
        for t in best:
            out["query_idx"].append(qi)
            out[id_col].append(getattr(t, id_col))
            out["score"].append(t.score)
    return pa.table(
        {
            "query_idx": pa.array(out["query_idx"], pa.int32()),
            id_col: pa.array(out[id_col], pa.int64()),
            "score": pa.array(out["score"], pa.float64()),
        }
    )
