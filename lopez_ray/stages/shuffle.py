"""High-cardinality shuffle reductions.

Ray Data's ``groupby(keys).aggregate(...)`` sort-aggregates with a
Python-level per-row accumulator, which is fine for a handful of groups
(a 5-language count) but collapses when the number of DISTINCT keys is
O(rows): measured on this box, 80k distinct (a, b) pairs aggregate at
~700 rows/s from pandas blocks and ~5k rows/s from Arrow blocks — a
pair-dedup that should be milliseconds takes minutes, and the cost is
linear in the corpus.

``partitioned_reduce`` keeps the shuffle but bounds the group count the
Ray layer ever sees: rows are hash-partitioned on the key columns into
``n_parts`` buckets (vectorized mix in ``map_batches``), Ray shuffles on
the single low-cardinality ``__part`` key, and the real per-key
reduction runs INSIDE each partition as one C-speed pandas groupby.
Exactly one shuffle, same key co-location guarantee, and ``n_parts``
scales with the cluster instead of with the data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_PHI = np.uint64(0x9E3779B97F4A7C15)


def _mix_columns(batch: pa.Table, key_cols: list[str]) -> np.ndarray:
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in key_cols:
            v = batch[c].to_numpy(zero_copy_only=False)
            v = v.astype(np.int64, copy=False).view(np.uint64)
            h = h * _PHI + v
        # finalizer so low-entropy keys still spread over parts
        h ^= h >> np.uint64(33)
        h = h * _PHI
    return h


def partitioned_reduce(ds, key_cols: list[str], reduce_fn, n_parts: int = 64):
    """groupby(key_cols) → ``reduce_fn`` for key spaces with O(rows)
    distinct keys. ``reduce_fn`` receives one partition's rows as a
    pandas DataFrame (all rows of any given key, guaranteed — the
    partition is a superset of whole key-groups) and must itself group
    by ``key_cols`` (one vectorized pandas groupby) and return the
    reduced frame. The helper strips the internal ``__part`` column."""

    def add_part(batch: pa.Table) -> pa.Table:
        part = (_mix_columns(batch, key_cols) % np.uint64(n_parts)).astype(
            np.int64
        )
        return batch.append_column("__part", pa.array(part, pa.int64()))

    def run(group):
        out = reduce_fn(group.drop(columns="__part"))
        return out

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(run, batch_format="pandas")
    )
