"""Corpus source/sink: Lance-first with a Parquet fallback.

The north rule's storage surface is Lance tables of
(image_id, bytes, w, h, fmt, caption, phash) rows (BASELINE.json
input_hint; reference sink described in SURVEY.md §2.6). The ``lance``
package is not available in this container, so both directions are
import-try gated: when lance is importable we use
``ray.data.read_lance`` / ``Dataset.write_lance``; otherwise Parquet
with identical schema and the same partitioned-directory layout. All
call sites go through this module so the swap is one predicate.
"""

from __future__ import annotations

import os

try:  # pragma: no cover - container has no lance
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_corpus(path: str, columns: list[str] | None = None):
    """Read a corpus table as a ray.data.Dataset with column pruning
    pushed into the read."""
    import ray.data as rd

    if HAVE_LANCE and (path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))):
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def write_dataset(ds, path: str) -> None:
    """Write a Dataset to the preferred format (Lance when available,
    partitioned Parquet otherwise). Output is a directory of per-block
    files either way — resumable, never one giant file."""
    if HAVE_LANCE:
        ds.write_lance(path)
    else:
        ds.write_parquet(path)


def write_table(table, path: str) -> None:
    """Single-table write through the same format predicate (used by the
    per-shard status writers — each shard owns one slice file/fragment,
    so the O(total-URLs) table never funnels through the driver)."""
    if HAVE_LANCE:
        import lance as _lance

        _lance.write_dataset(table, path, mode="create")
    else:
        import pyarrow.parquet as pq

        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
