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


def read_parquet_clean(path: str, columns: list[str] | None = None):
    """``ray.data.read_parquet`` with the file-level metadata blob
    stripped from the schema. Pandas-written parquet carries a
    ``pandas`` metadata entry that makes ``hash(schema)`` raise, so
    every read task logs Ray's "Failed to hash the schemas (for
    deduplication): unhashable type: 'dict'" warning (VERDICT r4 #4
    bench-tail noise); passing an explicit metadata-free schema keeps
    schema dedup working and the log clean. Column pruning still
    pushes into the read."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    sfile = path
    if os.path.isdir(path):
        parts = sorted(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if not parts:
            return rd.read_parquet(path, columns=columns)
        sfile = parts[0]
    schema = pq.read_schema(sfile).remove_metadata()
    if columns:
        # the explicit schema must match the PRUNED block layout
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=schema)


def read_corpus(path: str, columns: list[str] | None = None):
    """Read a corpus table as a ray.data.Dataset with column pruning
    pushed into the read."""
    import ray.data as rd

    if HAVE_LANCE and (path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))):
        return rd.read_lance(path, columns=columns)
    return read_parquet_clean(path, columns=columns)


def _is_lance_dir(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "_versions")) or path.endswith(".lance")


def read_table(path: str, columns: list[str] | None = None):
    """pa.Table from a table path written by ``write_table`` /
    ``write_dataset`` — the READ side of the format seam. Detects the
    on-disk format (a Lance dataset directory vs a parquet file or a
    directory of parquet slices) so crawl readers keep working whichever
    branch the sink took (they were parquet-only before: a Lance-enabled
    environment wrote status/wave data no reader could open)."""
    if HAVE_LANCE and _is_lance_dir(path):
        import lance as _lance

        return _lance.dataset(path).to_table(columns=columns)
    if HAVE_LANCE and os.path.isdir(path):
        # per-shard layout: <path>/shard-K.parquet each a Lance dataset dir
        shards = sorted(
            os.path.join(path, d)
            for d in os.listdir(path)
            if _is_lance_dir(os.path.join(path, d))
        )
        if shards:
            import lance as _lance
            import pyarrow as pa

            return pa.concat_tables(
                [_lance.dataset(s).to_table(columns=columns) for s in shards]
            )
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=columns)


def read_dataset_dirs(paths: list[str], columns: list[str] | None = None):
    """Ray Dataset over a list of per-wave output directories (each
    written by ``write_dataset``), format-detected per directory."""
    import ray.data as rd

    def _lance_subdirs(p: str) -> list[str]:
        if not (HAVE_LANCE and os.path.isdir(p)):
            return []
        return sorted(
            os.path.join(p, d)
            for d in os.listdir(p)
            if _is_lance_dir(os.path.join(p, d))
        )

    # Format is detected PER DIRECTORY, not from paths[0]: a crawl
    # resumed under a different environment can legitimately leave
    # mixed-format wave dirs (lance-written waves + parquet-written
    # waves), and keying on the first dir would silently drop every
    # wave in the other format from edge harvest / status reads.
    import glob

    lance_leaf: list[str] = []
    parquet_files: list[str] = []
    for p in paths:
        subs = [p] if (HAVE_LANCE and _is_lance_dir(p)) else _lance_subdirs(p)
        if subs:
            lance_leaf.extend(subs)
        elif os.path.isdir(p):
            # rd.read_parquet on a list accepts files, not dirs: expand
            parquet_files.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
        else:
            parquet_files.append(p)
    parts = [rd.read_lance(s, columns=columns) for s in lance_leaf]
    if parquet_files:
        parts.append(rd.read_parquet(parquet_files, columns=columns))
    if not parts:
        return rd.from_items([])
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]


def dataset_schema(path: str):
    """Arrow schema of one written dataset directory (cheap metadata read)."""
    if HAVE_LANCE and os.path.isdir(path):
        import lance as _lance

        if _is_lance_dir(path):
            return _lance.dataset(path).schema
        subs = sorted(
            os.path.join(path, d)
            for d in os.listdir(path)
            if _is_lance_dir(os.path.join(path, d))
        )
        if subs:
            return _lance.dataset(subs[0]).schema
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise FileNotFoundError(
            f"dataset_schema: no lance dataset or parquet files under {path}"
        )
    return pq.read_schema(files[0])


def _has_data_files(path: str) -> bool:
    """True when the directory holds at least one readable data file
    (lance subdir or parquet). A wave dir can exist empty: the async
    wave writer creates the directory first and a crash before the
    atomic rename lands leaves it file-less.

    Lance-shaped content is detected WITHOUT importing lance (the
    marker is filesystem-only): a crawl written under a lance-enabled
    environment but read where lance isn't importable must fail loudly
    rather than be silently classified as an empty dir and dropped
    from pagerank/edge-harvest results."""
    has_lance_shape = _is_lance_dir(path) or any(
        _is_lance_dir(os.path.join(path, d)) for d in os.listdir(path)
    )
    if has_lance_shape:
        if not HAVE_LANCE:
            raise RuntimeError(
                f"wave dir {path} holds Lance data but the lance package "
                "is not importable here — refusing to silently skip it"
            )
        return True
    return any(f.endswith(".parquet") for f in os.listdir(path))


def list_wave_dirs(wave_dir: str) -> list[str]:
    """Per-wave output directories under a crawl's wave_dir, sorted.
    Empty wave dirs (created but never populated — e.g. a crash between
    mkdir and the atomic file rename) are skipped so downstream schema
    reads don't trip on a file-less directory."""
    if not os.path.isdir(wave_dir):
        return []
    return sorted(
        os.path.join(wave_dir, d)
        for d in os.listdir(wave_dir)
        if d.startswith("wave=")
        and os.path.isdir(os.path.join(wave_dir, d))
        and _has_data_files(os.path.join(wave_dir, d))
    )


def write_dataset(ds, path: str) -> None:
    """Write a Dataset to the preferred format (Lance when available,
    partitioned Parquet otherwise). Output is a directory of per-block
    files either way — resumable, never one giant file."""
    if HAVE_LANCE:
        ds.write_lance(path)
    else:
        ds.write_parquet(path)


def write_block(table, directory: str, index: int) -> str:
    """One block of a dataset directory through the format seam: a
    ``NNNNNN.parquet`` file (atomic tmp+rename), or a per-block Lance
    dataset subdir when Lance is available. The crawl's async wave
    writers use this so each block lands independently off the wave
    barrier's critical path; ``read_table``/``read_dataset_dirs``
    understand both layouts."""
    os.makedirs(directory, exist_ok=True)
    if HAVE_LANCE:
        import lance as _lance

        path = os.path.join(directory, f"{index:06d}.lance")
        _lance.write_dataset(table, path, mode="create")
        return path
    import pyarrow.parquet as pq

    path = os.path.join(directory, f"{index:06d}.parquet")
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


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
