"""Vectorized batch versions of the lopez transformer library
(SURVEY.md §2.2) for use inside ``map_batches`` over Arrow batches.

Each function maps a pyarrow Array/ChunkedArray → pyarrow Array using
pyarrow.compute kernels where one exists (matches/replace/length), the
vectorized SipHash for ``hash``, and a tight Python loop only where the
semantics are inherently scalar (``pretty``, ``capture`` group-maps) —
mirroring transformer.rs eval semantics (null propagation included).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..dsl.exprs import capture_json, pretty as _pretty_scalar
from ..hash import page_ids


def _as_array(arr):
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def hash_column(arr) -> pa.Array:
    """`hash` transformer: SipHash24(string) → i64, null-propagating.
    Hashes the arrow column's UTF-8 bytes directly (binary cast — no
    per-value str decode/encode round-trip); the Rust ``Hash for str``
    0xff terminator is appended per payload as in ``page_ids``."""
    from ..hash import siphash24_batch

    arr = _as_array(arr)
    data = arr.fill_null("").cast(pa.large_binary()).to_pylist()
    hashes = siphash24_batch([b + b"\xff" for b in data])
    out = pa.array(hashes.view(np.int64), pa.int64())
    if arr.null_count:
        out = pc.if_else(pc.is_valid(arr), out, pa.nulls(len(arr), pa.int64()))
    return out


def length_bytes(arr) -> pa.Array:
    """`length` on strings counts UTF-8 bytes (transformer.rs:350)."""
    arr = _as_array(arr)
    return pc.binary_length(arr.cast(pa.large_binary())).cast(pa.int64())


def pretty_column(arr) -> pa.Array:
    arr = _as_array(arr)
    return pa.array(
        [None if v is None else _pretty_scalar(v) for v in arr.to_pylist()],
        pa.large_utf8(),
    )


def matches_column(arr, pattern: str) -> pa.Array:
    """`matches "re"` → bool (search semantics, not fullmatch)."""
    return pc.match_substring_regex(_as_array(arr), pattern)


def replace_column(arr, pattern: str, replacement: str) -> pa.Array:
    """`replace "re" with "s"` → replace-all."""
    return pc.replace_substring_regex(
        _as_array(arr), pattern, replacement=replacement
    )


def capture_column(arr, pattern: str) -> pa.Array:
    """`capture "re"` → map of group name/idx → text (first match)."""
    rx = re.compile(pattern)
    out = []
    for v in _as_array(arr).to_pylist():
        if v is None:
            out.append(None)
            continue
        m = rx.search(v)
        out.append(list(capture_json(rx, m).items()) if m else None)
    return pa.array(out, pa.map_(pa.large_utf8(), pa.large_utf8()))


def capture_group_column(arr, pattern: str, group: int | str = 0) -> pa.Array:
    """capture + `get "k"` fused: first match's group text else null."""
    rx = re.compile(pattern)
    out = []
    for v in _as_array(arr).to_pylist():
        if v is None:
            out.append(None)
            continue
        m = rx.search(v)
        out.append(m.group(group) if m else None)
    return pa.array(out, pa.large_utf8())


def as_number_column(arr) -> pa.Array:
    """`as-number`: strict Rust-style f64 parse else null."""
    from ..dsl.exprs import rust_parse_f64

    out = [
        None if v is None else rust_parse_f64(v)
        for v in _as_array(arr).to_pylist()
    ]
    return pa.array(out, pa.float64())
