"""SipHash-2-4 with bit-parity to the reference's ``hash`` function.

The reference hashes URLs (and the ``hash`` transformer input) with
``SipHasher24::new()`` — i.e. SipHash-2-4 keyed with (0, 0) — over the bytes
Rust's ``Hash for str`` feeds it: the UTF-8 bytes followed by a single
``0xff`` terminator byte (see ``/root/reference/lib-lopez/src/hash.rs:5-10``).
The resulting ``u64`` is reinterpreted as ``i64`` (two's complement).

Two implementations are provided:

- ``siphash24``: scalar, pure Python — reference implementation, used for
  single values and validated against the published SipHash test vectors.
- ``page_ids``: numpy-vectorized batch variant used in hot ``map_batches``
  stages (hashes thousands of URLs per call without a Python-per-byte loop).
"""

from __future__ import annotations

import numpy as np

_MASK = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, b: int) -> int:
    return ((x << b) | (x >> (64 - b))) & _MASK


def siphash24(data: bytes, k0: int = 0, k1: int = 0) -> int:
    """SipHash-2-4 of ``data`` with 128-bit key (k0, k1). Returns u64."""
    v0 = k0 ^ 0x736F6D6570736575
    v1 = k1 ^ 0x646F72616E646F6D
    v2 = k0 ^ 0x6C7967656E657261
    v3 = k1 ^ 0x7465646279746573

    def sipround(v0: int, v1: int, v2: int, v3: int):
        v0 = (v0 + v1) & _MASK
        v1 = _rotl(v1, 13) ^ v0
        v0 = _rotl(v0, 32)
        v2 = (v2 + v3) & _MASK
        v3 = _rotl(v3, 16) ^ v2
        v0 = (v0 + v3) & _MASK
        v3 = _rotl(v3, 21) ^ v0
        v2 = (v2 + v1) & _MASK
        v1 = _rotl(v1, 17) ^ v2
        v2 = _rotl(v2, 32)
        return v0, v1, v2, v3

    n = len(data)
    end = n - (n % 8)
    for i in range(0, end, 8):
        m = int.from_bytes(data[i : i + 8], "little")
        v3 ^= m
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
        v0 ^= m

    b = (n & 0xFF) << 56
    b |= int.from_bytes(data[end:], "little")
    v3 ^= b
    v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
    v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
    v0 ^= b
    v2 ^= 0xFF
    for _ in range(4):
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
    return (v0 ^ v1 ^ v2 ^ v3) & _MASK


def _to_i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def rust_str_hash(s: str) -> int:
    """Bit-parity with the reference's ``hash(&String)`` → i64.

    Rust's ``Hash for str`` writes the bytes then a 0xff terminator;
    ``SipHasher24::new()`` keys with (0, 0).
    """
    return _to_i64(siphash24(s.encode("utf-8") + b"\xff"))


def page_id(url: str) -> int:
    """page_id = SipHash24(url string) as i64 (reference hash.rs:5-10)."""
    return rust_str_hash(url)


# ---------------------------------------------------------------------------
# Vectorized batch variant
# ---------------------------------------------------------------------------

_U64 = np.uint64


def _np_rotl(x: np.ndarray, b: int) -> np.ndarray:
    return (x << _U64(b)) | (x >> _U64(64 - b))


def _np_sipround(v0, v1, v2, v3):
    v0 = v0 + v1
    v1 = _np_rotl(v1, 13) ^ v0
    v0 = _np_rotl(v0, 32)
    v2 = v2 + v3
    v3 = _np_rotl(v3, 16) ^ v2
    v0 = v0 + v3
    v3 = _np_rotl(v3, 21) ^ v0
    v2 = v2 + v1
    v1 = _np_rotl(v1, 17) ^ v2
    v2 = _np_rotl(v2, 32)
    return v0, v1, v2, v3


def siphash24_batch(payloads: list[bytes]) -> np.ndarray:
    """SipHash-2-4 (key 0,0) of many byte strings at once → uint64 array.

    Strings are grouped by 8-byte-block count so each group runs the
    compression rounds lock-step across the whole group with numpy u64
    arithmetic. For URL-sized strings this is ~20-40x faster than the
    scalar path.
    """
    n = len(payloads)
    out = np.zeros(n, dtype=_U64)
    if n == 0:
        return out
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    order = np.argsort(lens // 8, kind="stable")
    nblocks = lens // 8

    i = 0
    with np.errstate(over="ignore"):
        while i < n:
            nb = nblocks[order[i]]
            j = i
            while j < n and nblocks[order[j]] == nb:
                j += 1
            idx = order[i:j]
            g = len(idx)
            # Pack each payload into nb full blocks + 1 tail block.
            full = np.zeros((g, nb + 1), dtype=_U64)
            for r, k in enumerate(idx):
                p = payloads[k]
                ln = len(p)
                end = ln - (ln % 8)
                if end:
                    full[r, : end // 8] = np.frombuffer(p[:end], dtype="<u8")
                tail = int.from_bytes(p[end:], "little") | ((ln & 0xFF) << 56)
                full[r, nb] = tail
            v0 = np.full(g, 0x736F6D6570736575, dtype=_U64)
            v1 = np.full(g, 0x646F72616E646F6D, dtype=_U64)
            v2 = np.full(g, 0x6C7967656E657261, dtype=_U64)
            v3 = np.full(g, 0x7465646279746573, dtype=_U64)
            for blk in range(nb + 1):
                m = full[:, blk]
                v3 = v3 ^ m
                v0, v1, v2, v3 = _np_sipround(v0, v1, v2, v3)
                v0, v1, v2, v3 = _np_sipround(v0, v1, v2, v3)
                v0 = v0 ^ m
            v2 = v2 ^ _U64(0xFF)
            for _ in range(4):
                v0, v1, v2, v3 = _np_sipround(v0, v1, v2, v3)
            out[idx] = v0 ^ v1 ^ v2 ^ v3
            i = j
    return out


def page_ids(urls) -> np.ndarray:
    """Vectorized ``page_id`` over an iterable of URL strings → int64 array."""
    payloads = [u.encode("utf-8") + b"\xff" for u in urls]
    return siphash24_batch(payloads).view(np.int64)


def md5_u64(data: bytes) -> int:
    """Oracle-shared 64-bit hash: little-endian uint64 of MD5 digest
    bytes [8:16] — exactly DuckDB's ``md5_number_lower(s)::ubigint``, so
    any operator built on it (simhash / minhash / winnowing fingerprints)
    has a DuckDB-expressible oracle. Not a speed hash: use siphash24 for
    page ids (reference bit-parity) and this only where SQL must agree."""
    import hashlib

    return int.from_bytes(hashlib.md5(data).digest()[8:16], "little")


def md5_u64_batch(payloads: list[bytes]) -> np.ndarray:
    """Vectorized-enough batch variant (one C-speed md5 per item, no
    Python-per-byte work); returns uint64 array."""
    import hashlib

    md5 = hashlib.md5
    return np.fromiter(
        (
            int.from_bytes(md5(p).digest()[8:16], "little")
            for p in payloads
        ),
        dtype=np.uint64,
        count=len(payloads),
    )


def md5_u128_batch(payloads: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Full 128-bit MD5 per item as two uint64 arrays (lo = digest bytes
    [8:16] little-endian — identical to ``md5_u64_batch`` / DuckDB
    ``md5_number_lower`` — hi = bytes [0:8] = ``md5_number_upper``).
    Used where a 64-bit content key is not collision-safe at the design
    point (exact dedup over 10^10 docs: expected 64-bit collisions > 1,
    and a collision there silently merges distinct documents)."""
    import hashlib

    md5 = hashlib.md5
    n = len(payloads)
    lo = np.empty(n, dtype=np.uint64)
    hi = np.empty(n, dtype=np.uint64)
    for i, p in enumerate(payloads):
        d = md5(p).digest()
        lo[i] = int.from_bytes(d[8:16], "little")
        hi[i] = int.from_bytes(d[0:8], "little")
    return lo, hi
