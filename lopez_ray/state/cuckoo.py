"""Cuckoo filter for URL-seen pre-filtering at frontier scale.

North-rule scale posture: a 10^10-URL frontier cannot keep an exact
Python-dict seen-set per shard in memory; the cuckoo filter gives ~2 bytes
per key at 3% false-positive rate and supports deletion (unlike Bloom).

Usage in the frontier shard (crawler/frontier.py): the filter is a fast
negative path — "not in filter" proves a URL is new with zero lookups in
the exact store; "maybe in filter" falls through to the exact store so
correctness at test scale is never affected by false positives. The filter
state is numpy-backed and serializes compactly into checkpoints.

Construction follows Fan et al., "Cuckoo Filter: Practically Better Than
Bloom" (CoNEXT 2014): 4-slot buckets, 16-bit fingerprints,
partial-cuckoo-hashing with alt bucket = bucket XOR hash(fingerprint).
"""

from __future__ import annotations

import numpy as np

_EMPTY = 0
_MAX_KICKS = 500


def _fingerprint(h: np.uint64) -> int:
    fp = (int(h) >> 32) & 0xFFFF
    return fp if fp != _EMPTY else 1


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 0x5BD1E995):
        n_buckets = 1
        while n_buckets * 4 < capacity * 1.05:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.seed = seed
        self.count = 0

    def _indices(self, h: int) -> tuple[int, int, int]:
        fp = _fingerprint(h)
        i1 = h & (self.n_buckets - 1)
        i2 = (i1 ^ (fp * 0x5BD1E995)) & (self.n_buckets - 1)
        return fp, i1, i2

    def contains_hash(self, h: int) -> bool:
        fp, i1, i2 = self._indices(h)
        return fp in self.table[i1] or fp in self.table[i2]

    def add_hash(self, h: int) -> bool:
        """Insert; returns False only if the filter is saturated (caller
        should then treat everything as 'maybe seen' → exact-store path)."""
        fp, i1, i2 = self._indices(h)
        for i in (i1, i2):
            row = self.table[i]
            empt = np.nonzero(row == _EMPTY)[0]
            if len(empt):
                row[empt[0]] = fp
                self.count += 1
                return True
        # Kick loop
        rng = np.random.default_rng(h & 0xFFFFFFFF)
        i = i1 if rng.integers(0, 2) else i2
        for _ in range(_MAX_KICKS):
            slot = int(rng.integers(0, 4))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = (i ^ (fp * 0x5BD1E995)) & (self.n_buckets - 1)
            row = self.table[i]
            empt = np.nonzero(row == _EMPTY)[0]
            if len(empt):
                row[empt[0]] = fp
                self.count += 1
                return True
        return False

    # numpy bulk path used by the frontier merge (vectorized mirror of
    # contains_hash — identical fingerprint/index math, no Python loop)
    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes).astype(np.uint64, copy=False)
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        fp = ((h >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)
        fp[fp == _EMPTY] = 1
        mask = np.int64(self.n_buckets - 1)
        i1 = (h & np.uint64(self.n_buckets - 1)).astype(np.int64)
        i2 = (i1 ^ (fp * 0x5BD1E995)) & mask
        fp16 = fp.astype(np.uint16)[:, None]
        return (self.table[i1] == fp16).any(axis=1) | (
            self.table[i2] == fp16
        ).any(axis=1)

    def state(self) -> dict:
        return {"table": self.table, "count": self.count, "n_buckets": self.n_buckets}

    @classmethod
    def from_state(cls, st: dict) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.table = st["table"]
        f.count = st["count"]
        f.n_buckets = st["n_buckets"]
        f.seed = 0x5BD1E995
        return f
