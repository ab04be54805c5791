"""Property-based hardening of the cuckoo URL-seen filter
(state/cuckoo.py) — the frontier's fast negative path. The contract the
crawler relies on: an item whose insert SUCCEEDED is never reported
absent (no false negatives), the vectorized ``contains_many`` is
bit-identical to the scalar path, and a checkpoint round-trip preserves
membership exactly."""

import sys

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from lopez_ray.state.cuckoo import CuckooFilter  # noqa: E402

U64 = st.integers(min_value=0, max_value=2**64 - 1)


@given(
    present=st.lists(U64, min_size=0, max_size=300, unique=True),
    probes=st.lists(U64, min_size=0, max_size=100),
)
@settings(max_examples=40, deadline=None)
def test_no_false_negatives_and_bulk_parity(present, probes):
    f = CuckooFilter(max(16, len(present) * 2))
    # API contract: add_hash/contains_hash take PYTHON ints (the
    # frontier masks pids to u64 ints before calling); numpy scalars
    # are only legal on the vectorized contains_many path
    inserted = [h for h in present if f.add_hash(int(h))]
    # the filter is sized 2x, so nothing should saturate here
    assert len(inserted) == len(present)
    for h in inserted:
        assert f.contains_hash(int(h))
    # vectorized path must agree with the scalar path on EVERY probe
    # (present, absent, and the false-positive maybes alike)
    all_probes = np.array(inserted + probes, dtype=np.uint64)
    bulk = f.contains_many(all_probes)
    scalar = np.array([f.contains_hash(int(h)) for h in all_probes], dtype=bool)
    assert (bulk == scalar).all()
    assert bulk[: len(inserted)].all()  # no false negatives, vectorized too


@given(present=st.lists(U64, min_size=1, max_size=200, unique=True))
@settings(max_examples=25, deadline=None)
def test_checkpoint_roundtrip_preserves_membership(present):
    f = CuckooFilter(max(16, len(present) * 2))
    for h in present:
        assert f.add_hash(int(h))
    g = CuckooFilter.from_state(f.state())
    probes = np.array(present, dtype=np.uint64)
    assert (g.contains_many(probes) == f.contains_many(probes)).all()
    assert g.contains_many(probes).all()
    assert g.count == f.count and g.n_buckets == f.n_buckets
