"""Property-based hardening of the two cluster kernels under the image
family: ``signature_near_dups`` (banded hamming pair search — must be
EXACT at the threshold) and ``connected_components`` (BSP min-label
propagation) — hypothesis drives randomized signature corpora /
edge lists against brute-force / union-find oracles. Example counts
are small (every example is a real Ray exchange); the value is the
generator's corners: all-identical signatures (one hot clique),
single rows, thresholds at the band-width boundaries, self-loops,
duplicate and reversed edges."""

import sys

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

SIG = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@st.composite
def sig_corpus(draw):
    """Base signatures + planted near-flips so in/near/over-threshold
    pairs all occur; allows duplicates (identical-signature cliques)."""
    base = draw(st.lists(SIG, min_size=1, max_size=25))
    sigs = list(base)
    n_planted = draw(st.integers(min_value=0, max_value=15))
    for k in range(n_planted):
        src = sigs[draw(st.integers(0, len(base) - 1))]
        nbits = draw(st.integers(min_value=0, max_value=9))
        flip = 0
        for b in draw(
            st.lists(
                st.integers(0, 63), min_size=nbits, max_size=nbits, unique=True
            )
        ):
            flip |= 1 << b
        v = (src ^ flip) & (2**64 - 1)  # keep the XOR in int64 range
        sigs.append(v - 2**64 if v >= 2**63 else v)
    return sigs


@given(sigs=sig_corpus(), max_d=st.integers(min_value=0, max_value=8))
@_SETTINGS
def test_signature_near_dups_exact_prop(ray_session, sigs, max_d):
    import ray.data as rd

    from lopez_ray.stages.dedup import signature_near_dups

    ids = np.arange(len(sigs), dtype=np.int64)
    ds = rd.from_arrow(
        pa.table(
            {"kid": pa.array(ids), "sig": pa.array(sigs, pa.int64())}
        )
    )
    got = signature_near_dups(ds, max_d, id_col="kid", sig_col="sig").to_pandas()
    got_set = (
        set()
        if got.empty  # zero pairs → column-less empty Dataset
        else {
            (int(a), int(b), int(d))
            for a, b, d in zip(got["a"], got["b"], got["hamming"])
        }
    )
    want = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            d = bin((sigs[i] ^ sigs[j]) & (2**64 - 1)).count("1")
            if d <= max_d:
                want.add((i, j, d))
    assert got_set == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=120,
    )
)
@_SETTINGS
def test_connected_components_prop(ray_session, edges):
    from lopez_ray.stages.cc import connected_components

    tbl = pa.table(
        {
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    out = connected_components(tbl).to_pandas()
    got = dict(zip(out["node"].astype(int), out["group_id"].astype(int)))

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in list(parent)}
    assert got == want
