"""stages/graph.py::triangle_counts vs the dense linear-algebra ground
truth: per-node triangle participation is diag(A³)/2 for the 0/1
adjacency matrix of the canonicalized simple graph. Random graphs
exercise duplicate edges, both orientations, self-loops, isolated
nodes, hubs (skewed degrees) and the empty graph."""

import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")


def _brute_tri_counts(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    A = np.zeros((n, n), np.int64)
    for a, b in edges:
        if a != b:
            A[a, b] = 1
            A[b, a] = 1
    d = np.diagonal(A @ A @ A) // 2
    return {i: int(c) for i, c in enumerate(d) if c > 0}


def _run(edges_rows: list[tuple[int, int]]):
    import ray.data as rd

    from lopez_ray.stages.graph import triangle_counts

    tbl = pa.table(
        {
            "a": pa.array([a for a, _ in edges_rows], pa.int64()),
            "b": pa.array([b for _, b in edges_rows], pa.int64()),
        }
    )
    out = triangle_counts(rd.from_arrow(tbl)).to_pandas()
    if len(out) == 0:  # Ray 2.49 zero-row Datasets are schema-less
        return {}
    return dict(zip(out["node"], out["n_tri"]))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n,p", [(12, 0.3), (30, 0.15), (50, 0.08)])
def test_triangles_match_dense_reference(ray_session, seed, n, p):
    rng = np.random.default_rng(1234 + seed)
    # raw rows include duplicates, reversed orientation, and self-loops
    raw = []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < p:
                raw.append((i, j))
                if rng.random() < 0.3:
                    raw.append((j, i))  # reversed duplicate
    raw += [(i, i) for i in range(0, n, 7)]  # self-loops must be dropped
    got = _run(raw)
    want = _brute_tri_counts(n, [(a, b) for a, b in raw if a != b])
    assert got == want


def test_triangles_hub_graph(ray_session):
    # star + one chord: exactly one triangle (hub, 1, 2); the hub's
    # degree would make a naive wedge plan O(hub²) — orientation keeps
    # the hub a SINK, so its out-degree is ≤ 1
    hub = 0
    edges = [(hub, i) for i in range(1, 40)] + [(1, 2)]
    got = _run(edges)
    assert got == {0: 1, 1: 1, 2: 1}


def test_triangles_triangle_free(ray_session):
    # even cycle: no triangles → empty result
    edges = [(i, (i + 1) % 10) for i in range(10)]
    assert _run(edges) == {}


def _brute_common_neighbors(n, edges):
    A = np.zeros((n, n), np.int64)
    for a, b in edges:
        if a != b:
            A[a, b] = 1
            A[b, a] = 1
    C = A @ A
    out = {}
    for i in range(n):
        for j in range(i + 1, n):
            if C[i, j] > 0 and A[i, j] == 0:
                out[(i, j)] = int(C[i, j])
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n,p", [(15, 0.25), (40, 0.1)])
def test_common_neighbors_match_dense_reference(ray_session, seed, n, p):
    import ray.data as rd

    from lopez_ray.stages.graph import common_neighbors

    rng = np.random.default_rng(99 + seed)
    raw = [
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if rng.random() < p
    ]
    raw += [(b, a) for a, b in raw[::3]]  # reversed duplicates
    tbl = pa.table(
        {
            "a": pa.array([a for a, _ in raw], pa.int64()),
            "b": pa.array([b for _, b in raw], pa.int64()),
        }
    )
    out = common_neighbors(rd.from_arrow(tbl)).to_pandas()
    got = (
        {}
        if len(out) == 0
        else {(a, b): c for a, b, c in zip(out["a"], out["b"], out["cn"])}
    )
    assert got == _brute_common_neighbors(n, raw)
