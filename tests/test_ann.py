"""IVF k-means sampling: the fit sample must be unbiased w.r.t. input
order (round-2 regression: ``ds.limit(4096)`` took the FIRST blocks, so
a corpus sorted/clustered by content mis-covered the tail clusters and
recall silently degraded)."""

import numpy as np
import pyarrow as pa
import pytest


def _clustered_sorted_dataset(n_per=6000, dim=16, seed=11):
    """Two well-separated clusters, SORTED so cluster A fills the first
    blocks entirely — the adversarial input for head-biased sampling."""
    r = np.random.default_rng(seed)
    a = r.normal(size=(n_per, dim)) * 0.05
    a[:, 0] += 10.0
    b = r.normal(size=(n_per, dim)) * 0.05
    b[:, 1] += 10.0
    vecs = np.concatenate([a, b])  # A first, B second — sorted by cluster
    ids = np.arange(2 * n_per, dtype=np.int64)
    import ray.data as rd

    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
        }
    )
    # many small blocks so limit(4096) would see ONLY cluster A
    return rd.from_arrow(tbl).repartition(24), vecs


@pytest.mark.usefixtures("ray_session")
def test_sample_matrix_covers_tail_clusters():
    from lopez_ray.stages.ann import _sample_matrix

    ds, vecs = _clustered_sorted_dataset()
    sample = _sample_matrix(ds, "vec_id", "embedding", 2048)
    assert sample.shape == (2048, 16)
    # roughly half the sample must come from the tail cluster B
    n_b = int((sample[:, 1] > 5).sum())
    assert 700 < n_b < 1400, n_b


@pytest.mark.usefixtures("ray_session")
def test_sample_matrix_deterministic_under_repartition():
    from lopez_ray.stages.ann import _sample_matrix

    ds, _ = _clustered_sorted_dataset()
    s1 = _sample_matrix(ds, "vec_id", "embedding", 512)
    s2 = _sample_matrix(ds.repartition(7), "vec_id", "embedding", 512)
    # winner SET is hash-of-id based → identical regardless of blocking
    key1 = np.lexsort(s1.T)
    key2 = np.lexsort(s2.T)
    assert np.allclose(s1[key1], s2[key2])


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall_on_sorted_clustered_input():
    """Queries aimed at the TAIL cluster must still find their true
    neighbors — the head-biased fit failed this."""
    from lopez_ray.stages.ann import brute_force_topk, ivf_topk

    ds, vecs = _clustered_sorted_dataset(n_per=3000)
    r = np.random.default_rng(5)
    qs = r.normal(size=(4, 16)) * 0.05
    qs[:, 1] += 10.0  # all queries in cluster B (the tail)
    exact = brute_force_topk(ds, qs, k=10).to_pandas()
    approx = ivf_topk(ds, qs, k=10, n_centroids=8, nprobe=4).to_pandas()
    recalls = []
    for qi in exact.query_idx.unique():
        t = set(exact[exact.query_idx == qi].vec_id)
        g = set(approx[approx.query_idx == qi].vec_id)
        recalls.append(len(t & g) / len(t))
    assert np.mean(recalls) >= 0.9, recalls


def test_ivf_layout_empty_lists(ray_session, tmp_path):
    """n_centroids > n_vectors guarantees empty inverted lists: build
    must write one file per NON-empty list only, and a search probing
    an empty list must still return clean top-k from the others."""
    import glob

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lopez_ray.stages.ann import ivf_build, ivf_search

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((12, 8))
    t = pa.table(
        {
            "vec_id": pa.array(range(12), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float64())),
        }
    )
    idx_dir = str(tmp_path / "ivf_small")
    ivf_build(rd.from_arrow(t), idx_dir, n_centroids=32)
    files = glob.glob(f"{idx_dir}/centroid=*/list-*.parquet")
    assert 0 < len(files) <= 12  # only non-empty lists have files
    hits = ivf_search(idx_dir, vecs[:3], k=2, nprobe=32).to_pandas()
    # nprobe = all lists → exact: each query's own vector is its top hit
    top1 = hits.sort_values(["query_idx", "score"], ascending=[True, False])
    top1 = top1.groupby("query_idx").head(1)
    assert list(top1["vec_id"]) == [0, 1, 2]


def test_ivf_list_shard_cap(ray_session, tmp_path):
    """Verdict r3 #4: an oversized inverted list is sharded into
    <=list_shard_rows-row files so writer-task heap is bounded even when
    n_centroids is dialed far below sqrt(corpus); search output must be
    identical to an uncapped build."""
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from lopez_ray.stages.ann import ivf_build, ivf_search

    rng = np.random.default_rng(7)
    n = 600
    vecs = rng.standard_normal((n, 8))
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(t).repartition(6)

    sharded = str(tmp_path / "ivf_sharded")
    ivf_build(ds, sharded, n_centroids=2, list_shard_rows=100)
    files = glob.glob(f"{sharded}/centroid=*/list-*.parquet")
    # 600 rows / 2 lists, cap 100 -> every list has multiple files
    per_dir: dict[str, int] = {}
    for f in files:
        d = f.rsplit("/", 1)[0]
        per_dir[d] = per_dir.get(d, 0) + 1
        # cap is "flush when buf >= cap" over <=100-row input blocks,
        # so a file holds at most cap + one block of overshoot
        assert pq.read_metadata(f).num_rows <= 200
    assert all(cnt >= 2 for cnt in per_dir.values())
    # no rows lost to sharding
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == n

    whole = str(tmp_path / "ivf_whole")
    ivf_build(ds, whole, n_centroids=2, list_shard_rows=10**9)
    q = vecs[:4]
    a = ivf_search(sharded, q, k=3, nprobe=2).to_pandas()
    b = ivf_search(whole, q, k=3, nprobe=2).to_pandas()
    key = ["query_idx", "vec_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[key].equals(b[key])
    assert np.allclose(a["score"], b["score"])


def test_lsh_exact_on_planted_clusters(ray_session):
    """The seeded (n_tables=16, n_bits=6) LSH configuration must equal
    brute force on the planted-cluster fixture — this is what lets
    ``ann_lsh`` share ``ann_ivf``'s exact DuckDB oracle."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from lopez_ray.fixtures.embfix import generate_ann_clusters
    from lopez_ray.stages.ann import brute_force_topk, lsh_topk

    fdir = generate_ann_clusters()
    q = np.array(
        pq.read_table(os.path.join(fdir, "queries.parquet"))["embedding"].to_pylist()
    )
    corpus = rd.read_parquet(os.path.join(fdir, "corpus.parquet"))
    exact = brute_force_topk(corpus, q, k=10).to_pandas()
    corpus2 = rd.read_parquet(os.path.join(fdir, "corpus.parquet"))
    lsh = lsh_topk(corpus2, q, k=10, n_tables=16, n_bits=6).to_pandas()
    a = set(map(tuple, exact[["query_idx", "vec_id"]].to_numpy()))
    b = set(map(tuple, lsh[["query_idx", "vec_id"]].to_numpy()))
    assert a == b


def test_lsh_recall_on_sorted_clustered_input(ray_session):
    """Same adversarial tail-cluster layout the IVF sampler is tested
    on: LSH has no fit step to bias, so tail-aimed queries must hold
    high recall regardless of input order."""
    from lopez_ray.stages.ann import brute_force_topk, lsh_topk

    ds, _ = _clustered_sorted_dataset(n_per=3000)
    r = np.random.default_rng(5)
    qs = r.normal(size=(4, 16)) * 0.05
    qs[:, 1] += 10.0  # tail cluster
    exact = brute_force_topk(ds, qs, k=10).to_pandas()
    ds2, _ = _clustered_sorted_dataset(n_per=3000)
    approx = lsh_topk(ds2, qs, k=10, n_tables=16, n_bits=6).to_pandas()
    recalls = []
    for qi in exact.query_idx.unique():
        t = set(exact[exact.query_idx == qi].vec_id)
        g = set(approx[approx.query_idx == qi].vec_id)
        recalls.append(len(t & g) / len(t))
    assert np.mean(recalls) >= 0.9, recalls
