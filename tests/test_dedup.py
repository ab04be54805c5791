"""Dedup-family unit tests: skew guards on pathological (degenerate)
buckets, tiled-hamming correctness, multi-table LSH recall, and the
brute-force cosine-pair baseline."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _embedding_ds(sf="/root/testdata/sf0.001"):
    import ray.data as rd

    return rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])


def _true_pairs(sf="/root/testdata/sf0.001", threshold=0.4):
    t = pq.read_table(f"{sf}/embeddings.parquet")
    v = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    n = v / np.linalg.norm(v, axis=1, keepdims=True)
    s = np.triu(n @ n.T, 1)
    ii, jj = np.nonzero(s >= threshold)
    ids = t["vec_id"].to_numpy()
    return {(int(ids[i]), int(ids[j])) for i, j in zip(ii, jj)}


def test_hamming_pairs_tiled_matches_bruteforce():
    from lopez_ray.stages.dedup import _hamming_pairs_tiled

    rng = np.random.default_rng(7)
    sigs = rng.integers(0, 2**63, size=300, dtype=np.int64).view(np.uint64)
    # small tile so several tile boundaries are crossed
    ii, jj, dd = _hamming_pairs_tiled(sigs, max_d=20, tile=64)
    got = {(int(i), int(j), int(d)) for i, j, d in zip(ii, jj, dd)}
    want = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            d = bin(int(sigs[i]) ^ int(sigs[j])).count("1")
            if d <= 20:
                want.add((i, j, d))
    assert got == want


def test_simhash_degenerate_bucket_bounded(ray_session):
    """300 identical docs all hash to one signature (one hot bucket per
    band): the identical-signature fast path must emit exactly the
    n(n-1)/2 distance-0 pairs without quadratic hamming work."""
    import ray.data as rd

    from lopez_ray.stages.dedup import simhash_near_dups

    n = 300
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["the same tiny document"] * n),
        }
    )
    pairs = simhash_near_dups(rd.from_arrow(t)).to_pandas()
    assert len(pairs) == n * (n - 1) // 2
    assert (pairs["hamming"] == 0).all()


def test_embedding_hot_bucket_bounded(ray_session):
    """All vectors colinear → a single LSH bucket with every row in it;
    the tiled in-bucket matmul must still emit exactly all pairs."""
    import ray.data as rd

    from lopez_ray.stages.dedup import embedding_near_dups

    n, dim = 400, 8
    base = np.ones(dim)
    vecs = np.outer(np.linspace(1.0, 2.0, n), base)  # same direction
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float64())),
        }
    )
    pairs = embedding_near_dups(rd.from_arrow(t), threshold=0.99).to_pandas()
    assert len(pairs) == n * (n - 1) // 2
    assert (pairs["cos"] >= 0.99).all()


def test_multi_table_lsh_recall(ray_session):
    """4 planes × 8 tables at cos≥0.4 must beat a single 8-plane table
    (the round-1 shape) and clear the documented ≥0.5 recall gate;
    precision stays exact (every emitted pair is in the true set)."""
    from lopez_ray.stages.dedup import embedding_near_dups

    truth = _true_pairs()
    assert truth  # fixture sanity: pairs exist at this threshold

    multi = embedding_near_dups(
        _embedding_ds(), threshold=0.4, n_planes=4, n_tables=8
    ).to_pandas()
    single = embedding_near_dups(
        _embedding_ds(), threshold=0.4, n_planes=8, n_tables=1
    ).to_pandas()
    got_multi = {(int(a), int(b)) for a, b in zip(multi["a"], multi["b"])}
    got_single = {(int(a), int(b)) for a, b in zip(single["a"], single["b"])}
    assert got_multi <= truth and got_single <= truth  # precision = 1
    recall_multi = len(got_multi) / len(truth)
    recall_single = len(got_single) / len(truth)
    assert recall_multi >= 0.5
    assert recall_multi > recall_single


def test_ivf_layout_search_matches_scan(ray_session, tmp_path):
    """The list-partitioned ivf_build/ivf_search path must return exactly
    what the in-task-filter ivf_topk returns (same centroid fit, same
    candidate lists) while reading only the probed centroid=K/ dirs."""
    import os

    from lopez_ray.stages.ann import ivf_build, ivf_search, ivf_topk, vecs_of

    ds = _embedding_ds()
    q = vecs_of(
        pq.read_table(
            "/root/testdata/sf0.001/embeddings.parquet", columns=["embedding"]
        ).slice(0, 3),
        "embedding",
    )
    scan = ivf_topk(ds, q, k=10).to_pandas()
    idx = str(tmp_path / "ivf")
    ivf_build(ds, idx)
    assert os.path.exists(os.path.join(idx, "centroid=0"))  # real layout
    pruned = ivf_search(idx, q, k=10).to_pandas()
    cols = ["query_idx", "vec_id"]
    a = scan.sort_values(cols).reset_index(drop=True)
    b = pruned.sort_values(cols).reset_index(drop=True)
    assert a[cols].equals(b[cols])  # identical retrieved ids
    # scores agree to BLAS reassociation noise (different batch splits)
    assert np.allclose(a["score"], b["score"], atol=1e-12)


def test_brute_force_cosine_pairs_exact(ray_session):
    from lopez_ray.stages.dedup import brute_force_cosine_pairs

    out = brute_force_cosine_pairs(_embedding_ds(), 0.4).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}
    assert got == _true_pairs()
    # sorted, deduplicated output contract
    assert out[["a", "b"]].drop_duplicates().shape[0] == len(out)


def test_ngram_jaccard_pairs_exact(ray_session):
    """Distributed inverted-index Jaccard == brute-force set Jaccard."""
    import ray.data as rd

    from lopez_ray.stages.dedup import _shingles, ngram_jaccard_pairs

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    sets = {i: set(_shingles(tx or "", 3)) for i, tx in zip(ids, texts)}
    thr = 0.3
    want = {}
    keys = sorted(sets)
    for x in range(len(keys)):
        for y in range(x + 1, len(keys)):
            a, b = keys[x], keys[y]
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= thr:
                want[(a, b)] = j
    ds = rd.from_arrow(t).repartition(4)
    out = ngram_jaccard_pairs(ds, threshold=thr).to_pandas()
    got = {
        (int(a), int(b)): float(j)
        for a, b, j in zip(out["a"], out["b"], out["jaccard"])
    }
    assert set(got) == set(want)
    for k_, v in want.items():
        assert abs(got[k_] - v) < 1e-12


def test_sig_pairs_recursive_exact_on_hot_bucket():
    """Sub-banded recursion (hot-bucket guard) finds exactly the pairs
    the brute-force tiled matrix finds — on a correlated signature set
    that forces several recursion levels."""
    import numpy as np

    from lopez_ray.stages.dedup import _hamming_pairs_tiled, _sig_pairs_recursive

    rng = np.random.default_rng(7)
    # a "hot band-0 bucket": low 16 bits all equal, upper 48 correlated
    # (few active bit positions) so near pairs are plentiful
    base = np.uint64(0xBEEF)
    n = 3000
    highs = np.zeros(n, dtype=np.uint64)
    active = rng.choice(np.arange(16, 64), size=10, replace=False)
    for b in active:
        highs |= (
            rng.integers(0, 2, n).astype(np.uint64) << np.uint64(b)
        )
    sigs = np.unique(highs | base)
    free_mask = ~np.uint64(0xFFFF)  # band 0 fixed
    for max_d in (1, 3):
        bi, bj, bd = _hamming_pairs_tiled(sigs, max_d)
        ri, rj, rd = _sig_pairs_recursive(sigs, free_mask, max_d, cap=64)
        want = {(int(i), int(j)): int(d) for i, j, d in zip(bi, bj, bd)}
        got = {(int(i), int(j)): int(d) for i, j, d in zip(ri, rj, rd)}
        assert got == want
        assert len(want) > 0  # the fixture actually exercises pairs


def test_shuffle_missing_key_column_is_loud(ray_session):
    """A NON-empty block missing a key column must raise, not produce
    an empty result (schema drift was previously silent)."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from lopez_ray.stages.shuffle import partitioned_reduce

    ds = rd.from_arrow(pa.table({"x": pa.array([1, 2, 3], pa.int64())}))
    with pytest.raises(Exception, match="missing key column"):
        partitioned_reduce(ds, ["nope"], lambda g: g).count()


def test_minhash_negative_doc_id_is_loud(ray_session):
    """Negative doc ids collide with the corpus-row marker (a=b=-1) in
    the verify join — the precondition must fail loudly."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from lopez_ray.stages.dedup import minhash_dedup_pairs

    t = pa.table(
        {
            "doc_id": pa.array([-5, 1], pa.int64()),
            "text": pa.array(["a b c d e", "a b c d e"], pa.string()),
        }
    )
    with pytest.raises(Exception, match="doc ids >= 0"):
        minhash_dedup_pairs(rd.from_arrow(t), threshold=0.5)


def test_minhash_verify_broadcast_matches_full_shuffle(ray_session):
    """The size-gated broadcast semi-join in the verify stage (filter
    the corpus to candidate docs before exploding shingle rows) must be
    output-identical to the zero-driver-state full shuffle join it
    short-circuits (broadcast_max_ids=0 forces the fallback)."""
    import ray.data as rd

    from lopez_ray.stages.dedup import minhash_dedup_pairs

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    fast = minhash_dedup_pairs(rd.from_arrow(t), threshold=0.5)
    slow = minhash_dedup_pairs(rd.from_arrow(t), threshold=0.5, broadcast_max_ids=0)
    assert fast.num_rows > 0  # fixture has planted near-dups
    assert fast.equals(slow)


def test_signature_near_dups_generalized_bands(ray_session):
    """signature_near_dups must be EXACT (pairs + distances) for
    non-default thresholds — the generalized n_bands = max_hamming+1
    banding (uneven widths for 64 % n_bands != 0) vs brute force."""
    import ray.data as rd

    from lopez_ray.stages.dedup import signature_near_dups

    rng = np.random.default_rng(13)
    base = rng.integers(0, 2**62, size=120, dtype=np.int64)
    sigs = [int(s) for s in base]
    # plant close pairs: flip 1..max_d bits of existing signatures
    for k in range(40):
        src = int(base[k % len(base)])
        nbits = 1 + (k % 6)
        flip = 0
        for b in rng.choice(63, size=nbits, replace=False):
            flip |= 1 << int(b)
        sigs.append(src ^ flip)
    ids = np.arange(len(sigs), dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"kid": pa.array(ids), "sig": pa.array(sigs, pa.int64())})
    )
    for max_d in (2, 6):
        got = (
            signature_near_dups(ds, max_d, id_col="kid", sig_col="sig")
            .to_pandas()
        )
        got_set = {
            (int(a), int(b), int(d))
            for a, b, d in zip(got["a"], got["b"], got["hamming"])
        }
        want = set()
        for i in range(len(sigs)):
            for j in range(i + 1, len(sigs)):
                d = bin((sigs[i] ^ sigs[j]) & (2**64 - 1)).count("1")
                if d <= max_d:
                    want.add((i, j, d))
        assert got_set == want, f"max_d={max_d}"


def test_image_near_dups_matches_stored_phash(ray_session):
    """The image pair pipeline (decode → phash → banded pairs →
    string-id join-back) must equal the exact threshold computed from
    the fixture's stored phash column."""
    import ray.data as rd

    from lopez_ray.fixtures.imgdup import generate_image_dups
    from lopez_ray.stages.multimodal import image_near_dups

    paths = generate_image_dups()
    corpus = rd.read_parquet(paths["corpus"], columns=["image_id", "bytes", "fmt"])
    got = image_near_dups(corpus, max_hamming=6).to_pandas()
    got_set = {
        (a, b, int(d))
        for a, b, d in zip(got["a_id"], got["b_id"], got["hamming"])
    }
    t = pq.read_table(paths["corpus"], columns=["image_id", "phash"])
    ids = t["image_id"].to_pylist()
    ph = t["phash"].to_numpy()
    want = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j]:
                d = bin(int(ph[i] ^ ph[j]) & (2**64 - 1)).count("1")
                if d <= 6:
                    want.add((ids[i], ids[j], d))
    assert got_set == want
    # planted structure sanity: exact copies land at distance 0
    assert any(d == 0 for _a, _b, d in got_set)


def test_image_dedup_keep_matches_closure(ray_session):
    """(keeper, size) must equal the transitive closure of the stored-
    phash pair graph with lexical-min keepers — label choice inside the
    distributed CC must never leak into the output."""
    import ray.data as rd

    from lopez_ray.fixtures.imgdup import generate_image_dups
    from lopez_ray.stages.multimodal import image_dedup_keep

    paths = generate_image_dups()
    corpus = rd.read_parquet(paths["corpus"], columns=["image_id", "bytes", "fmt"])
    got = image_dedup_keep(corpus, max_hamming=6).to_pandas()
    got_set = {(k, int(s)) for k, s in zip(got["keeper_id"], got["group_size"])}

    t = pq.read_table(paths["corpus"], columns=["image_id", "phash"])
    ids = t["image_id"].to_pylist()
    ph = t["phash"].to_numpy()
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(int(ph[i] ^ ph[j]) & (2**64 - 1)).count("1") <= 6:
                ra, rb = find(ids[i]), find(ids[j])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    from collections import Counter

    sizes = Counter(find(i) for i in ids)
    want = {(k, int(s)) for k, s in sizes.items()}
    assert got_set == want
    # planted dups mean at least one multi-member cluster exists
    assert any(s > 1 for _k, s in got_set)


def test_image_sigs_null_decode_rows_dropped_exactly(ray_session):
    """A row whose format can't be decoded (honest stub seam) must be
    DROPPED from the signature table without corrupting neighbors: a
    null in an int64 Arrow column converts to float64 via to_numpy and
    silently rounds every other row's 64-bit phash (regression test for
    the round-4 review fix)."""
    import ray.data as rd

    from lopez_ray.fixtures.imgdup import generate_image_dups
    from lopez_ray.stages.multimodal import image_phash_sigs

    paths = generate_image_dups()
    t = pq.read_table(paths["corpus"]).slice(0, 16)
    # poison one row with a stubbed-format payload mid-batch
    fmt = t["fmt"].to_pylist()
    fmt[3] = "webp"
    t = t.set_column(t.schema.get_field_index("fmt"), "fmt", pa.array(fmt))
    got = (
        image_phash_sigs(rd.from_arrow(t), batch_size=16)
        .to_pandas()
        .set_index("image_id")["phash"]
    )
    want = {
        i: p
        for i, p, f in zip(
            t["image_id"].to_pylist(), t["phash"].to_pylist(), fmt
        )
        if f != "webp"
    }
    assert len(got) == 15 and t["image_id"][3].as_py() not in got.index
    for iid, ph in want.items():
        assert int(got[iid]) == ph, iid  # bit-exact despite the null row


def test_partitioned_reduce_single_partition(ray_session):
    """n_parts=1 (degenerate fan-out): with num_returns=1 Ray does not
    unpack the split task's 1-tuple; the exchange must unwrap it rather
    than hand reduce tasks a tuple (regression: AttributeError
    'tuple' object has no attribute 'num_rows')."""
    import ray.data as rd

    from lopez_ray.stages.shuffle import partitioned_reduce

    ds = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 1, 2, 3], pa.int64()),
                  "v": pa.array([10, 20, 30, 40, 50], pa.int64())})
    )
    out = (
        partitioned_reduce(
            ds, ["k"], lambda g: g.groupby("k", as_index=False)["v"].sum(),
            n_parts=1,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3]
    assert out["v"].tolist() == [40, 60, 50]


def test_signature_near_dups_star_components_equal(ray_session):
    """identical_as_star=True must yield the SAME connected components
    (labels, keeper = component min, group sizes) as the all-pairs
    mode, while emitting O(m) rows — not C(m,2) — for an
    identical-signature clique (VERDICT r4 #2)."""
    import pandas as pd
    import ray.data as rd

    from lopez_ray.stages.cc import connected_components
    from lopez_ray.stages.dedup import signature_near_dups

    rng = np.random.default_rng(29)
    base = rng.integers(0, 2**62, size=80, dtype=np.int64)
    sigs = [int(s) for s in base]
    # a planted 50-copy identical-signature clique
    M = 50
    sigs += [int(base[0])] * M
    # plus near-dups of the clique signature (connects to the clique)
    for k in range(5):
        sigs.append(int(base[0]) ^ (1 << (3 * k)))
    ids = np.arange(len(sigs), dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"kid": pa.array(ids), "sig": pa.array(sigs, pa.int64())})
    )

    full = signature_near_dups(ds, 3, id_col="kid", sig_col="sig")
    star = signature_near_dups(
        ds, 3, id_col="kid", sig_col="sig", identical_as_star=True
    )
    full_df = full.to_pandas()
    star_df = star.to_pandas()
    # the clique alone would contribute C(51,2)=1275 full pairs; star
    # mode emits one row per member plus the rep-level near-dup pairs
    assert len(full_df) >= 1275
    assert len(star_df) < 200

    def comps(df: pd.DataFrame) -> dict[int, int]:
        lab = (
            connected_components(rd.from_pandas(df[["a", "b"]]))
            .to_pandas()
            .set_index("node")["group_id"]
            .to_dict()
        )
        return {int(k): int(v) for k, v in lab.items()}

    cf, cs = comps(full_df), comps(star_df)
    assert cf == cs
    # star edges are exact: the clique's rep is its min id (id 0 — the
    # original base[0] row shares the planted signature), hamming 0
    clique = star_df[(star_df["a"] == 0) & (star_df["hamming"] == 0)]
    assert len(clique) >= M


def test_signature_near_dups_star_degenerate_corpora(ray_session):
    """Star-arm corners after the ref-level assembly rewrite: an
    ALL-IDENTICAL corpus (rep near-dup search finds nothing — output
    is the stars alone) and an all-distinct, no-near-dup corpus
    (stars empty — output is the schema-bearing empty pair set)."""
    import ray.data as rd

    from lopez_ray.stages.dedup import signature_near_dups

    # (a) every row shares one signature: n-1 star edges to rep id 0
    n = 37
    ds = rd.from_arrow(
        pa.table(
            {
                "kid": pa.array(np.arange(n, dtype=np.int64)),
                "sig": pa.array(np.full(n, 123456789, np.int64)),
            }
        )
    )
    out = signature_near_dups(
        ds, 3, id_col="kid", sig_col="sig", identical_as_star=True
    ).to_pandas()
    assert len(out) == n - 1
    assert (out["a"] == 0).all()
    assert (out["hamming"] == 0).all()
    assert set(out["b"]) == set(range(1, n))

    # (b) far-apart distinct signatures: no pairs. Ray 2.49 cannot
    # carry a schema on a zero-row Dataset (from_arrow of an empty
    # table drops it), so the contract is behavioral: the empty pair
    # set has zero rows AND flows through the downstream CC intake
    # without crashing (its n_blocks==0 short-circuit).
    from lopez_ray.stages.cc import connected_components

    far = rd.from_arrow(
        pa.table(
            {
                "kid": pa.array(np.arange(8, dtype=np.int64)),
                # signatures differ in >3 bits pairwise
                "sig": pa.array(
                    [0, 0xFF, 0xFF00, 0xFF0000, 0xFF000000,
                     0xFF00000000, 0xFF0000000000, 0xFF000000000000],
                    pa.int64(),
                ),
            }
        )
    )
    empty = signature_near_dups(
        far, 3, id_col="kid", sig_col="sig", identical_as_star=True
    )
    assert empty.count() == 0
    labels = connected_components(empty).to_pandas()
    assert len(labels) == 0
