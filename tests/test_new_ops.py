"""Unit tests for the round-4 continuation operators: exact image
dedup, size/aspect curation, best-copy keepers, and corpus token /
n-gram frequency (wordcount + boilerplate detection)."""

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")


def _closure_groups(ids, ph, max_hamming=6):
    """Union-find over the stored-phash pair graph (test-local oracle)."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(int(ph[i] ^ ph[j]) & (2**64 - 1)).count("1") <= max_hamming:
                ra, rb = find(ids[i]), find(ids[j])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    groups: dict[str, list[str]] = {}
    for i in ids:
        groups.setdefault(find(i), []).append(i)
    return groups


def test_image_exact_dedup_byte_groups(ray_session):
    """(keeper, n_copies) must equal grouping the corpus by the raw
    payload BYTES — the engine's md5 key is internal only — and the
    planted exact copies must all land in multi-member groups."""
    import ray.data as rd

    from lopez_ray.fixtures.imgdup import generate_image_dups
    from lopez_ray.stages.multimodal import image_exact_dedup

    paths = generate_image_dups()
    corpus = rd.read_parquet(paths["corpus"], columns=["image_id", "bytes"])
    got = image_exact_dedup(corpus).to_pandas()
    got_set = {(k, int(n)) for k, n in zip(got["keeper_id"], got["n_copies"])}

    t = pq.read_table(paths["corpus"], columns=["image_id", "bytes"])
    by_bytes: dict[bytes, list[str]] = {}
    for iid, data in zip(t["image_id"].to_pylist(), t["bytes"].to_pylist()):
        by_bytes.setdefault(data, []).append(iid)
    want = {(min(v), len(v)) for v in by_bytes.values()}
    assert got_set == want
    # every planted exact copy ("/copyN" ids) shares bytes with its source
    copies = [i for i in t["image_id"].to_pylist() if "/copy" in i]
    assert copies
    multi = {k for k, n in got_set if n > 1}
    for cid in copies:
        src = cid.split("/copy")[0]
        assert src in multi or any(
            src in v and cid in v for v in by_bytes.values()
        )


def test_image_caption_dedup_groups(ray_session):
    """Caption-keyed dedup must equal grouping by the caption string,
    and caption groups must COARSEN byte groups: near-dups inherit
    their source's caption with different bytes, so there are strictly
    fewer caption groups than byte groups on this fixture."""
    import ray.data as rd

    from lopez_ray.fixtures.imgdup import generate_image_dups
    from lopez_ray.stages.multimodal import image_exact_dedup

    paths = generate_image_dups()
    got = image_exact_dedup(
        rd.read_parquet(paths["corpus"], columns=["image_id", "caption"]),
        key_col="caption",
    ).to_pandas()
    got_set = {(k, int(n)) for k, n in zip(got["keeper_id"], got["n_copies"])}

    t = pq.read_table(paths["corpus"], columns=["image_id", "caption", "bytes"])
    by_cap: dict[str, list[str]] = {}
    for iid, cap in zip(t["image_id"].to_pylist(), t["caption"].to_pylist()):
        by_cap.setdefault(cap, []).append(iid)
    assert got_set == {(min(v), len(v)) for v in by_cap.values()}
    n_byte_groups = len(set(t["bytes"].to_pylist()))
    assert len(got_set) < n_byte_groups


def test_exact_dedup_null_is_not_empty(ray_session):
    """SQL GROUP BY semantics for the content-hash key: NULL is one
    group of its own, DISTINCT from ''/b'' (regression for the
    \\x00/\\x01 domain-separated preimage — previously both hashed
    b'' and silently merged)."""
    import ray.data as rd

    from lopez_ray.stages.dedup import exact_dedup

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(["", None, "", None, "x"], pa.string()),
        }
    )
    out = (
        exact_dedup(rd.from_arrow(tbl), col="text", id_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
    )
    got = {(int(r.doc_id), int(r.n)) for r in out.itertuples()}
    # '' group keeps doc 0 (n=2), NULL group keeps doc 1 (n=2), 'x' doc 4
    assert got == {(0, 2), (1, 2), (4, 1)}

    # binary column: b'' vs NULL likewise distinct
    btbl = pa.table(
        {
            "image_id": pa.array(["a", "b", "c"], pa.string()),
            "bytes": pa.array([b"", None, b""], pa.binary()),
        }
    )
    from lopez_ray.stages.multimodal import image_exact_dedup

    bout = image_exact_dedup(rd.from_arrow(btbl)).to_pandas()
    assert {(k, int(n)) for k, n in zip(bout.keeper_id, bout.n_copies)} == {
        ("a", 2),
        ("b", 1),
    }


def test_image_curate_matches_stored_dims(ray_session):
    """Size/aspect keepers decided on DECODED dims must equal the
    stored-metadata filter (generator guarantees stored == decoded),
    and the filter must be non-trivial on this corpus."""
    import ray.data as rd

    from lopez_ray.fixtures.imgdup import generate_image_dups
    from lopez_ray.stages.multimodal import image_curate

    paths = generate_image_dups()
    corpus = rd.read_parquet(
        paths["corpus"], columns=["image_id", "bytes", "fmt"]
    )
    got = image_curate(corpus, min_side=32, max_aspect_num=2).to_pandas()

    t = pq.read_table(paths["corpus"], columns=["image_id", "w", "h"])
    want = {}
    for iid, w, h in zip(
        t["image_id"].to_pylist(), t["w"].to_pylist(), t["h"].to_pylist()
    ):
        if min(w, h) >= 32 and max(w, h) <= 2 * min(w, h):
            want[iid] = (w, h, w * h)
    assert 0 < len(want) < t.num_rows  # non-trivial filter
    got_map = {
        r.image_id: (r.dec_w, r.dec_h, r.px) for r in got.itertuples()
    }
    assert got_map == want


def test_image_keep_best_is_component_argmax(ray_session):
    """Best-copy keepers: per phash-closure component, the keeper must
    be the max-px member (ties → lexical-min id), sizes must match the
    min-id keeper variant, and at least one cluster must exist where
    best-px ≠ min-id (otherwise this test proves nothing)."""
    import ray.data as rd

    from lopez_ray.fixtures.imgdup import generate_image_dups
    from lopez_ray.stages.multimodal import image_dedup_keep_best

    paths = generate_image_dups()
    corpus = rd.read_parquet(
        paths["corpus"], columns=["image_id", "bytes", "fmt"]
    )
    got = image_dedup_keep_best(corpus, max_hamming=6).to_pandas()
    got_set = {
        (r.keeper_id, int(r.keeper_px), int(r.group_size))
        for r in got.itertuples()
    }

    t = pq.read_table(paths["corpus"], columns=["image_id", "phash", "w", "h"])
    ids = t["image_id"].to_pylist()
    ph = t["phash"].to_numpy()
    px = {
        i: int(w) * int(h)
        for i, w, h in zip(ids, t["w"].to_pylist(), t["h"].to_pylist())
    }
    groups = _closure_groups(ids, ph, 6)
    want = set()
    divergent = 0
    for members in groups.values():
        best = min(members, key=lambda i: (-px[i], i))
        if best != min(members):
            divergent += 1
        want.add((best, px[best], len(members)))
    assert got_set == want
    assert divergent > 0


def test_token_ngram_counts_exact(ray_session):
    """Wordcount + document-frequency n-grams on a tiny hand-checked
    corpus: occurrence counts, per-doc-distinct counting, and the
    min_count filter."""
    import ray.data as rd

    from lopez_ray.stages.text import token_ngram_counts

    docs = [
        {"doc_id": 0, "text": "the cat sat on the mat"},
        {"doc_id": 1, "text": "the cat sat on the hat"},
        {"doc_id": 2, "text": "a dog; a DOG!"},
    ]
    ds = rd.from_items(docs)

    uni = token_ngram_counts(ds, n=1).to_pandas()
    counts = dict(zip(uni["token"], uni["cnt"]))
    assert counts == {
        "the": 4, "cat": 2, "sat": 2, "on": 2, "mat": 1, "hat": 1,
        "a": 2, "dog": 2,
    }

    # 5-grams, document frequency, boilerplate filter: "the cat sat on
    # the" appears in docs 0 and 1 (once each); every other 5-gram is
    # unique to its doc and must be filtered by min_count=2
    bp = token_ngram_counts(
        ds, n=5, per_doc_distinct=True, min_count=2
    ).to_pandas()
    assert dict(zip(bp["gram"], bp["cnt"])) == {"the cat sat on the": 2}

    # per_doc_distinct caps repeats WITHIN a doc at 1: "a dog" occurs
    # twice in doc 2 (case-folded) but df must read 1
    bi = token_ngram_counts(ds, n=2, per_doc_distinct=True).to_pandas()
    bi_counts = dict(zip(bi["gram"], bi["cnt"]))
    assert bi_counts["a dog"] == 1
    assert bi_counts["the cat"] == 2


def test_token_prefilter_path_identical(ray_session):
    """The hash-prefilter two-pass path (default for min_count >= 2)
    must be output-identical to the exact one-pass path, including when
    the survivor set is empty and when the max-keys gate forces the
    fallback."""
    import ray.data as rd

    from lopez_ray.stages.text import token_ngram_counts

    docs = [
        {"doc_id": i, "text": f"alpha beta gamma delta epsilon doc{i} "
                              f"alpha beta gamma delta epsilon tail{i % 3}"}
        for i in range(40)
    ]
    ds = rd.from_items(docs)
    kw = dict(n=5, per_doc_distinct=True, min_count=2)

    two_pass = token_ngram_counts(ds, **kw, hash_prefilter=True).to_pandas()
    one_pass = token_ngram_counts(ds, **kw, hash_prefilter=False).to_pandas()
    a = sorted(zip(two_pass["gram"], two_pass["cnt"]))
    b = sorted(zip(one_pass["gram"], one_pass["cnt"]))
    assert a == b and len(a) > 0

    # max-keys gate: force the broadcast fallback; still identical
    gated = token_ngram_counts(
        ds, **kw, hash_prefilter=True, prefilter_max_keys=1
    ).to_pandas()
    assert sorted(zip(gated["gram"], gated["cnt"])) == b

    # empty survivor set: every 5-gram unique -> empty output, no crash
    uniq = rd.from_items(
        [{"doc_id": i, "text": f"u{i} v{i} w{i} x{i} y{i} z{i}"} for i in range(8)]
    )
    empty = token_ngram_counts(uniq, **kw, hash_prefilter=True).to_pandas()
    assert len(empty) == 0


def test_token_counts_empty_and_null_text(ray_session):
    """Null / empty / sub-n documents contribute nothing (and must not
    crash the combiner)."""
    import ray.data as rd

    from lopez_ray.stages.text import token_ngram_counts

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["", None, "one two"], pa.string()),
            }
        )
    )
    uni = token_ngram_counts(ds, n=1).to_pandas()
    assert dict(zip(uni["token"], uni["cnt"])) == {"one": 1, "two": 1}
    tri = token_ngram_counts(ds, n=3).to_pandas()
    assert len(tri) == 0
