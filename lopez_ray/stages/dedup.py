"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the training-data-pipeline workhorses.

Shuffle discipline (ray_guide / SURVEY §4):

- exact: content-hash inside ``map_batches`` (vectorized SipHash), then ONE
  ``groupby(hash)`` shuffle with per-group first-row retention;
- MinHash-LSH: signatures per batch (numpy permutation trick), explode to
  (band, band_hash, doc_id) rows, ONE ``groupby(band, band_hash)`` shuffle
  produces candidate buckets, pairs verified by exact shingle Jaccard
  (shingle sets fetched via a broadcast map at test scale — at corpus
  scale this verify becomes a hash-partitioned self-join on doc_id, same
  key as the bucket shuffle);
- SimHash: 64-bit signature per doc, near-dup blocking by 4×16-bit bands
  (any equal band → candidate) → hamming verify;
- embedding-cosine: random-hyperplane LSH buckets → within-bucket
  pairwise cosine (numpy matmul per group).

All functions take/return Ray Datasets; nothing materializes the corpus
on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hash import siphash24_batch

_MERSENNE = (1 << 61) - 1


def _shingles(text: str, k: int = 3) -> list[bytes]:
    toks = text.lower().split()
    if len(toks) < k:
        return [" ".join(toks).encode()] if toks else []
    return [" ".join(toks[i : i + k]).encode() for i in range(len(toks) - k + 1)]


def add_content_hash(batch: pa.Table, col: str = "text", out: str = "content_hash") -> pa.Table:
    texts = batch[col].to_pylist()
    hashes = siphash24_batch([t.encode() if t else b"" for t in texts])
    return batch.append_column(out, pa.array(hashes.view(np.int64), pa.int64()))


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per identical content. Returns a Dataset of
    (content_hash, doc_id=min, n=group size)."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, col).select([id_col, "content_hash"]),
        batch_format="pyarrow",
    )
    return (
        hashed.groupby("content_hash")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """num_perm minhash values via the (a*x+b) mod p permutation trick over
    64-bit shingle hashes; state (a, b arrays) built once per actor."""

    def __init__(
        self,
        num_perm: int = 64,
        bands: int = 16,
        k: int = 3,
        text_col: str = "text",
        id_col: str = "doc_id",
        seed: int = 7,
    ):
        assert num_perm % bands == 0
        r = np.random.default_rng(seed)
        self.a = r.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = r.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sigs = self.signatures([text])
        return sigs[0]

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_perm) minhash matrix, computed with ONE siphash
        pass over every shingle in the batch and a segment-min
        (np.minimum.reduceat) per doc — no per-doc Python round trips."""
        all_shingles: list[bytes] = []
        offsets = [0]
        for text in texts:
            all_shingles.extend(_shingles(text or "", self.k))
            offsets.append(len(all_shingles))
        n = len(texts)
        out = np.full((n, self.num_perm), np.iinfo(np.int64).max, dtype=np.int64)
        if not all_shingles:
            return out
        base = siphash24_batch(all_shingles) >> np.uint64(3)
        with np.errstate(over="ignore"):
            vals = (base[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(
                _MERSENNE
            )
        starts = np.array(offsets[:-1])
        ends = np.array(offsets[1:])
        nonempty = np.where(ends > starts)[0]
        if len(nonempty):
            mins = np.minimum.reduceat(vals, starts[nonempty], axis=0)
            # reduceat with consecutive indices reduces each [start_i, start_{i+1})
            # only when starts are strictly increasing and cover to the end;
            # using only nonempty starts keeps segments aligned to docs.
            out[nonempty] = mins.astype(np.int64)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Explode each doc into one row per band: (doc_id, band, band_hash)."""
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        texts = batch[self.text_col].to_pylist()
        sigs = self.signatures(texts)  # (n, num_perm) int64
        n = len(texts)
        # one siphash call per band over row-chunk bytes
        band_hash = np.empty((n, self.bands), dtype=np.int64)
        for band in range(self.bands):
            chunk = np.ascontiguousarray(
                sigs[:, band * self.rows : (band + 1) * self.rows]
            )
            hs = siphash24_batch([chunk[i].tobytes() for i in range(n)])
            band_hash[:, band] = (hs & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        return pa.table(
            {
                self.id_col: pa.array(np.repeat(ids, self.bands), pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n), pa.int32()
                ),
                "band_hash": pa.array(band_hash.reshape(-1), pa.int64()),
            }
        )


def minhash_candidates(ds, concurrency: int | None = None, **kwargs):
    """Dataset of candidate pairs (a, b) with a < b from LSH banding.

    Almost every band bucket is a singleton, so running a per-group UDF
    over all buckets is ~|docs|×bands tiny pandas groups (observed ~60 s
    at 50k docs). Instead: (1) vectorized count per (band, band_hash),
    (2) keep buckets with >= 2 members — that survivor set is
    O(duplicate clusters), tiny — (3) broadcast it and semi-join the
    banded rows down to survivors, (4) pair only within those buckets.
    At corpus scale step 3 becomes a hash-partitioned semi-join keyed on
    band_hash (same shuffle key as the bucket groupby)."""
    import ray
    from ray.data.aggregate import Count

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = max(2, min(24, cpus // 2))
    id_col = kwargs.get("id_col", "doc_id")
    banded = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    # Consumed twice (bucket counts + survivor filter); the banded table
    # is (id, band, band_hash) — ~24 B/row — so pinning it in the object
    # store beats recomputing the signatures.
    banded = banded.materialize()

    counts = banded.groupby(["band", "band_hash"]).aggregate(
        Count(alias_name="n")
    )
    dup_keys = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n"], 2)), batch_format="pyarrow"
    ).to_pandas()
    if len(dup_keys) == 0:
        return None
    key_set = set(zip(dup_keys["band"], dup_keys["band_hash"]))
    key_ref = ray.put(key_set)

    def keep_survivors(batch: pa.Table) -> pa.Table:
        keys = ray.get(key_ref)
        bands = batch["band"].to_pylist()
        hashes = batch["band_hash"].to_pylist()
        mask = pa.array([(b, h) in keys for b, h in zip(bands, hashes)])
        return batch.filter(mask)

    survivors = banded.map_batches(keep_survivors, batch_format="pyarrow")

    def bucket_pairs(g):
        import pandas as pd

        ids = sorted(g[id_col].tolist())
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        if not pairs:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(pairs, columns=["a", "b"])

    pairs = survivors.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # distinct pairs (a bucket collision in several bands duplicates pairs)
    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands"))


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(_shingles(text_a, k)), set(_shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup_pairs(ds, threshold: float = 0.7, **kwargs):
    """Full near-dup pipeline: LSH candidates → exact-Jaccard verify.
    Returns a pa.Table (a, b, jaccard) with jaccard >= threshold.

    Verify never materializes the corpus on the driver: the candidate
    PAIR set is tiny (O(duplicate clusters)), so its doc-id set is
    broadcast and a semi-join ``map_batches`` filter pulls just the
    candidate texts out of the streaming corpus; only those reach the
    driver. At extreme scale the same shape becomes a hash-partitioned
    join keyed on doc_id."""
    import ray

    id_col = kwargs.get("id_col", "doc_id")
    text_col = kwargs.get("text_col", "text")
    k = kwargs.get("k", 3)
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    cands = minhash_candidates(ds, **kwargs)
    if cands is None:
        return empty
    pairs = cands.to_pandas()  # tiny: one row per candidate pair
    if len(pairs) == 0:
        return empty
    cand_ids = set(pairs["a"]) | set(pairs["b"])
    ids_ref = ray.put(cand_ids)

    def pull_texts(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        mask = pa.array([i in wanted for i in batch[id_col].to_pylist()])
        return batch.filter(mask).select([id_col, text_col])

    texts_tbl = pa.concat_tables(
        [
            t
            for t in (
                ray.get(r)
                for r in ds.map_batches(
                    pull_texts, batch_format="pyarrow"
                ).to_arrow_refs()
            )
            if t.num_rows
        ]
        or [pa.table({id_col: pa.array([], pa.int64()), text_col: pa.array([], pa.string())})]
    )
    lookup = dict(
        zip(texts_tbl[id_col].to_pylist(), texts_tbl[text_col].to_pylist())
    )
    jac = [
        jaccard(lookup.get(x) or "", lookup.get(y) or "", k)
        for x, y in zip(pairs["a"], pairs["b"])
    ]
    tbl = pa.table(
        {
            "a": pa.array(pairs["a"], pa.int64()),
            "b": pa.array(pairs["b"], pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        }
    )
    tbl = tbl.filter(pc.greater_equal(tbl["jaccard"], threshold))
    return tbl.sort_by([("a", "ascending"), ("b", "ascending")])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash from token hashes (Charikar 2002): sign of the
    per-bit weighted sum."""
    sigs = []
    for text in batch[text_col].to_pylist():
        toks = (text or "").lower().split()
        if not toks:
            sigs.append(0)
            continue
        hs = siphash24_batch([t.encode() for t in toks])
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        acc = (2 * bits - 1).sum(axis=0)
        val = 0
        for j in range(64):
            if acc[j] > 0:
                val |= 1 << j
        sigs.append(val - (1 << 64) if val >= 1 << 63 else val)
    return batch.append_column("simhash", pa.array(sigs, pa.int64()))


def simhash_near_dups(ds, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"):
    """Near-dup pairs by SimHash: 4×16-bit band blocking (a pair within
    hamming<=3 must agree on >=1 band) → hamming verify within buckets."""
    import pandas as pd

    sigs = ds.map_batches(
        lambda b: simhash_batch(b, text_col).select([id_col, "simhash"]),
        batch_format="pyarrow",
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sh = batch["simhash"].to_pylist()
        rows = {"id": [], "band": [], "key": []}
        for i, s in zip(ids, sh):
            u = s & ((1 << 64) - 1)
            for band in range(4):
                rows["id"].append(i)
                rows["band"].append(band)
                rows["key"].append((u >> (16 * band)) & 0xFFFF)
        return pa.table(
            {
                "id": pa.array(rows["id"], pa.int64()),
                "band": pa.array(rows["band"], pa.int32()),
                "key": pa.array(rows["key"], pa.int32()),
                "sim": pa.array(
                    [s for s in sh for _ in range(4)], pa.int64()
                ),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(zip(g["id"], g["sim"]))
        out = []
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                a, sa = recs[i]
                b, sb = recs[j]
                d = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    out.append((a, b, d))
        return pd.DataFrame(out, columns=["a", "b", "hamming"]) if out else pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
             "hamming": pd.Series([], dtype="int64")}
        )

    pairs = (
        sigs.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    from ray.data.aggregate import Min

    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(
    ds,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 5,
):
    """Random-hyperplane LSH buckets → within-bucket pairwise cosine.
    Docs with cos >= threshold and equal sign-pattern are found; multiple
    rotated plane sets would raise recall at scale (documented knob)."""
    import pandas as pd

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        # same seed in every task → identical planes across batches
        planes_local = np.random.default_rng(seed).normal(size=(vecs.shape[1], n_planes))
        signs = (vecs @ planes_local) > 0
        keys = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        normed = vecs / np.maximum(norms, 1e-12)
        return pa.table(
            {
                "id": batch[id_col].cast(pa.int64()),
                "bucket": pa.array(keys, pa.int64()),
                "vec": pa.array(list(normed), pa.list_(pa.float64())),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["id"].tolist()
        mat = np.array(g["vec"].tolist())
        sims = mat @ mat.T
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    out.append((a, b, float(sims[i, j])))
        return pd.DataFrame(out, columns=["a", "b", "cos"]) if out else pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
             "cos": pd.Series([], dtype="float64")}
        )

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    from ray.data.aggregate import Max

    return pairs.groupby(["a", "b"]).aggregate(Max("cos", alias_name="cos"))
