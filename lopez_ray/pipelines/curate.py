"""Training-data curation pipeline: the end-to-end "what you'd run at
100 TB" composition — language ID + quality scoring + token stats +
exact dedup + partitioned, resumable Parquet output.

Shape (all streaming; NOTHING materializes an O(corpus) table on the
driver — r1's winner-set broadcast + to_pandas() is gone):

  read_parquet(documents, pruned columns)
    → map_batches(text_stats + quality)          vectorized pyarrow
    → map_batches(LangId, actor pool)            vectorized RE2 kernels
    → filter(quality ≥ min_quality, lang ∈ set)  arrow kernels
    → content-hash + per-batch partial group_by  combiner before shuffle
    → partitioned_reduce(content_hash, min)      ONE dedup shuffle
                                                 (bounded-cardinality
                                                 partition key + C-speed
                                                 pandas reduce per part;
                                                 see stages/shuffle.py)
    → write_parquet(tmp, partition by lang)      one directory per lang,
      then atomic rename tmp → out_dir           never one giant file.
                                                 The rename is the ONLY
                                                 commit point: a run
                                                 killed mid-write leaves
                                                 its partial files in a
                                                 stale tmp dir that the
                                                 rerun deletes — the
                                                 target is either absent
                                                 or complete, so a rerun
                                                 is duplicate-free and a
                                                 finished output is
                                                 skipped wholesale
                                                 (same pattern as
                                                 ann.py's _list.tmp →
                                                 rename)

The dedup trick: rows sharing a content hash share the TEXT, so every
text-derived column (quality, n_tokens, n_chars, lang) is constant
within the group — the winner row (min doc_id) is reconstructed entirely
by Min aggregates, no join-back, no driver round-trip. lang_pred rides
through the numeric aggregation as a small-int code. The content key is
the FULL 128-bit MD5 (two int64 columns): at the 10^10-doc design point
a 64-bit key expects >1 collision, and a collision under column-wise Min
would stitch a Franken-row from two documents.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

LANGS_ALL = ("en", "fr", "es", "de", "zh", "und")


def curate(
    sf_dir: str,
    out_dir: str | None = None,
    min_quality: float = 0.35,
    langs: tuple[str, ...] = ("en", "fr", "es", "de"),
):
    """Run the curation pipeline; returns the curated Dataset (and writes
    it partitioned by predicted language when out_dir is given)."""
    import ray
    import ray.data as rd

    from ..stages.dedup import add_content_hash128
    from ..stages.text import LangId, quality_score, text_stats

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    conc = max(2, min(24, cpus // 2))

    from ..sources import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def score(b: pa.Table) -> pa.Table:
        out = quality_score(text_stats(b))
        return out.append_column("text", b["text"])

    scored = ds.map_batches(score, batch_format="pyarrow").map_batches(
        LangId, batch_format="pyarrow", concurrency=conc, num_cpus=0.5
    )

    lang_codes = pa.array(list(LANGS_ALL), pa.string())

    def keep_and_combine(b: pa.Table) -> pa.Table:
        """Filter + content-hash + per-batch partial dedup (combiner):
        the shuffle only moves one row per distinct content per batch."""
        mask = pc.and_(
            pc.greater_equal(b["quality"], min_quality),
            pc.is_in(b["lang_pred"], value_set=pa.array(langs)),
        )
        b = b.filter(mask)
        b = add_content_hash128(b, "text")
        lang_idx = pc.index_in(b["lang_pred"], value_set=lang_codes).cast(pa.int32())
        t = pa.table(
            {
                "ch_lo": b["ch_lo"],
                "ch_hi": b["ch_hi"],
                "doc_id": b["doc_id"],
                "lang_idx": lang_idx,
                "quality": b["quality"],
                "n_tokens": b["n_tokens"],
                "n_chars": b["n_chars"],
            }
        )
        agg = t.group_by(["ch_lo", "ch_hi"]).aggregate(
            [
                ("doc_id", "min"),
                ("lang_idx", "min"),
                ("quality", "min"),
                ("n_tokens", "min"),
                ("n_chars", "min"),
            ]
        )
        return pa.table(
            {
                "ch_lo": agg["ch_lo"],
                "ch_hi": agg["ch_hi"],
                "doc_id": agg["doc_id_min"],
                "lang_idx": agg["lang_idx_min"],
                "quality": agg["quality_min"],
                "n_tokens": agg["n_tokens_min"],
                "n_chars": agg["n_chars_min"],
            }
        )

    # ONE dedup shuffle with O(corpus) distinct hashes → partitioned
    # C-speed reduce (stages/shuffle.py), not a Ray aggregate.
    from ..stages.shuffle import partitioned_reduce

    deduped = partitioned_reduce(
        scored.map_batches(keep_and_combine, batch_format="pyarrow"),
        ["ch_lo", "ch_hi"],
        lambda g: g.groupby(["ch_lo", "ch_hi"], as_index=False).min(),
    )

    def finish(b: pa.Table) -> pa.Table:
        lang = lang_codes.take(b["lang_idx"].combine_chunks().cast(pa.int64()))
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "lang_pred": lang,
                "quality": b["quality"],
                "n_tokens": b["n_tokens"].cast(pa.int64()),
                "n_chars": b["n_chars"].cast(pa.int64()),
            }
        )

    curated = deduped.map_batches(finish, batch_format="pyarrow")

    if out_dir:
        done_marker = os.path.join(out_dir, "_DONE")
        if not os.path.exists(done_marker):
            import shutil

            out_dir = out_dir.rstrip("/")
            # a crashed prior run may have left (a) a stale staging dir
            # or (b) a legacy out_dir written without the atomic commit;
            # both are partial and must not pollute this run's output
            tmp_dir = out_dir + ".__staging__"
            for stale in (tmp_dir, out_dir):
                if os.path.isdir(stale):
                    shutil.rmtree(stale)
            curated.write_parquet(tmp_dir, partition_cols=["lang_pred"])
            with open(os.path.join(tmp_dir, "_DONE"), "w") as f:
                f.write("ok")
            # the atomic commit point: readers see out_dir either absent
            # or complete-with-marker, never a partial write
            os.rename(tmp_dir, out_dir)
        return rd.read_parquet(out_dir)
    return curated


def _checkpoint_parquet(ds, ckpt_dir: str):
    """Stage a Dataset to partitioned parquet with the same atomic
    tmp→rename commit as ``curate(out_dir=)`` and return a re-read
    Dataset. A finished checkpoint (``_DONE`` marker) is reused
    wholesale, so a killed run resumes past the checkpointed stage."""
    import shutil

    import ray.data as rd

    ckpt_dir = ckpt_dir.rstrip("/")
    if not os.path.exists(os.path.join(ckpt_dir, "_DONE")):
        tmp_dir = ckpt_dir + ".__staging__"
        for stale in (tmp_dir, ckpt_dir):
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        ds.write_parquet(tmp_dir)
        with open(os.path.join(tmp_dir, "_DONE"), "w") as f:
            f.write("ok")
        os.rename(tmp_dir, ckpt_dir)
    return rd.read_parquet(ckpt_dir)


def curate_neardup(
    sf_dir: str,
    min_quality: float = 0.35,
    langs: tuple[str, ...] = ("en", "fr", "es", "de"),
    threshold: float = 0.5,
    checkpoint_dir: str | None = None,
):
    """NEAR-dup-aware curation: quality + language filter, then keep ONE
    document per near-duplicate CLUSTER (MinHash-LSH candidates →
    exact-Jaccard ≥ threshold verify → connected components → keeper =
    component-min doc_id). Exact duplicates are Jaccard 1.0, so this
    subsumes ``curate``'s content-hash dedup while also collapsing
    boilerplate-edited copies — the composition an LLM-corpus pass
    actually runs.

    Shape: filter first (clustering only ever sees survivors), minhash
    over (doc_id, text), CC over the pair list (stages/cc.py — labels
    exist only for docs in ≥1 pair), then a partitioned LEFT join of
    the survivor metadata against the labels; null label = singleton =
    keeper. The survivor lineage is consumed by BOTH the pair side and
    the metadata side; by default Ray re-executes it (cheap at test
    scale). Pass ``checkpoint_dir`` (or set ``LOPEZ_CURATE_CKPT``) to
    stage the filtered corpus to parquet once — atomic tmp→rename, so
    a killed run resumes — and feed both consumers from the re-read;
    at the 1M-doc tier this removes the double langid/score pass
    (A/B in BENCH_dedup_xl_r5), output hash-identical.

    Returns a Dataset of (doc_id, lang_pred, quality, n_tokens)."""
    import ray
    import ray.data as rd

    from ..stages.cc import connected_components
    from ..stages.dedup import minhash_dedup_pairs
    from ..stages.shuffle import partitioned_lookup_join
    from ..stages.text import LangId, quality_score, text_stats

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    conc = max(2, min(24, cpus // 2))

    from ..sources import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def score(b: pa.Table) -> pa.Table:
        out = quality_score(text_stats(b))
        return out.append_column("text", b["text"])

    scored = ds.map_batches(score, batch_format="pyarrow").map_batches(
        LangId, batch_format="pyarrow", concurrency=conc, num_cpus=0.5
    )

    def keep(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(b["quality"], min_quality),
            pc.is_in(b["lang_pred"], value_set=pa.array(langs)),
        )
        b = b.filter(mask)
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "text": b["text"],
                "lang_pred": b["lang_pred"],
                "quality": b["quality"],
                "n_tokens": b["n_tokens"].cast(pa.int64()),
            }
        )

    kept = scored.map_batches(keep, batch_format="pyarrow")

    if checkpoint_dir is None:
        checkpoint_dir = os.environ.get("LOPEZ_CURATE_CKPT") or None
    if checkpoint_dir:
        kept = _checkpoint_parquet(kept, checkpoint_dir)

    pairs = minhash_dedup_pairs(
        kept.select_columns(["doc_id", "text"]), threshold=threshold
    )
    labels = connected_components(pairs).map_batches(
        lambda b: b.rename_columns(["doc_id", "group_id"]),
        batch_format="pyarrow",
    )
    meta = kept.select_columns(["doc_id", "lang_pred", "quality", "n_tokens"])
    joined = partitioned_lookup_join(meta, labels, ["doc_id"], how="left")

    def keepers(b: pa.Table) -> pa.Table:
        gid = b["group_id"]
        mask = pc.or_kleene(
            pc.is_null(gid), pc.equal(gid.cast(pa.int64()), b["doc_id"])
        )
        b = b.filter(mask.fill_null(True))
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lang_pred": b["lang_pred"],
                "quality": b["quality"],
                "n_tokens": b["n_tokens"],
            }
        )

    return joined.map_batches(keepers, batch_format="pyarrow")
