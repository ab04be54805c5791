"""Driver contract for the graft builder (Ray Data target).

entry(): flagship document-analysis pipeline at sf0.001 (langid + quality
+ token stats + exact-dedup annotation) returning a Dataset.
queries(): one entry per implemented operator/pipeline from SURVEY.md §2
plus the training-data ops (dedup family, ANN, text analysis, multimodal,
crawl + pagerank). oracle_sql(): DuckDB equivalents where SQL-expressible.

Ray is initialised by the driver BEFORE import; nothing here calls
ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    import pyarrow as pa
    import ray.data as rd

    from lopez_ray.stages.text import LangId, quality_score, text_stats
    from lopez_ray.util import silence_empty_bundle_noise

    silence_empty_bundle_noise()

    sf_dir = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(
        lambda b: quality_score(text_stats(b)).append_column("text", b["text"]),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(LangId, batch_format="pyarrow", concurrency=2)
    return ds.select_columns(
        ["doc_id", "n_chars", "n_tokens", "stop_ratio", "quality", "lang_pred"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from lopez_ray.pipelines.queries import QUERIES
    from lopez_ray.util import silence_empty_bundle_noise

    silence_empty_bundle_noise()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from lopez_ray.pipelines.queries import build_oracles

    return build_oracles()
