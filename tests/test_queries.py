"""Local mirror of the driver's correctness gate: run every queries()
entry at sf0.001 and compare against oracle_sql() via DuckDB — row count,
schema (column names), and order-insensitive values."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{os.path.join(sf_dir, t)}.parquet'"
        )
    return con


def to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        result = result.to_pandas()
    if isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    canon_row.append(("nan",))
                else:
                    canon_row.append(round(v, 9))
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(rows, key=repr)


def test_entry_smoke(entry_mod):
    out = to_df(entry_mod.entry())
    assert len(out) == 500
    assert set(out.columns) == {
        "doc_id", "n_chars", "n_tokens", "stop_ratio", "quality", "lang_pred"
    }


def _oracled_names():
    # collection-time: every oracled query, incl. the lazily-generated
    # crawl-sim and fixture-ground-truth oracles
    from lopez_ray.pipelines.queries import ORACLES

    lazy = {
        "crawl_bfs", "crawl_pagerank", "pagerank_distributed",
        "analyze_rules", "multimodal_decode", "video_frames", "audio_features",
        "image_dedup", "image_dedup_keep", "crawl_image_dedup",
        "image_keep_best", "image_exact_dedup", "image_curate",
        "image_caption_dedup", "crawl_image_keep_best",
        "image_format_stats", "crawl_image_curate", "crawl_host_stats",
        # planted-fixture oracles (missing here pre-round-4: the drift
        # guard below now makes this list enforce itself)
        "ann_ivf", "ann_lsh", "embedding_dups",
    }
    return sorted(set(ORACLES) | lazy)


def test_oracled_names_cover_build_oracles(entry_mod):
    """Drift guard: every oracle build_oracles() actually returns must be
    parametrized into test_query_vs_oracle — a new lazily-generated
    oracle that is not added to the hardcoded `lazy` set above would
    otherwise silently skip the local gate."""
    assert set(entry_mod.oracle_sql()) == set(_oracled_names())


@pytest.mark.parametrize("name", _oracled_names())
def test_query_vs_oracle(entry_mod, oracle_con, sf_dir, name):
    ray_df = to_df(entry_mod.queries()[name](sf_dir))
    sql_df = oracle_con.execute(entry_mod.oracle_sql()[name]).df()
    assert sorted(ray_df.columns) == sorted(sql_df.columns), name
    assert len(ray_df) == len(sql_df), name
    a, b = canon(ray_df), canon(sql_df)
    mismatches = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mismatches, f"{name}: first mismatch {a[mismatches[0]]} != {b[mismatches[0]]}"


@pytest.mark.parametrize("name", ["siphash", "pretty"])
def test_rows_only_queries(entry_mod, sf_dir, name):
    df = to_df(entry_mod.queries()[name](sf_dir))
    assert len(df) == 500


def test_embedding_dups_finds_planted_pairs(entry_mod, sf_dir):
    """Planted-fixture LSH: the deterministic seeded run must recover
    EXACTLY the 60 planted twins (recall 1.0, precision 1.0 — this is
    what makes the DuckDB oracle exact)."""
    from lopez_ray.fixtures.embfix import DUP_ID0, N_DUPS

    df = to_df(entry_mod.queries()["embedding_dups"](sf_dir))
    assert list(df.columns) == ["a", "b", "cos"]
    assert len(df) == N_DUPS
    assert (df["cos"] >= 0.9).all()
    assert (df["b"] >= DUP_ID0).all()  # every pair is base↔planted twin
    assert (df["a"] < DUP_ID0).all()


def test_minhash_query_runs(entry_mod, sf_dir):
    df = to_df(entry_mod.queries()["minhash_pairs"](sf_dir))
    assert set(df.columns) >= {"a", "b"}


def test_ivf_exact_on_planted_clusters(entry_mod, sf_dir):
    """Planted clustered fixture: the pruned-read IVF search must equal
    the exact numpy top-10 per query (what the DuckDB oracle asserts)."""
    import numpy as np
    import pyarrow.parquet as pq

    from lopez_ray.fixtures.embfix import ANN_DIR, ANN_QUERIES

    ivf = to_df(entry_mod.queries()["ann_ivf"](sf_dir))
    assert len(ivf) == ANN_QUERIES * 10
    ct = pq.read_table(ANN_DIR + "/corpus.parquet")
    qt = pq.read_table(ANN_DIR + "/queries.parquet")
    V = np.array(ct["embedding"].to_pylist())
    ids = ct["vec_id"].to_numpy()
    Q = np.array(qt["embedding"].to_pylist())
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Qn @ Vn.T
    for qi in range(ANN_QUERIES):
        order = np.lexsort((ids, -S[qi]))[:10]
        expect = [int(i) for i in ids[order]]
        got = list(ivf[ivf.query_idx == qi]["vec_id"])
        assert got == expect, (qi, got, expect)


def test_crawl_queries(entry_mod, sf_dir):
    status = to_df(entry_mod.queries()["crawl_bfs"](sf_dir))
    assert set(status.columns) == {"url", "page_id", "search_status", "status_code", "depth"}
    assert (status["search_status"] != "open").sum() >= 200
    ranks = to_df(entry_mod.queries()["crawl_pagerank"](sf_dir))
    assert len(ranks) > 50 and abs(ranks["rank"].sum() - 1.0) < 0.05
