"""Size-gated broadcast joins (VERDICT r3 #7): the broadcast and the
partitioned-join fallback paths must be output-identical, and the
generic ``partitioned_lookup_join`` must honor left/inner semantics."""

import sys

import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")


def _df(result) -> pd.DataFrame:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        result = result.to_pandas()
    if isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )


@pytest.mark.parametrize(
    "qname",
    [
        "orders_by_segment",
        "suppliers_per_region",
        "orders_anti_join",
        "revenue_by_nation",
    ],
)
def test_gate_fallback_matches_broadcast(ray_session, sf_dir, monkeypatch, qname):
    from lopez_ray.pipelines import queries as q

    fn = getattr(q, f"q_{qname}")
    monkeypatch.delenv("LOPEZ_BROADCAST_MAX_ROWS", raising=False)
    broadcast = _canon(_df(fn(sf_dir)))
    monkeypatch.setenv("LOPEZ_BROADCAST_MAX_ROWS", "0")
    fallback = _canon(_df(fn(sf_dir)))
    pd.testing.assert_frame_equal(broadcast, fallback, check_dtype=True)
    assert len(broadcast) > 0


def test_partitioned_lookup_join_left_semantics(ray_session):
    import ray.data as rd

    from lopez_ray.stages.shuffle import partitioned_lookup_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()), "x": [10, 20, 30, 40]})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([2, 4], pa.int64()), "name": ["two", "four"]})
    )

    out = _canon(_df(partitioned_lookup_join(left, right, ["k"], how="left")))
    assert len(out) == 4
    by_k = dict(zip(out["k"], out["name"]))
    assert by_k[2] == "two" and by_k[4] == "four"
    assert pd.isna(by_k[1]) and pd.isna(by_k[3])

    inner = _canon(_df(partitioned_lookup_join(left, right, ["k"], how="inner")))
    assert sorted(inner["k"]) == [2, 4]


def test_partitioned_lookup_join_empty_right(ray_session):
    import ray.data as rd

    from lopez_ray.stages.shuffle import partitioned_lookup_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()), "x": [1, 2]}))
    right = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "name": pa.array([], pa.string())})
    )
    out = _df(partitioned_lookup_join(left, right, ["k"], how="left"))
    assert len(out) == 2
    assert out["name"].isna().all()
    assert sorted(out.columns) == ["k", "name", "x"]


def test_crawl_image_dedup_gate_fallback(ray_session, sf_dir, monkeypatch):
    """crawl_image_dedup's two semi-join hops (fetched-urls → web,
    image-keys → corpus) must produce identical keeper sets via the
    broadcast searchsorted path and the partitioned-join fallback."""
    from lopez_ray.pipelines import queries as q

    monkeypatch.delenv("LOPEZ_BROADCAST_MAX_ROWS", raising=False)
    broadcast = _canon(_df(q.q_crawl_image_dedup(sf_dir)))
    monkeypatch.setenv("LOPEZ_BROADCAST_MAX_ROWS", "0")
    fallback = _canon(_df(q.q_crawl_image_dedup(sf_dir)))
    pd.testing.assert_frame_equal(broadcast, fallback, check_dtype=True)
    assert len(broadcast) > 0
