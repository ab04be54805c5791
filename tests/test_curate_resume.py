"""Crash-resume correctness for the curate pipeline's atomic commit.

The hazard (round-3 verdict #1): the old write was
`write_parquet(out_dir)` THEN `_DONE` marker — a run killed mid-write
left partial parquet files without the marker, and the rerun appended a
complete second copy under new file UUIDs, so `read_parquet(out_dir)`
returned duplicates. The fix stages into `out_dir + ".__staging__"` and
`os.rename`s as the single commit point, deleting any stale partial
first. These tests simulate both crash shapes and assert the rerun's
final row set is exactly the clean run's (no duplicates, no drops).
"""

import glob
import os
import shutil

import pandas as pd
import pytest

from lopez_ray.pipelines.curate import curate


def _rows(ds) -> list[tuple]:
    df = ds.to_pandas()
    df = df[sorted(df.columns)]
    return sorted(map(tuple, df.itertuples(index=False)), key=repr)


@pytest.fixture(scope="module")
def clean_run(ray_session, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curate") / "clean")
    rows = _rows(curate(sf_dir, out_dir=out))
    assert rows, "clean curate run produced no rows"
    return out, rows


def test_staging_crash_then_rerun(clean_run, sf_dir, tmp_path):
    """Crash shape A (new code): killed mid-write leaves a partial
    staging dir and NO out_dir. The rerun must clean it and commit a
    complete, duplicate-free output."""
    clean_dir, clean_rows = clean_run
    out = str(tmp_path / "out")
    staging = out + ".__staging__"
    # fabricate the partial staging state from a real run's files
    part = glob.glob(os.path.join(clean_dir, "lang_pred=*", "*.parquet"))[0]
    dst = os.path.join(staging, os.path.relpath(part, clean_dir))
    os.makedirs(os.path.dirname(dst))
    shutil.copy(part, dst)
    assert not os.path.exists(os.path.join(staging, "_DONE"))

    rows = _rows(curate(sf_dir, out_dir=out))
    assert rows == clean_rows
    assert not os.path.exists(staging), "stale staging dir must be removed"
    assert os.path.exists(os.path.join(out, "_DONE"))


def test_legacy_partial_out_dir_then_rerun(clean_run, sf_dir, tmp_path):
    """Crash shape B (the round-3 hazard itself): out_dir holds partial
    parquet files but no _DONE marker. The rerun must NOT append a
    second copy — it cleans the partial target and commits atomically."""
    clean_dir, clean_rows = clean_run
    out = str(tmp_path / "out")
    # copy roughly half the finished files to fake a mid-write kill
    files = sorted(glob.glob(os.path.join(clean_dir, "lang_pred=*", "*.parquet")))
    for part in files[: max(1, len(files) // 2)]:
        dst = os.path.join(out, os.path.relpath(part, clean_dir))
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy(part, dst)
    assert not os.path.exists(os.path.join(out, "_DONE"))

    rows = _rows(curate(sf_dir, out_dir=out))
    assert rows == clean_rows  # would be duplicated under the old code


def test_finished_output_is_skipped_not_rewritten(clean_run, sf_dir):
    """A committed output (marker present) is served as-is: the rerun
    must not touch the files (resume skips finished work wholesale)."""
    clean_dir, clean_rows = clean_run
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(clean_dir, "**", "*.parquet"), recursive=True)
    }
    rows = _rows(curate(sf_dir, out_dir=clean_dir))
    assert rows == clean_rows
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(clean_dir, "**", "*.parquet"), recursive=True)
    }
    assert before == after


def test_neardup_checkpoint_identical_and_resumable(ray_session, sf_dir, tmp_path):
    """curate_neardup(checkpoint_dir=) must (a) produce the exact row
    set of the re-execution path, and (b) reuse a finished checkpoint
    (resume past the filter/langid stage) on a second call."""
    from lopez_ray.pipelines.curate import curate_neardup

    plain = _rows(curate_neardup(sf_dir))
    ckpt = str(tmp_path / "kept")
    ckpted = _rows(curate_neardup(sf_dir, checkpoint_dir=ckpt))
    assert ckpted == plain
    assert os.path.exists(os.path.join(ckpt, "_DONE"))

    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(ckpt, "*.parquet"))
    }
    assert before
    again = _rows(curate_neardup(sf_dir, checkpoint_dir=ckpt))
    assert again == plain
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(ckpt, "*.parquet"))
    }
    assert before == after
