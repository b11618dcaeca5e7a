"""Checkpoint/lineage: a killed job resumes without reprocessing committed
partitions, and the final table equals the single-run result (SURVEY §5.5)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from vector_spark import synth
from vector_spark.plans import checkpoint as CP


@pytest.fixture()
def tmpdirs(tmp_path):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    yield sink, ckpt
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_write_then_resume_skips_committed(spark, tmpdirs):
    sink, ckpt = tmpdirs
    docs = CP.with_part_key(synth.documents(spark, 500), n_parts=8, key_cols=["url"])

    first = CP.write_with_checkpoint(docs, sink, ckpt, run_id="r1", sink="s1")
    assert len(first) == 8
    assert sum(first.values()) == 500

    # resume: everything already committed → nothing rewritten
    second = CP.write_with_checkpoint(docs, sink, ckpt, run_id="r1", sink="s1")
    assert second == {}

    got = spark.read.parquet(sink)
    assert got.count() == 500


def test_partial_commit_resume(spark, tmpdirs):
    """Simulate a crash after 3 of 8 parts committed: resume writes only the
    missing 5, and the final table equals a clean single run."""
    sink, ckpt = tmpdirs
    docs = CP.with_part_key(synth.documents(spark, 400), n_parts=8, key_cols=["url"])

    subset = docs.filter(F.col(CP.PART_COL) < 3)
    CP.write_with_checkpoint(subset, sink, ckpt, run_id="r1", sink="s1")
    committed = CP.committed_parts(spark, ckpt, "r1", "s1")
    assert committed == {"0", "1", "2"}

    resumed = CP.write_with_checkpoint(docs, sink, ckpt, run_id="r1", sink="s1")
    assert set(resumed) == {"3", "4", "5", "6", "7"}

    got = spark.read.parquet(sink)
    assert got.count() == 400
    assert {r.url for r in got.select("url").collect()} == {r.url for r in docs.select("url").collect()}


def test_new_run_id_reprocesses(spark, tmpdirs):
    sink, ckpt = tmpdirs
    docs = CP.with_part_key(synth.documents(spark, 100), n_parts=4, key_cols=["url"])
    CP.write_with_checkpoint(docs, sink, ckpt, run_id="r1", sink="s1")
    again = CP.write_with_checkpoint(docs, sink, ckpt, run_id="r2", sink="s1")
    assert len(again) == 4  # different run id → full reprocess (idempotent overwrite)
    assert spark.read.parquet(sink).count() == 100
