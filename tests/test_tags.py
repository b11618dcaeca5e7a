"""Named snapshot TAGS (Iceberg tag analog) — refs that survive maintenance.

The retention contract under test: a tagged version stays readable across
``expire_snapshots`` (preserved as a self-contained checkpoint) and
``vacuum_table`` (its files are retained), UNTAGGED expired versions now
REFUSE instead of silently returning stale state (the contiguity guard),
and ``delete_tag`` releases everything back to normal reclamation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_spark import synth
from vector_spark.plans import checkpoint as CP
from vector_spark.plans import table_format as TF


def _checksum(df):
    return tuple(
        df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64("url", "lang"), F.lit(1_000_000_007))).alias("h"),
        ).collect()[0]
    )


@pytest.fixture()
def table(spark, tmp_path):
    docs = CP.with_part_key(synth.documents(spark, 300).drop("html"),
                            n_parts=3, key_cols=["url"])
    base = str(tmp_path / "t")
    TF.write_multi_sink({"logs": docs}, base, run_id="r1")
    return base


def test_tag_resolves_to_time_travel(spark, table):
    before = _checksum(TF.read_table(spark, table, "logs"))
    TF.pin_files(table, "logs")  # doctrine: pin before tagging (time-travelable)
    v1 = TF.CommitLog(table).current_version()
    TF.tag_snapshot(table, "gold")
    assert TF.CommitLog(table).tags() == {"gold": v1}

    extra = CP.with_part_key(
        synth.documents(spark, 500).drop("html").orderBy(F.desc("url")).limit(100),
        n_parts=3, key_cols=["url"],
    )
    TF.add_files(spark, table, "logs", extra)

    assert _checksum(TF.read_table(spark, table, "logs", tag="gold")) == before
    assert _checksum(TF.read_table(spark, table, "logs", version=v1)) == before
    assert TF.count_rows(spark, table, "logs", tag="gold") == 300
    assert TF.count_rows(spark, table, "logs") == 400

    refs = {r["name"]: r for r in TF.inspect_table(spark, table, kind="refs").collect()}
    assert refs["gold"]["version"] == v1 and not refs["gold"]["at_current"]


def test_tag_create_move_delete_semantics(spark, table):
    v_first = TF.CommitLog(table).current_version()
    TF.tag_snapshot(table, "gold")
    assert TF.CommitLog(table).tags()["gold"] == v_first
    with pytest.raises(ValueError, match="already points"):
        TF.tag_snapshot(table, "gold")
    tv = TF.tag_snapshot(table, "gold", replace=True)  # move to current
    assert TF.CommitLog(table).tags()["gold"] == tv - 1

    with pytest.raises(ValueError, match="out of range"):
        TF.tag_snapshot(table, "bad", version=999)
    with pytest.raises(KeyError, match="unknown tag"):
        TF.delete_tag(table, "nope")
    with pytest.raises(KeyError, match="unknown tag"):
        TF.read_table(spark, table, "logs", tag="nope")
    with pytest.raises(ValueError, match="version OR tag"):
        TF.read_table(spark, table, "logs", tag="gold", version=1)

    TF.delete_tag(table, "gold")
    assert TF.CommitLog(table).tags() == {}


def test_expire_preserves_tagged_version_and_refuses_gap(spark, table):
    before = _checksum(TF.read_table(spark, table, "logs"))
    TF.pin_files(table, "logs")
    v_pin = TF.CommitLog(table).current_version()
    TF.tag_snapshot(table, "gold", version=v_pin)

    extra = CP.with_part_key(
        synth.documents(spark, 500).drop("html").orderBy(F.desc("url")).limit(100),
        n_parts=3, key_cols=["url"],
    )
    TF.add_files(spark, table, "logs", extra)
    v_mid = TF.CommitLog(table).current_version()
    TF.add_files(spark, table, "logs", extra.withColumn(
        "url", F.concat(F.lit("copy2-"), F.col("url"))))

    removed = TF.expire_snapshots(table)
    assert removed > 0

    # the tagged version still reads byte-exactly; the ref survived
    assert _checksum(TF.read_table(spark, table, "logs", tag="gold")) == before
    assert TF.CommitLog(table).tags() == {"gold": v_pin}
    assert TF.count_rows(spark, table, "logs", tag="gold") == 300
    assert TF.count_rows(spark, table, "logs") == 500

    # an UNTAGGED expired version between the tag and the checkpoint
    # refuses — never a silently-stale fold
    with pytest.raises(ValueError, match="expired"):
        TF.read_table(spark, table, "logs", version=v_mid)

    # a second expire keeps working (idempotent preservation)
    TF.add_files(spark, table, "logs", extra.withColumn(
        "url", F.concat(F.lit("copy3-"), F.col("url"))))
    TF.expire_snapshots(table)
    assert _checksum(TF.read_table(spark, table, "logs", tag="gold")) == before


def test_vacuum_retains_tagged_files_until_delete_tag(spark, table):
    before = _checksum(TF.read_table(spark, table, "logs"))
    TF.pin_files(table, "logs")
    TF.tag_snapshot(table, "gold")

    # rewrite every partition: the old files are referenced ONLY by the tag
    TF.compact_table(spark, table, "logs", max_files=0, target_files=1)
    assert TF.vacuum_table(table, "logs") == [], "tagged files must be retained"
    assert _checksum(TF.read_table(spark, table, "logs", tag="gold")) == before
    assert _checksum(TF.read_table(spark, table, "logs")) == before

    TF.delete_tag(table, "gold")
    reclaimed = TF.vacuum_table(table, "logs")
    assert reclaimed, "un-tagged files must be reclaimable again"
    assert _checksum(TF.read_table(spark, table, "logs")) == before


def test_expire_refuses_unreadable_tag(spark, tmp_path):
    """A tag whose dir-mode partitions were later overwritten cannot be
    preserved — expire must refuse, not promise an unreadable read."""
    docs = CP.with_part_key(synth.documents(spark, 200).drop("html"),
                            n_parts=2, key_cols=["url"])
    base = str(tmp_path / "t")
    TF.write_multi_sink({"logs": docs}, base, run_id="r1")
    TF.tag_snapshot(base, "doomed")
    # tagging a DIR-mode version and then pinning it makes the tag
    # unreconstructable (the same later-touched rule read_table enforces:
    # a compactor may have staged files into the directory since)
    TF.pin_files(base, "logs")

    with pytest.raises(TF.TimeTravelUnavailable):
        TF.expire_snapshots(base)
    # keep_history audit mode still works, and so does dropping the tag
    TF.expire_snapshots(base, keep_history=True)
    TF.delete_tag(base, "doomed")
    assert TF.expire_snapshots(base) > 0


def test_rollback_preserves_refs(spark, table):
    TF.pin_files(table, "logs")
    v_pin = TF.CommitLog(table).current_version()
    TF.tag_snapshot(table, "gold", version=v_pin)
    extra = CP.with_part_key(
        synth.documents(spark, 400).drop("html").orderBy(F.desc("url")).limit(50),
        n_parts=3, key_cols=["url"],
    )
    TF.add_files(spark, table, "logs", extra)
    TF.rollback_table(table, v_pin)
    # rollback moves table STATE; refs stay (Iceberg's model)
    assert TF.CommitLog(table).tags() == {"gold": v_pin}
    assert TF.count_rows(spark, table, "logs") == 300
