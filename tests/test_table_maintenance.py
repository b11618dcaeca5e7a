"""Table-format maintenance: file-level manifests (pin), small-file
compaction (rewrite_data_files analog), orphan vacuum, snapshot expiry —
each crash window checked to leave readers consistent."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_spark import synth
from vector_spark.plans import checkpoint as CP
from vector_spark.plans import table_format as TF


def _checksum(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64("url", "lang"), F.lit(1_000_000_007))).alias("h"),
    ).collect()[0]


@pytest.fixture()
def table(spark, tmp_path):
    """A committed sink whose partitions hold MANY small files (the input is
    spread over 16 tasks before the partitioned write)."""
    docs = CP.with_part_key(synth.documents(spark, 600), n_parts=3, key_cols=["url"])
    docs = docs.drop("html").repartition(16)
    base = str(tmp_path / "t")
    TF.write_multi_sink({"logs": docs}, base, run_id="r1")
    return base


def _files_per_part(base, sink="logs"):
    out = {}
    for part in TF.CommitLog(base).manifest()[sink]:
        out[part] = TF._data_files(os.path.join(base, sink, f"{CP.PART_COL}={part}"))
    return out


def test_compaction_preserves_data_and_merges_files(spark, table):
    before = _checksum(TF.read_table(spark, table, "logs"))
    counts_before = {p: len(f) for p, f in _files_per_part(table).items()}
    assert max(counts_before.values()) > 4, "fixture must produce small files"

    stats = TF.compact_table(spark, table, "logs", max_files=4, target_files=1)
    assert set(stats) == set(counts_before)
    after = _checksum(TF.read_table(spark, table, "logs"))
    assert tuple(before) == tuple(after)

    # old files still on disk (invisible) until vacuum; then gone
    on_disk = {p: len(f) for p, f in _files_per_part(table).items()}
    assert all(n > 1 for n in on_disk.values())
    deleted = TF.vacuum_table(table, "logs")
    assert deleted
    on_disk = {p: len(f) for p, f in _files_per_part(table).items()}
    assert all(n == 1 for n in on_disk.values())
    assert tuple(_checksum(TF.read_table(spark, table, "logs"))) == tuple(before)
    # second vacuum: nothing left to remove
    assert TF.vacuum_table(table, "logs") == []


def test_pin_makes_new_files_invisible(spark, table):
    before = _checksum(TF.read_table(spark, table, "logs"))
    TF.pin_files(table, "logs")
    # drop a stray file into a live partition dir — a dir-mode reader would
    # pick it up; a file-mode reader must not
    part = next(iter(TF.CommitLog(table).manifest()["logs"]))
    pdir = os.path.join(table, "logs", f"{CP.PART_COL}={part}")
    src = os.path.join(pdir, TF._data_files(pdir)[0])
    import shutil

    shutil.copy(src, os.path.join(pdir, "stray-duplicate.parquet"))
    assert tuple(_checksum(TF.read_table(spark, table, "logs"))) == tuple(before)
    # vacuum removes the stray
    assert any("stray" in p for p in TF.vacuum_table(table, "logs"))


def test_crash_before_rewrite_commit_leaves_readers_unchanged(spark, table, monkeypatch):
    """Kill the compactor after staging+moving files but BEFORE the rewrite
    snapshot: readers see the old files; vacuum cleans the staged output;
    a re-run compaction then succeeds."""
    before = _checksum(TF.read_table(spark, table, "logs"))
    real_commit = TF.CommitLog.commit

    def crashing_commit(self, meta):
        if meta.get("operation") == "rewrite":
            raise RuntimeError("injected crash before rewrite commit")
        return real_commit(self, meta)

    monkeypatch.setattr(TF.CommitLog, "commit", crashing_commit)
    with pytest.raises(RuntimeError, match="injected"):
        TF.compact_table(spark, table, "logs", max_files=4)
    monkeypatch.undo()

    assert tuple(_checksum(TF.read_table(spark, table, "logs"))) == tuple(before)
    orphans = TF.vacuum_table(table, "logs")
    assert orphans, "staged rw files must be vacuumable orphans"
    stats = TF.compact_table(spark, table, "logs", max_files=4)
    assert stats
    assert tuple(_checksum(TF.read_table(spark, table, "logs"))) == tuple(before)


def test_append_after_compaction_resets_to_dir_mode(spark, table):
    """A later dynamic-partition-overwrite append to a compacted partition
    must fold back to dir-mode (the overwrite replaced the directory)."""
    TF.compact_table(spark, table, "logs", max_files=0)
    TF.vacuum_table(table, "logs")
    man = TF.CommitLog(table).manifest()["logs"]
    assert all(info["files"] is not None for info in man.values())

    extra = CP.with_part_key(synth.documents(spark, 100), n_parts=3, key_cols=["url"])
    extra = extra.drop("html").withColumn(
        CP.PART_COL, F.concat(F.lit("x"), F.col(CP.PART_COL).cast("string"))
    )
    TF.write_multi_sink({"logs": extra}, table, run_id="r2")
    man = TF.CommitLog(table).manifest()["logs"]
    new_parts = [p for p in man if p.startswith("x")]
    assert new_parts and all(man[p]["files"] is None for p in new_parts)
    total = TF.read_table(spark, table, "logs").count()
    assert total == 700


def test_expire_snapshots_preserves_fold_and_resume(spark, table):
    TF.compact_table(spark, table, "logs", max_files=0)
    log = TF.CommitLog(table)
    man_before = log.manifest()
    committed_before = log.committed()
    n_meta = len(log.versions())
    assert n_meta >= 3  # append + pin + rewrite

    removed = TF.expire_snapshots(table)
    assert removed == n_meta
    log2 = TF.CommitLog(table)
    assert len(log2.versions()) == 1
    assert log2.manifest() == man_before
    assert log2.committed() == committed_before

    # resume semantics survive expiry: a rerun of the same data is a no-op
    docs = CP.with_part_key(synth.documents(spark, 600), n_parts=3, key_cols=["url"])
    docs = docs.drop("html").repartition(16)
    again = TF.write_multi_sink({"logs": docs}, table, run_id="r1-after-expire")
    assert all(not parts for parts in again.values())


def test_file_stats_pruning_roundtrip(spark, table):
    """Iceberg-style data skipping: cluster_by compaction → per-file min/max
    stats → read_table(prune=...) scans strictly fewer files yet returns
    exactly the rows a full scan + filter returns."""
    TF.compact_table(spark, table, "logs", max_files=0, target_files=4,
                     cluster_by="warc_ts")
    stats = TF.collect_file_stats(spark, table, "logs", ["warc_ts", "url"])
    assert stats and all(
        {"warc_ts", "url", "_rowcount", "_nulls:warc_ts", "_nulls:url"} == set(fs)
        and fs["_rowcount"] > 0
        for by_file in stats.values()
        for fs in by_file.values()
    )

    full = TF.read_table(spark, table, "logs")
    lo, hi = full.agg(
        F.expr("percentile(cast(warc_ts as double), 0.4)"),
        F.expr("percentile(cast(warc_ts as double), 0.6)"),
    ).collect()[0]
    import datetime as dt
    lo = dt.datetime.utcfromtimestamp(lo)
    hi = dt.datetime.utcfromtimestamp(hi)

    pruned = TF.read_table(spark, table, "logs", prune=("warc_ts", lo, hi))
    cond = (F.col("warc_ts") >= lo) & (F.col("warc_ts") <= hi)
    expect = sorted(r.url for r in full.filter(cond).collect())
    got = sorted(r.url for r in pruned.filter(cond).collect())
    assert got == expect and len(got) > 0
    # the point of the feature: the pruned plan scans fewer files
    assert len(pruned.inputFiles()) < len(full.inputFiles())

    # one-sided + miss-everything ranges stay sound
    left = TF.read_table(spark, table, "logs", prune=("warc_ts", None, lo))
    assert left.filter(F.col("warc_ts") <= lo).count() == full.filter(
        F.col("warc_ts") <= lo
    ).count()
    far = dt.datetime(2099, 1, 1)
    nothing = TF.read_table(spark, table, "logs", prune=("warc_ts", far, None))
    assert nothing.count() == 0


def test_file_stats_unstatted_files_never_pruned(spark, table):
    """Files written AFTER a stats collection lack stats and must always
    survive pruning (superset guarantee), and dir-mode partitions are kept
    whole."""
    TF.compact_table(spark, table, "logs", max_files=0, target_files=2,
                     cluster_by="warc_ts")
    TF.collect_file_stats(spark, table, "logs", ["warc_ts"])
    # append a NEW partition (dir-mode, no stats at all)
    extra = CP.with_part_key(synth.documents(spark, 50), n_parts=1, key_cols=["url"])
    extra = extra.drop("html").withColumn(
        CP.PART_COL, F.lit("fresh").cast("string"))
    TF.write_multi_sink({"logs": extra}, table, run_id="r2")
    import datetime as dt
    far = dt.datetime(2099, 1, 1)
    out = TF.read_table(spark, table, "logs", prune=("warc_ts", far, None))
    # every statted file is out of range and pruned; the fresh dir-mode
    # partition has no stats so it must survive whole (superset guarantee)
    survivors = set(out.inputFiles())
    assert survivors and all("fresh" in f for f in survivors)
    assert out.count() == 50


def test_file_stats_survive_expiry(spark, table):
    TF.compact_table(spark, table, "logs", max_files=0, target_files=3,
                     cluster_by="warc_ts")
    TF.collect_file_stats(spark, table, "logs", ["warc_ts"])
    before = TF.CommitLog(table).manifest()["logs"]
    TF.expire_snapshots(table)
    after = TF.CommitLog(table).manifest()["logs"]
    assert before == after and any("stats" in info for info in after.values())


def test_bloom_equality_skipping(spark, table):
    """Point-lookup skipping: per-file Bloom filters prune files that
    cannot hold the probed url, result stays identical to full scan +
    filter, and min/max + bloom collections compose in the manifest."""
    TF.compact_table(spark, table, "logs", max_files=0, target_files=4)
    TF.collect_file_stats(spark, table, "logs", ["warc_ts"])
    TF.collect_file_blooms(spark, table, "logs", "url", bits=1 << 14)

    man = TF.CommitLog(table).manifest()["logs"]
    some = next(iter(man.values()))["stats"]
    fs = next(iter(some.values()))
    assert "warc_ts" in fs and "_bloom:url" in fs  # merged, not clobbered

    full = TF.read_table(spark, table, "logs")
    target = full.select("url").limit(1).collect()[0]["url"]
    pruned = TF.read_table(spark, table, "logs", prune_eq=("url", target))
    exp = sorted(r.url for r in full.filter(F.col("url") == target).collect())
    got = sorted(r.url for r in pruned.filter(F.col("url") == target).collect())
    assert got == exp and len(got) >= 1
    # a url lives in exactly one file (4 files/partition, 3 partitions):
    # the bloom must prune most of the 12 — allow FP slack but require >half
    assert len(pruned.inputFiles()) <= len(full.inputFiles()) // 2

    # absent key: every statted file pruned, scan is empty but sound
    ghost = TF.read_table(
        spark, table, "logs", prune_eq=("url", "https://no.such.url/xyz")
    )
    assert ghost.filter(F.col("url") == "https://no.such.url/xyz").count() == 0
