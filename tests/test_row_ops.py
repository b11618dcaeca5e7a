"""Row-level copy-on-write ops on the table-format shim — DELETE, MERGE
(upsert), and time travel — the Iceberg `DELETE FROM` / `MERGE INTO` /
`VERSION AS OF` analogs.  Each op must touch only DIRTY files, keep the old
bytes dark until one atomic snapshot, and leave readers consistent across
every crash window (staged-but-uncommitted output is invisible; vacuum
removes it)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_spark import synth
from vector_spark.plans import checkpoint as CP
from vector_spark.plans import table_format as TF


def _rows(df, *cols):
    cols = cols or ("url", "lang", "text")
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture()
def table(spark, tmp_path):
    docs = CP.with_part_key(synth.documents(spark, 600), n_parts=3, key_cols=["url"])
    docs = docs.drop("html").repartition(8)
    base = str(tmp_path / "t")
    TF.write_multi_sink({"logs": docs}, base, run_id="r1")
    return base


def _live_files(base, sink="logs"):
    return {
        p: list(info["files"] or []) for p, info in TF.CommitLog(base).manifest()[sink].items()
    }


# ---------------------------------------------------------------------------
# DELETE
# ---------------------------------------------------------------------------


def test_delete_where_removes_exactly_matching_rows(spark, table):
    before = TF.read_table(spark, table, "logs")
    pred = F.col("lang") == "de"
    n_match = before.where(pred).count()
    expect = _rows(before.where(~F.coalesce(pred, F.lit(False))))
    assert n_match > 0

    res = TF.delete_where(spark, table, "logs", F.col("lang") == "de")
    assert res["deleted"] == n_match
    after = TF.read_table(spark, table, "logs")
    assert _rows(after) == expect
    # manifest row accounting matches the physical table
    committed = TF.CommitLog(table).committed()["logs"]
    assert sum(committed.values()) == after.count()


def test_delete_where_sql_string_and_null_predicate_rows_survive(spark, table):
    # rows where the predicate is NULL are NOT deleted (SQL DELETE semantics)
    res = TF.delete_where(
        spark, table, "logs", "CASE WHEN lang = 'fr' THEN true ELSE NULL END"
    )
    after = TF.read_table(spark, table, "logs")
    assert res["deleted"] > 0
    assert after.where(F.col("lang") == "fr").count() == 0
    assert after.where(F.col("lang") != "fr").count() == after.count()


def test_delete_where_rewrites_only_dirty_files(spark, table):
    # delete one specific url: exactly the files containing it are rewritten
    url = TF.read_table(spark, table, "logs").select("url").first()[0]
    files_before = _live_files(table)
    res = TF.delete_where(spark, table, "logs", F.col("url") == url)
    assert res["deleted"] >= 1
    assert 0 < res["files_rewritten"] < res["files_total"]
    files_after = _live_files(table)
    # untouched partitions keep their exact file lists
    changed = {p for p in files_before if files_before[p] != files_after[p]}
    assert changed  # something was rewritten
    for p in set(files_before) - changed:
        assert files_before[p] == files_after[p]


def test_delete_where_with_bloom_prune_scans_fewer_files(spark, table):
    TF.collect_file_blooms(spark, table, "logs", "url")
    url = TF.read_table(spark, table, "logs").select("url").first()[0]
    n_before = TF.read_table(spark, table, "logs").count()
    res = TF.delete_where(
        spark, table, "logs", F.col("url") == url, prune_eq=("url", url)
    )
    assert res["files_scanned"] < res["files_total"]
    assert res["deleted"] >= 1
    after = TF.read_table(spark, table, "logs")
    assert after.where(F.col("url") == url).count() == 0
    assert after.count() == n_before - res["deleted"]


def test_delete_crash_before_commit_leaves_readers_unchanged(spark, table, monkeypatch):
    before = _rows(TF.read_table(spark, table, "logs"))
    orig = TF.CommitLog.commit

    def failing(self, meta):
        if meta.get("operation") == "delete":
            raise RuntimeError("injected crash before delete commit")
        return orig(self, meta)

    monkeypatch.setattr(TF.CommitLog, "commit", failing)
    with pytest.raises(RuntimeError, match="injected"):
        TF.delete_where(spark, table, "logs", F.col("lang") == "de")
    monkeypatch.setattr(TF.CommitLog, "commit", orig)
    # staged dl files are dark; readers see the original table
    assert _rows(TF.read_table(spark, table, "logs")) == before
    deleted = TF.vacuum_table(table, "logs", staging_grace_s=0)
    assert any("dl" in os.path.basename(p) for p in deleted)
    assert _rows(TF.read_table(spark, table, "logs")) == before


# ---------------------------------------------------------------------------
# MERGE (upsert)
# ---------------------------------------------------------------------------


def _mk_updates(spark, tbl, n_update=5, n_insert=3):
    upd = (
        tbl.orderBy("url")
        .limit(n_update)
        .withColumn("text", F.concat(F.col("text"), F.lit(" [v2]")))
    )
    ins = (
        synth.documents(spark, 4000)
        .drop("html")
        .withColumn("url", F.concat(F.lit("https://new.example/"), F.col("url")))
        .orderBy("url")
        .limit(n_insert)
    )
    ins = CP.with_part_key(ins, n_parts=3, key_cols=["url"]).select(*upd.columns)
    return upd.unionByName(ins), n_update, n_insert


def test_merge_upsert_replaces_matched_and_inserts_new(spark, table):
    tbl = TF.read_table(spark, table, "logs")
    n0 = tbl.count()
    updates, n_upd, n_ins = _mk_updates(spark, tbl)
    res = TF.merge_upsert(spark, table, "logs", updates, key_cols=["url"])
    assert res["matched"] == n_upd
    assert res["inserted"] == n_upd + n_ins

    after = TF.read_table(spark, table, "logs")
    assert after.count() == n0 + n_ins
    assert after.where(F.col("text").endswith(" [v2]")).count() == n_upd
    assert after.where(F.col("url").startswith("https://new.example/")).count() == n_ins
    # upsert is key-unique: no duplicate urls introduced
    assert after.select("url").distinct().count() == after.count()
    committed = TF.CommitLog(table).committed()["logs"]
    assert sum(committed.values()) == after.count()


def test_merge_upsert_bloom_narrowing_skips_clean_files(spark, table):
    TF.collect_file_blooms(spark, table, "logs", "url")
    tbl = TF.read_table(spark, table, "logs")
    updates, n_upd, n_ins = _mk_updates(spark, tbl, n_update=2, n_insert=1)
    res = TF.merge_upsert(spark, table, "logs", updates, key_cols=["url"])
    assert res["bloom_skipped"] > 0
    assert res["files_scanned"] < res["files_total"]
    assert res["matched"] == n_upd
    after = TF.read_table(spark, table, "logs")
    assert after.where(F.col("text").endswith(" [v2]")).count() == n_upd
    assert after.select("url").distinct().count() == after.count()


def test_merge_upsert_schema_mismatch_rejected(spark, table):
    bad = TF.read_table(spark, table, "logs").limit(1).drop("lang")
    with pytest.raises(ValueError, match="schema"):
        TF.merge_upsert(spark, table, "logs", bad, key_cols=["url"])


def test_merge_upsert_into_new_partition(spark, table):
    tbl = TF.read_table(spark, table, "logs")
    row = tbl.limit(1)
    novel = row.withColumn(CP.PART_COL, F.lit(99)).withColumn(
        "url", F.lit("https://novel.example/only")
    )
    res = TF.merge_upsert(spark, table, "logs", novel, key_cols=["url"])
    assert res["matched"] == 0 and res["inserted"] == 1
    after = TF.read_table(spark, table, "logs")
    assert after.where(F.col(CP.PART_COL) == 99).count() == 1
    assert TF.CommitLog(table).committed()["logs"]["99"] == 1


# ---------------------------------------------------------------------------
# Time travel
# ---------------------------------------------------------------------------


def test_time_travel_reads_pre_delete_snapshot(spark, table):
    TF.pin_files(table, "logs")  # v2: file-mode → time-travelable
    v_pinned = TF.CommitLog(table).current_version()
    before = _rows(TF.read_table(spark, table, "logs"))

    TF.delete_where(spark, table, "logs", F.col("lang") == "de")
    now = _rows(TF.read_table(spark, table, "logs"))
    assert now != before

    # as-of the pinned snapshot: the deleted rows are back (old files dark
    # but on disk until vacuum)
    assert _rows(TF.read_table(spark, table, "logs", version=v_pinned)) == before
    # vacuum removes the pre-delete files → that version is gone
    TF.vacuum_table(table, "logs", staging_grace_s=0)
    with pytest.raises(TF.TimeTravelUnavailable, match="no longer on disk"):
        TF.read_table(spark, table, "logs", version=v_pinned)
    assert _rows(TF.read_table(spark, table, "logs")) == now


def test_time_travel_dir_mode_changed_later_is_refused(spark, table):
    v1 = TF.CommitLog(table).current_version()
    TF.pin_files(table, "logs")  # later snapshot touches the dir-mode parts
    with pytest.raises(TF.TimeTravelUnavailable, match="dir-mode"):
        TF.read_table(spark, table, "logs", version=v1)


def test_time_travel_dir_mode_untouched_is_fine(spark, table):
    v1 = TF.CommitLog(table).current_version()
    before = _rows(TF.read_table(spark, table, "logs"))
    # a later snapshot touching OTHER sinks doesn't block logs@v1
    extra = CP.with_part_key(
        synth.documents(spark, 50).drop("html"), n_parts=2, key_cols=["url"]
    )
    TF.write_multi_sink({"other": extra}, table, run_id="r2")
    assert _rows(TF.read_table(spark, table, "logs", version=v1)) == before


def test_time_travel_expired_version_raises(spark, table):
    TF.pin_files(table, "logs")
    TF.expire_snapshots(table)
    with pytest.raises(ValueError, match="no snapshot metadata"):
        TF.read_table(spark, table, "logs", version=1)


def test_merge_then_time_travel_roundtrip(spark, table):
    TF.pin_files(table, "logs")
    v = TF.CommitLog(table).current_version()
    before = _rows(TF.read_table(spark, table, "logs"))
    updates, _, _ = _mk_updates(spark, TF.read_table(spark, table, "logs"))
    TF.merge_upsert(spark, table, "logs", updates, key_cols=["url"])
    assert _rows(TF.read_table(spark, table, "logs", version=v)) == before


# ---------------------------------------------------------------------------
# ROLLBACK (Iceberg rollback_to_snapshot analog: roll-forward checkpoint)
# ---------------------------------------------------------------------------


def test_rollback_undoes_delete_and_preserves_history(spark, table):
    TF.pin_files(table, "logs")  # v2: file-mode → rollback-able
    v_pinned = TF.CommitLog(table).current_version()
    before = _rows(TF.read_table(spark, table, "logs"))

    TF.delete_where(spark, table, "logs", F.col("lang") == "de")
    v_deleted = TF.CommitLog(table).current_version()
    deleted_state = _rows(TF.read_table(spark, table, "logs"))
    assert deleted_state != before

    new_v = TF.rollback_table(table, v_pinned)
    assert new_v == v_deleted + 1  # roll-FORWARD: a new snapshot, not erasure
    assert _rows(TF.read_table(spark, table, "logs")) == before
    # committed() row accounting matches the restored physical table
    committed = TF.CommitLog(table).committed()["logs"]
    assert sum(committed.values()) == len(before)
    # history preserved: the rolled-back-away version still time-travels
    assert _rows(TF.read_table(spark, table, "logs", version=v_deleted)) == deleted_state
    # and vacuum (current-manifest rule, no rollback awareness) now reclaims
    # the delete's rewrite output; the restored state is untouched
    removed = TF.vacuum_table(table, "logs", staging_grace_s=0)
    assert removed
    assert _rows(TF.read_table(spark, table, "logs")) == before
    with pytest.raises(TF.TimeTravelUnavailable, match="no longer on disk"):
        TF.read_table(spark, table, "logs", version=v_deleted)


def test_rollback_restores_pre_evolution_schema(spark, table):
    TF.pin_files(table, "logs")
    v = TF.CommitLog(table).current_version()
    evolved = CP.with_part_key(
        synth.documents(spark, 50).drop("html").withColumn("c", F.lit("x")),
        n_parts=1,
        key_cols=["url"],
    ).withColumn(CP.PART_COL, F.lit("9"))  # fresh partition: appends never rewrite
    TF.write_multi_sink({"logs": evolved}, table, run_id="r2")
    assert "c" in TF.read_table(spark, table, "logs").columns

    TF.rollback_table(table, v)
    got = TF.read_table(spark, table, "logs")
    assert "c" not in got.columns  # v's recorded schema, not the evolved one


def test_rollback_out_of_range_and_noop(spark, table):
    cur = TF.CommitLog(table).current_version()
    with pytest.raises(ValueError, match="cannot roll back"):
        TF.rollback_table(table, cur + 1)
    with pytest.raises(ValueError, match="cannot roll back"):
        TF.rollback_table(table, 0)
    assert TF.rollback_table(table, cur) == cur  # no-op, no new snapshot
    assert TF.CommitLog(table).current_version() == cur


def test_rollback_refused_when_bytes_gone(spark, table):
    TF.pin_files(table, "logs")
    v_pinned = TF.CommitLog(table).current_version()
    TF.delete_where(spark, table, "logs", F.col("lang") == "de")
    TF.vacuum_table(table, "logs", staging_grace_s=0)  # pre-delete bytes gone
    with pytest.raises(TF.TimeTravelUnavailable, match="no longer on disk"):
        TF.rollback_table(table, v_pinned)
    # refusal left no snapshot behind
    assert TF.CommitLog(table).snapshots()[-1]["operation"] != "checkpoint"


def test_rollback_refused_for_later_touched_dir_mode(spark, table):
    v1 = TF.CommitLog(table).current_version()
    TF.pin_files(table, "logs")  # later snapshot touches the dir-mode parts
    with pytest.raises(TF.TimeTravelUnavailable, match="dir-mode"):
        TF.rollback_table(table, v1)


# ---------------------------------------------------------------------------
# MERGE-ON-READ deletes (Iceberg v2 positional delete files)
# ---------------------------------------------------------------------------


def test_mor_delete_semantics_without_rewrites(spark, table):
    before = TF.read_table(spark, table, "logs")
    pred = F.col("lang") == "de"
    n_match = before.where(pred).count()
    expect = _rows(before.where(~F.coalesce(pred, F.lit(False))))
    files_before = None

    res = TF.delete_where(spark, table, "logs", pred, mode="merge-on-read")
    files_before = _live_files(table)
    assert res["deleted"] == n_match
    assert res["files_rewritten"] == 0 and res["delete_files"] >= 1
    after = TF.read_table(spark, table, "logs")
    assert _rows(after) == expect
    # no data file was touched: the manifest file lists are the pinned ones
    # and every listed file still exists
    for p, fs in files_before.items():
        assert fs, "MOR delete pins partitions to file-mode"
    # logical row accounting moved with the tombstones
    committed = TF.CommitLog(table).committed()["logs"]
    assert sum(committed.values()) == len(expect)


def test_mor_repeat_delete_never_double_counts(spark, table):
    n_de = TF.read_table(spark, table, "logs").where("lang = 'de'").count()
    n_fr = TF.read_table(spark, table, "logs").where("lang = 'fr'").count()
    assert n_de and n_fr
    r1 = TF.delete_where(spark, table, "logs", "lang = 'de'", mode="merge-on-read")
    # overlapping predicate: the de rows are already tombstoned — only fr match
    r2 = TF.delete_where(
        spark, table, "logs", "lang IN ('de','fr')", mode="merge-on-read"
    )
    assert r1["deleted"] == n_de and r2["deleted"] == n_fr
    got = TF.read_table(spark, table, "logs")
    assert got.where("lang IN ('de','fr')").count() == 0
    committed = TF.CommitLog(table).committed()["logs"]
    assert sum(committed.values()) == got.count()


def test_mor_blocks_cow_ops_until_materialized(spark, table):
    TF.delete_where(spark, table, "logs", "lang = 'de'", mode="merge-on-read")
    with pytest.raises(ValueError, match="pending merge-on-read"):
        TF.compact_table(spark, table, "logs", max_files=0)
    with pytest.raises(ValueError, match="pending merge-on-read"):
        TF.delete_where(spark, table, "logs", "lang = 'fr'")
    updates, _, _ = _mk_updates(spark, TF.read_table(spark, table, "logs"))
    with pytest.raises(ValueError, match="pending merge-on-read"):
        TF.merge_upsert(spark, table, "logs", updates, key_cols=["url"])


def test_mor_materialize_rewrites_only_dirty_and_clears(spark, table):
    pred = F.col("lang") == "de"
    expect = _rows(TF.read_table(spark, table, "logs").where(~F.coalesce(pred, F.lit(False))))
    TF.delete_where(spark, table, "logs", pred, mode="merge-on-read")
    files_before = _live_files(table)
    n_files_total = sum(len(v) for v in files_before.values())

    res = TF.materialize_deletes(spark, table, "logs")
    assert res["applied"] > 0 and res["delete_files_cleared"] >= 1
    assert 0 < res["files_rewritten"] <= n_files_total
    assert not TF.CommitLog(table).delete_files().get("logs")
    assert _rows(TF.read_table(spark, table, "logs")) == expect
    # second materialize is a no-op
    assert TF.materialize_deletes(spark, table, "logs")["applied"] == 0
    # COW ops are unblocked again
    TF.delete_where(spark, table, "logs", "lang = 'fr'")
    # vacuum reclaims the old data files AND the spent tombstones
    removed = TF.vacuum_table(table, "logs", staging_grace_s=0)
    assert any("_deletes" in p for p in removed)
    assert _rows(TF.read_table(spark, table, "logs")) == _rows(
        TF.read_table(spark, table, "logs")
    )


def test_mor_time_travel_and_rollback(spark, table):
    TF.pin_files(table, "logs")
    v_before = TF.CommitLog(table).current_version()
    before = _rows(TF.read_table(spark, table, "logs"))
    TF.delete_where(spark, table, "logs", "lang = 'de'", mode="merge-on-read")
    v_mor = TF.CommitLog(table).current_version()
    after = _rows(TF.read_table(spark, table, "logs"))
    assert after != before

    # pre-delete version: data files untouched, tombstones excluded by fold
    assert _rows(TF.read_table(spark, table, "logs", version=v_before)) == before
    # rollback to pre-delete: tombstones dropped from the current fold too
    TF.rollback_table(table, v_before)
    assert _rows(TF.read_table(spark, table, "logs")) == before
    assert not TF.CommitLog(table).delete_files().get("logs")
    # the MOR version still reads correctly (roll-forward history)...
    assert _rows(TF.read_table(spark, table, "logs", version=v_mor)) == after
    # ...until vacuum removes the now-dead tombstones
    TF.vacuum_table(table, "logs", staging_grace_s=0)
    with pytest.raises(TF.TimeTravelUnavailable, match="tombstone"):
        TF.read_table(spark, table, "logs", version=v_mor)


def test_mor_state_survives_expire_snapshots(spark, table):
    TF.delete_where(spark, table, "logs", "lang = 'de'", mode="merge-on-read")
    expect = _rows(TF.read_table(spark, table, "logs"))
    TF.expire_snapshots(table)
    assert _rows(TF.read_table(spark, table, "logs")) == expect
    assert TF.CommitLog(table).delete_files().get("logs")


def test_mor_crash_before_commit_leaves_readers_unchanged(spark, table, monkeypatch):
    before = _rows(TF.read_table(spark, table, "logs"))
    orig = TF.CommitLog.commit

    def failing(self, meta):
        if meta.get("operation") == "delete_mor":
            raise RuntimeError("injected crash before delete_mor commit")
        return orig(self, meta)

    monkeypatch.setattr(TF.CommitLog, "commit", failing)
    with pytest.raises(RuntimeError, match="injected"):
        TF.delete_where(spark, table, "logs", "lang = 'de'", mode="merge-on-read")
    monkeypatch.setattr(TF.CommitLog, "commit", orig)
    # moved-but-uncommitted tombstones are dark: the fold lists none, readers
    # see the original table, vacuum reclaims the orphans
    assert not TF.CommitLog(table).delete_files().get("logs")
    assert _rows(TF.read_table(spark, table, "logs")) == before
    removed = TF.vacuum_table(table, "logs", staging_grace_s=0)
    assert any("_deletes" in p for p in removed)
    assert _rows(TF.read_table(spark, table, "logs")) == before


# ---------------------------------------------------------------------------
# EQUALITY deletes + file-level appends (Iceberg v2 CDC shape)
# ---------------------------------------------------------------------------


def _victims(spark, table, n=5):
    tbl = TF.read_table(spark, table, "logs")
    v = tbl.orderBy("url").limit(n).select("url")
    return v, [r["url"] for r in v.collect()]


def test_eq_delete_is_blind_and_correct(spark, table):
    before = TF.read_table(spark, table, "logs")
    n0 = before.count()
    keys, vlist = _victims(spark, table)
    files_before = None

    res = TF.delete_keys(spark, table, "logs", keys)
    assert res == {"delete_files": 1, "key_cols": ["url"]}
    files_before = _live_files(table)
    after = TF.read_table(spark, table, "logs")
    assert after.count() == n0 - len(vlist)
    assert after.where(F.col("url").isin(vlist)).count() == 0
    # blind: no data file rewritten (pinned lists intact on disk)
    for p, fs in files_before.items():
        for f in fs:
            assert os.path.exists(os.path.join(table, "logs", f"{CP.PART_COL}={p}", f))


def test_add_files_appends_into_committed_partitions(spark, table):
    n0 = TF.read_table(spark, table, "logs").count()
    extra = CP.with_part_key(
        synth.documents(spark, 650).drop("html"), n_parts=3, key_cols=["url"]
    ).where(~F.col("url").isin(
        [r["url"] for r in TF.read_table(spark, table, "logs").select("url").collect()]
    )).limit(40)
    n_extra = extra.count()
    assert n_extra > 0
    rows = TF.add_files(spark, table, "logs", extra)
    assert sum(rows.values()) == n_extra
    got = TF.read_table(spark, table, "logs")
    assert got.count() == n0 + n_extra
    committed = TF.CommitLog(table).committed()["logs"]
    assert sum(committed.values()) == n0 + n_extra


def test_eq_reinsert_survives_sequence_rule(spark, table):
    keys, vlist = _victims(spark, table)
    TF.delete_keys(spark, table, "logs", keys)
    reborn = (
        CP.with_part_key(
            synth.documents(spark, 600).drop("html"), n_parts=3, key_cols=["url"]
        )
        .where(F.col("url").isin(vlist[:2]))
        .withColumn("text", F.lit("REBORN"))
    )
    TF.add_files(spark, table, "logs", reborn)
    got = TF.read_table(spark, table, "logs")
    texts = [r["text"] for r in got.where(F.col("url").isin(vlist)).collect()]
    assert texts == ["REBORN", "REBORN"]  # newer files dodge older tombstones

    # materialize settles everything; the reborn rows persist
    TF.materialize_deletes(spark, table, "logs")
    final = TF.read_table(spark, table, "logs")
    assert final.where("text = 'REBORN'").count() == 2
    assert final.where(F.col("url").isin(vlist)).count() == 2
    committed = TF.CommitLog(table).committed()["logs"]
    assert sum(committed.values()) == final.count()
    assert not TF.CommitLog(table).eq_delete_files().get("logs")


def test_eq_delete_blocks_cow_and_keycol_switch(spark, table):
    keys, _ = _victims(spark, table)
    TF.delete_keys(spark, table, "logs", keys)
    with pytest.raises(ValueError, match="pending merge-on-read"):
        TF.compact_table(spark, table, "logs", max_files=0)
    with pytest.raises(ValueError, match="key_cols"):
        TF.delete_keys(
            spark, table, "logs",
            TF.read_table(spark, table, "logs").select("lang").limit(1),
        )


def test_eq_delete_unmatched_keys_clear_cleanly(spark, table):
    n0 = TF.read_table(spark, table, "logs").count()
    ghost = spark.createDataFrame([("https://nowhere.invalid/x",)], "url string")
    TF.delete_keys(spark, table, "logs", ghost)
    assert TF.read_table(spark, table, "logs").count() == n0
    res = TF.materialize_deletes(spark, table, "logs")
    assert res["applied"] == 0 and res["files_rewritten"] == 0
    assert res["delete_files_cleared"] == 1
    assert not TF.CommitLog(table).eq_delete_files().get("logs")
    assert TF.read_table(spark, table, "logs").count() == n0


def test_eq_time_travel_and_rollback(spark, table):
    TF.pin_files(table, "logs")
    v0 = TF.CommitLog(table).current_version()
    before = _rows(TF.read_table(spark, table, "logs"))
    keys, vlist = _victims(spark, table)
    TF.delete_keys(spark, table, "logs", keys)
    assert _rows(TF.read_table(spark, table, "logs", version=v0)) == before
    TF.rollback_table(table, v0)
    assert _rows(TF.read_table(spark, table, "logs")) == before
    assert not TF.CommitLog(table).eq_delete_files().get("logs")


def test_eq_state_survives_expire_snapshots(spark, table):
    keys, vlist = _victims(spark, table)
    TF.delete_keys(spark, table, "logs", keys)
    reborn = (
        CP.with_part_key(
            synth.documents(spark, 600).drop("html"), n_parts=3, key_cols=["url"]
        )
        .where(F.col("url").isin(vlist[:1]))
        .withColumn("text", F.lit("REBORN"))
    )
    TF.add_files(spark, table, "logs", reborn)
    expect = _rows(TF.read_table(spark, table, "logs"))
    TF.expire_snapshots(table)
    # eq tombstones, key_cols, AND the file add-versions all survive the
    # metadata consolidation — the reborn row still dodges the tombstone
    got = TF.read_table(spark, table, "logs")
    assert _rows(got) == expect
    assert got.where("text = 'REBORN'").count() == 1


def test_cdc_upsert_one_snapshot_and_idempotent_retry(spark, table):
    tbl = TF.read_table(spark, table, "logs")
    n0 = tbl.count()
    batch = (
        tbl.orderBy("url").limit(4)
        .withColumn("text", F.lit("CDC-V2"))
        .localCheckpoint()
    )
    v_before = TF.CommitLog(table).current_version()
    res = TF.upsert_keys(spark, table, "logs", batch, ["url"], run_id="b-1")
    assert res["deleted_keys"] == 1 and sum(res["rows"].values()) == 4
    # ONE snapshot carries tombstones + data files (plus the pin before it)
    snaps = [s for s in TF.CommitLog(table).snapshots() if s["version"] > v_before]
    assert [s["operation"] for s in snaps if s["operation"] == "cdc_upsert"] == ["cdc_upsert"]

    got = TF.read_table(spark, table, "logs")
    assert got.count() == n0  # 4 replaced, none added
    assert got.where("text = 'CDC-V2'").count() == 4

    # retry of the same batch is a no-op (exactly-once foreachBatch contract)
    v = TF.CommitLog(table).current_version()
    assert TF.upsert_keys(spark, table, "logs", batch, ["url"], run_id="b-1") == {
        "skipped": True
    }
    assert TF.CommitLog(table).current_version() == v
    assert TF.read_table(spark, table, "logs").where("text = 'CDC-V2'").count() == 4


def test_cdc_upsert_chain_then_materialize(spark, table):
    tbl = TF.read_table(spark, table, "logs")
    n0 = tbl.count()
    keys = tbl.orderBy("url").limit(3).select("url").localCheckpoint()
    base_batch = tbl.orderBy("url").limit(3).localCheckpoint()
    for i in range(3):  # three generations of the same 3 keys
        batch = base_batch.withColumn("text", F.lit(f"GEN-{i}"))
        TF.upsert_keys(spark, table, "logs", batch, ["url"], run_id=f"g-{i}")
    got = TF.read_table(spark, table, "logs")
    assert got.count() == n0
    joined = got.join(keys, "url", "left_semi")
    assert sorted(r["text"] for r in joined.collect()) == ["GEN-2"] * 3

    TF.materialize_deletes(spark, table, "logs")
    final = TF.read_table(spark, table, "logs")
    assert final.count() == n0
    assert sorted(
        r["text"] for r in final.join(keys, "url", "left_semi").collect()
    ) == ["GEN-2"] * 3
    committed = TF.CommitLog(table).committed()["logs"]
    assert sum(committed.values()) == n0
