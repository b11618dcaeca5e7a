"""Table-format shim (Iceberg analog): snapshot-isolated reads, atomic
multi-sink commits, crash-between-sinks leaves no torn state, resume skips
committed partitions (VERDICT r1 item 6)."""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_spark import synth
from vector_spark.plans import checkpoint as CP
from vector_spark.plans import table_format as TF


@pytest.fixture()
def routed(spark):
    docs = CP.with_part_key(synth.documents(spark, 400), n_parts=4, key_cols=["url"])
    docs = docs.drop("html")
    return {
        "errors": docs.filter(F.col("lang") == "en"),
        "rest": docs.filter(F.col("lang") != "en"),
    }


def test_multi_sink_commit_and_snapshot_read(spark, routed, tmp_path):
    base = str(tmp_path / "out")
    written = TF.write_multi_sink(routed, base, run_id="r1")
    assert set(written) == {"errors", "rest"}
    total = sum(n for parts in written.values() for n in parts.values())
    assert total == 400

    log = TF.CommitLog(base)
    assert log.current_version() == 1  # ONE snapshot covers both sinks

    a = TF.read_table(spark, base, "errors")
    b = TF.read_table(spark, base, "rest")
    assert a.count() + b.count() == 400
    assert set(a.select("lang").distinct().toPandas().lang) == {"en"}


def test_uncommitted_data_is_invisible(spark, routed, tmp_path):
    """Data files written WITHOUT a commit (= crash before the snapshot
    rename) are invisible to snapshot readers."""
    base = str(tmp_path / "out")
    routed["errors"].write.partitionBy(CP.PART_COL).parquet(os.path.join(base, "errors"))
    assert TF.read_table(spark, base, "errors") is None  # no snapshot → nothing visible


def test_crash_between_sinks_no_torn_state(spark, routed, tmp_path):
    """Run 1 'crashes' after writing sink 1's data but before sink 2 — the
    snapshot never publishes, so readers see NEITHER sink.  The rerun
    rewrites idempotently and commits both at once."""
    base = str(tmp_path / "out")

    def crash_after_first_sink(sinks, base_):
        # emulate: write first sink's files, then die before any commit
        (name, df), *_ = sinks.items()
        df.write.mode("overwrite").partitionBy(CP.PART_COL).parquet(os.path.join(base_, name))
        raise RuntimeError("killed between sinks")

    with pytest.raises(RuntimeError, match="killed between sinks"):
        crash_after_first_sink(routed, base)

    # torn? no: nothing committed, both sinks invisible
    assert TF.CommitLog(base).current_version() == 0
    assert TF.read_table(spark, base, "errors") is None
    assert TF.read_table(spark, base, "rest") is None

    # restart: full write succeeds; the orphaned files are overwritten
    TF.write_multi_sink(routed, base, run_id="r2")
    a, b = TF.read_table(spark, base, "errors"), TF.read_table(spark, base, "rest")
    assert a.count() + b.count() == 400
    # exactly once: no duplicated rows from the orphaned first write
    assert a.select("url").distinct().count() == a.count()


def test_resume_skips_committed_partitions(spark, tmp_path):
    """Partial run commits parts {0,1}; the full rerun writes only {2,3}
    and does NOT touch (reprocess) the committed parts' data files."""
    base = str(tmp_path / "out")
    docs = CP.with_part_key(synth.documents(spark, 400), n_parts=4, key_cols=["url"]).drop("html")

    partial = {"t": docs.filter(F.col(CP.PART_COL) < 2)}
    w1 = TF.write_multi_sink(partial, base, run_id="r1")
    assert set(w1["t"]) == {"0", "1"}

    mtimes_before = {}
    for k in ("0", "1"):
        d = os.path.join(base, "t", f"{CP.PART_COL}={k}")
        mtimes_before[k] = {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}

    w2 = TF.write_multi_sink({"t": docs}, base, run_id="r1-resume")
    assert set(w2["t"]) == {"2", "3"}  # committed parts skipped

    for k in ("0", "1"):
        d = os.path.join(base, "t", f"{CP.PART_COL}={k}")
        after = {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}
        assert after == mtimes_before[k]  # data files untouched — not reprocessed

    got = TF.read_table(spark, base, "t")
    assert got.count() == 400
    assert TF.CommitLog(base).current_version() == 2


def test_commit_log_versions_monotonic(tmp_path):
    log = TF.CommitLog(str(tmp_path))
    assert log.commit({"sinks": {}}) == 1
    assert log.commit({"sinks": {}}) == 2
    assert [s["version"] for s in log.snapshots()] == [1, 2]


def test_noop_rerun_creates_no_snapshot(spark, tmp_path):
    base = str(tmp_path / "out")
    docs = CP.with_part_key(synth.documents(spark, 100), n_parts=2, key_cols=["url"]).drop("html")
    TF.write_multi_sink({"t": docs}, base)
    assert TF.CommitLog(base).current_version() == 1
    again = TF.write_multi_sink({"t": docs}, base)
    assert again == {"t": {}}
    assert TF.CommitLog(base).current_version() == 1  # nothing written → no empty snapshot


# --------------------------------------------------------------------------
# Chaos property: randomized crash schedules (VERDICT r2 item 8)
# --------------------------------------------------------------------------

class _InjectedCrash(RuntimeError):
    pass


def _crash_at(target_event_ix):
    """Hook that raises on the Nth write_multi_sink event (0-based); None
    never crashes."""
    seen = {"n": -1}

    def hook(evt):
        seen["n"] += 1
        if target_event_ix is not None and seen["n"] == target_event_ix:
            raise _InjectedCrash(evt)

    return hook


def _visible_state(spark, base, sinks):
    """{sink: visible row count} via snapshot reads + the committed ledger."""
    out = {}
    for name in sinks:
        t = TF.read_table(spark, base, name)
        out[name] = 0 if t is None else t.count()
    return out


@given(st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=3))
@settings(
    max_examples=int(os.environ.get("CHAOS_EXAMPLES", "10")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
def test_multi_sink_chaos_schedules(spark, tmp_path_factory, crash_points):
    """Randomized crash schedules against the REAL write path: a sequence of
    runs, each killed at a random protocol event (before/after each sink's
    data write, before the commit rename), then a clean run.  Invariants at
    every step:

      * readers NEVER see torn state — per-sink visible rows always equal
        the committed ledger exactly (uncommitted data files are invisible);
      * a commit is all-or-nothing across sinks;
      * resume never reprocesses — data files of committed partitions are
        byte-untouched (mtime-stable) across every subsequent run;
      * the final clean run converges to exactly-once: all rows visible,
        no duplicates.

    Run with CHAOS_EXAMPLES=200 for the full certification sweep (kept
    smaller by default to bound suite time; derandomized so any failure
    reproduces)."""
    base = str(tmp_path_factory.mktemp("chaos"))
    docs = CP.with_part_key(synth.documents(spark, 60), n_parts=3, key_cols=["url"]).drop("html")
    sinks = {
        "en": docs.filter(F.col("lang") == "en"),
        "rest": docs.filter(F.col("lang") != "en"),
    }
    total = docs.count()

    def committed_totals():
        led = TF.CommitLog(base).committed()
        return {name: sum(led.get(name, {}).values()) for name in sinks}

    def committed_file_mtimes():
        out = {}
        for name, parts in TF.CommitLog(base).committed().items():
            for k in parts:
                d = os.path.join(base, name, f"{CP.PART_COL}={k}")
                if os.path.isdir(d):
                    for f in os.listdir(d):
                        out[(name, k, f)] = os.path.getmtime(os.path.join(d, f))
        return out

    mtimes = {}
    for point in crash_points:
        try:
            TF.write_multi_sink(sinks, base, on_event=_crash_at(point))
        except _InjectedCrash:
            pass
        # invariant: visible == committed, for every sink, crash or not
        assert _visible_state(spark, base, sinks) == committed_totals()
        # invariant: previously committed data files untouched by this run
        now = committed_file_mtimes()
        for key, mt in mtimes.items():
            assert now.get(key) == mt, f"committed file reprocessed: {key}"
        mtimes = now

    # clean run converges to exactly-once
    TF.write_multi_sink(sinks, base)
    vis = _visible_state(spark, base, sinks)
    assert sum(vis.values()) == total
    for name in sinks:
        t = TF.read_table(spark, base, name)
        assert t.select("url").distinct().count() == t.count()
    now = committed_file_mtimes()
    for key, mt in mtimes.items():
        assert now.get(key) == mt


# --------------------------------------------------------------------------
# Schema evolution (Iceberg model: schema lives in snapshot metadata; readers
# apply the METADATA schema, never merge data-file footers)
# --------------------------------------------------------------------------

def _part_df(spark, lo, hi, part, extra=None, drop=None):
    df = spark.range(lo, hi).select(
        F.col("id").alias("a"),
        (F.col("id") * 2).alias("b"),
        F.lit(str(part)).alias(CP.PART_COL),
    )
    if extra:
        for name, col in extra.items():
            df = df.withColumn(name, col)
    if drop:
        df = df.drop(drop)
    return df


def test_schema_evolution_add_column(spark, tmp_path):
    base = str(tmp_path / "out")
    TF.write_multi_sink({"t": _part_df(spark, 0, 10, 0)}, base)
    # v2 adds column c (new partition — appends never rewrite committed parts)
    TF.write_multi_sink(
        {"t": _part_df(spark, 10, 20, 1, extra={"c": F.lit("x")})}, base
    )
    got = TF.read_table(spark, base, "t")
    assert set(got.columns) == {"a", "b", "c", CP.PART_COL}
    rows = {r["a"]: r["c"] for r in got.collect()}
    assert len(rows) == 20
    assert all(rows[a] is None for a in range(10))      # pre-evolution files → NULL
    assert all(rows[a] == "x" for a in range(10, 20))


def test_schema_evolution_drop_column(spark, tmp_path):
    base = str(tmp_path / "out")
    TF.write_multi_sink({"t": _part_df(spark, 0, 10, 0)}, base)
    TF.write_multi_sink({"t": _part_df(spark, 10, 20, 1, drop="b")}, base)
    got = TF.read_table(spark, base, "t")
    assert set(got.columns) == {"a", CP.PART_COL}       # b invisible everywhere
    assert got.count() == 20


def test_schema_evolution_type_change_refused(spark, tmp_path):
    base = str(tmp_path / "out")
    TF.write_multi_sink({"t": _part_df(spark, 0, 10, 0)}, base)
    bad = _part_df(spark, 10, 20, 1).withColumn("b", F.col("b").cast("string"))
    with pytest.raises(TF.SchemaEvolutionError, match="b: 'long' → 'string'"):
        TF.write_multi_sink({"t": bad}, base)
    assert TF.CommitLog(base).current_version() == 1    # refused before any commit


def test_schema_evolution_time_travel_reads_old_schema(spark, tmp_path):
    base = str(tmp_path / "out")
    TF.write_multi_sink({"t": _part_df(spark, 0, 10, 0)}, base)
    TF.write_multi_sink(
        {"t": _part_df(spark, 10, 20, 1, extra={"c": F.lit("x")})}, base
    )
    v1 = TF.read_table(spark, base, "t", version=1)
    assert set(v1.columns) == {"a", "b", CP.PART_COL}   # v1 schema, no c
    assert v1.count() == 10


def test_schema_evolution_survives_expire_snapshots(spark, tmp_path):
    base = str(tmp_path / "out")
    TF.write_multi_sink(
        {"t": _part_df(spark, 0, 10, 0, extra={"c": F.lit("x")})}, base
    )
    TF.expire_snapshots(base)
    got = TF.read_table(spark, base, "t")
    assert set(got.columns) == {"a", "b", "c", CP.PART_COL}


def test_schema_evolution_row_ops_see_evolved_view(spark, tmp_path):
    """delete_where on a column ADDED after the first files were written:
    pre-evolution rows read c as NULL (survive a c='x' delete, per SQL
    NULL semantics), post-evolution matches are rewritten out."""
    base = str(tmp_path / "out")
    TF.write_multi_sink({"t": _part_df(spark, 0, 10, 0)}, base)
    TF.write_multi_sink(
        {"t": _part_df(spark, 10, 20, 1, extra={"c": F.lit("x")})}, base
    )
    res = TF.delete_where(spark, base, "t", "c = 'x'")
    assert res["deleted"] == 10
    got = TF.read_table(spark, base, "t")
    assert got.count() == 10
    assert {r["a"] for r in got.collect()} == set(range(10))


def test_commit_conflict_is_atomic_no_clobber(tmp_path):
    """Two committers racing to the same version: exactly one wins, the
    loser raises CommitConflict, and the winner's bytes are NOT replaced
    (os.rename would silently clobber; the os.link claim cannot)."""
    a = TF.CommitLog(str(tmp_path))
    b = TF.CommitLog(str(tmp_path))
    # both observe version 0 → both will try to publish v1
    assert a.current_version() == b.current_version() == 0
    assert a.commit({"sinks": {"winner": {}}}) == 1

    orig_cv = TF.CommitLog.current_version
    TF.CommitLog.current_version = lambda self: 0  # b still believes v0
    try:
        with pytest.raises(TF.CommitConflict):
            b.commit({"sinks": {"loser": {}}})
    finally:
        TF.CommitLog.current_version = orig_cv
    assert "winner" in a.snapshots()[0]["sinks"]  # winner's bytes intact


# --------------------------------------------------------------------------
# CDC upsert chaos schedules (crash windows inside upsert_keys)
# --------------------------------------------------------------------------


@given(
    st.lists(
        st.sampled_from(["pre", "mid", "post", "none"]), min_size=1, max_size=4
    )
)
@settings(
    max_examples=int(os.environ.get("CHAOS_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
def test_cdc_upsert_chaos_schedules(spark, tmp_path_factory, schedule):
    """Crash schedules against upsert_keys' three protocol windows —
    'pre' (before the tombstones are even staged), 'mid' (tombstones moved
    dark into _deletes, data not yet staged), 'post' (tombstones + data all
    staged dark, snapshot commit not reached) — each followed by a same-
    run_id replay.  Invariants: a crashed attempt is INVISIBLE (readers see
    the last committed generation, no partial delete-without-insert state);
    the replay applies the batch exactly once; the final table holds
    exactly the last generation per key with zero duplicates, before and
    after vacuum."""
    base = str(tmp_path_factory.mktemp("cdc_chaos"))
    docs = CP.with_part_key(
        synth.documents(spark, 40), n_parts=2, key_cols=["url"]
    ).drop("html")
    TF.write_multi_sink({"t": docs}, base)
    keys = [r["url"] for r in docs.orderBy("url").limit(10).select("url").collect()]
    batch0 = (
        TF.read_table(spark, base, "t")
        .where(F.col("url").isin(keys))
        .localCheckpoint()
    )
    n_total = 40

    def snapshot_state():
        t = TF.read_table(spark, base, "t")
        return (t.count(), t.select("url").distinct().count())

    real_stage = TF._stage_and_move
    real_commit = TF.CommitLog.commit
    gen = 0
    for window in schedule:
        gen += 1
        batch = batch0.withColumn("text", F.lit(f"GEN-{gen}"))
        run_id = f"chaos-{gen}"
        before = snapshot_state()
        if window != "none":
            if window == "pre":
                def boom_pin(*a, **k):
                    raise _InjectedCrash("pre")
                TF_pin, TF.pin_files = TF.pin_files, boom_pin
            elif window == "mid":
                def boom_stage(*a, **k):
                    raise _InjectedCrash("mid")
                TF._stage_and_move = boom_stage
            else:  # post: data + tombstones staged, commit dies
                def boom_commit(self, meta):
                    if meta.get("operation") == "cdc_upsert":
                        raise _InjectedCrash("post")
                    return real_commit(self, meta)
                TF.CommitLog.commit = boom_commit
            try:
                with pytest.raises(_InjectedCrash):
                    TF.upsert_keys(spark, base, "t", batch, ["url"], run_id=run_id)
            finally:
                if window == "pre":
                    TF.pin_files = TF_pin
                TF._stage_and_move = real_stage
                TF.CommitLog.commit = real_commit
            # crashed attempt is invisible: counts AND key-uniqueness hold,
            # and no key shows this generation yet
            assert snapshot_state() == before
            t = TF.read_table(spark, base, "t")
            assert t.where(F.col("text") == f"GEN-{gen}").count() == 0
        # replay (same run_id) must converge to exactly-once
        TF.upsert_keys(spark, base, "t", batch, ["url"], run_id=run_id)
        t = TF.read_table(spark, base, "t")
        assert t.count() == n_total
        assert t.select("url").distinct().count() == n_total
        assert t.where(F.col("text") == f"GEN-{gen}").count() == len(keys)

    # a duplicate replay of the last batch is a recognized no-op
    if gen:
        assert TF.upsert_keys(
            spark, base, "t",
            batch0.withColumn("text", F.lit(f"GEN-{gen}")),
            ["url"], run_id=f"chaos-{gen}",
        ) == {"skipped": True}
    TF.vacuum_table(base, "t", staging_grace_s=0)
    t = TF.read_table(spark, base, "t")
    assert t.count() == n_total
    if gen:
        assert t.where(F.col("text") == f"GEN-{gen}").count() == len(keys)
