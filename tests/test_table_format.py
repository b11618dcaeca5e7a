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


# --------------------------------------------------------------------------
# Z-order rewrite (multi-column cluster_by) + multi-range prune
# --------------------------------------------------------------------------


def _dims_table(spark, n=8_000):
    """Two independent uniform dims + a string dim (hash-derived: no
    accidental correlation with row order, so unclustered files span
    everything)."""
    return spark.range(n).select(
        F.col("id"),
        (F.xxhash64(F.col("id"), F.lit("x")) % 1000).alias("x"),
        (F.xxhash64(F.col("id"), F.lit("y")) % 1000).alias("y"),
        F.concat(
            F.lit("u"),
            (F.xxhash64(F.col("id"), F.lit("s")) % 100_000).cast("string"),
        ).alias("s"),
    )


def _n_files(spark, base, **kw):
    return len(TF.read_table(spark, base, "t", **kw).inputFiles())


def test_zorder_rewrite_prunes_every_clustered_dimension(spark, tmp_path):
    """compact_table(cluster_by=[x, y]) vs cluster_by='x': the Z layout
    skips files on BOTH dimensions and compounds on the 2-D window; the
    linear sort serves only its own column.  Rows are preserved exactly and
    pruned reads stay a superset (pruning never changes query results)."""
    dims = _dims_table(spark)
    keyed = CP.with_part_key(dims, n_parts=1, key_cols=["id"]).repartition(32)
    win = [("x", 0, 100), ("y", 0, 100)]  # 10% x 10% window

    zbase = str(tmp_path / "z")
    TF.write_multi_sink({"t": keyed}, zbase)
    TF.collect_file_stats(spark, zbase, "t", ["x", "y"])
    assert _n_files(spark, zbase, prune=win) == 32  # random layout: no skip
    TF.compact_table(spark, zbase, "t", max_files=2, target_files=32,
                     cluster_by=["x", "y"])
    TF.collect_file_stats(spark, zbase, "t", ["x", "y"])
    z_x = _n_files(spark, zbase, prune=("x", 0, 100))
    z_y = _n_files(spark, zbase, prune=("y", 0, 100))
    z_xy = _n_files(spark, zbase, prune=win)
    assert z_x <= 16 and z_y <= 16       # both dims skip
    assert z_xy <= min(z_x, z_y)         # the window compounds
    # rows byte-identical through the rewrite
    got = TF.read_table(spark, zbase, "t").orderBy("id")
    assert [r["id"] for r in got.select("id").collect()] == list(range(8_000))
    # superset guarantee: pruned + filter == full + filter
    f = (F.col("x").between(0, 100)) & (F.col("y").between(0, 100))
    full = TF.read_table(spark, zbase, "t").filter(f).count()
    pruned = TF.read_table(spark, zbase, "t", prune=win).filter(f).count()
    assert pruned == full

    lbase = str(tmp_path / "lin")
    TF.write_multi_sink({"t": keyed}, lbase)
    TF.compact_table(spark, lbase, "t", max_files=2, target_files=32,
                     cluster_by="x")
    TF.collect_file_stats(spark, lbase, "t", ["x", "y"])
    lin_x = _n_files(spark, lbase, prune=("x", 0, 100))
    lin_y = _n_files(spark, lbase, prune=("y", 0, 100))
    assert lin_x <= 8          # its own column: tightly clustered
    assert lin_y >= 28         # the other column: almost nothing skips
    assert z_y < lin_y         # what Z-order buys over the linear sort


def test_zorder_string_dimension_prunes(spark, tmp_path):
    """The string order proxy (7-byte prefix integer) clusters and skips on
    a string column; mixed string+numeric interleave works."""
    dims = _dims_table(spark, 4_000)
    keyed = CP.with_part_key(dims, n_parts=1, key_cols=["id"]).repartition(16)
    base = str(tmp_path / "zs")
    TF.write_multi_sink({"t": keyed}, base)
    TF.compact_table(spark, base, "t", max_files=2, target_files=16,
                     cluster_by=["s", "x"])
    TF.collect_file_stats(spark, base, "t", ["s", "x"])
    n_s = _n_files(spark, base, prune=("s", "u1", "u2"))
    n_x = _n_files(spark, base, prune=("x", 0, 100))
    assert n_s <= 8 and n_x <= 8
    # superset guarantee on the string window
    f = F.col("s").between("u1", "u2")
    assert (
        TF.read_table(spark, base, "t", prune=("s", "u1", "u2")).filter(f).count()
        == TF.read_table(spark, base, "t").filter(f).count()
    )


def test_order_proxy_is_monotone_on_strings(spark):
    """proxy(a) <= proxy(b) whenever a <= b — the property that makes
    string min/max pruning against the Z layout sound (non-strict: distinct
    strings sharing a 7-byte prefix may collapse, which only weakens
    clustering, never correctness)."""
    vals = ["", "a", "A", "u1", "u10", "u2", "u99999", "zz", "~", "éclair",
            "abcdefg", "abcdefgh", "abcdefh"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    rows = df.select(
        "v", TF._order_proxy(df, "v").alias("p")
    ).collect()
    by_str = sorted(rows, key=lambda r: r["v"].encode("utf-8"))
    proxies = [r["p"] for r in by_str]
    assert proxies == sorted(proxies)


def test_zorder_bits_budget_refused(spark):
    df = spark.range(10).select(*[F.col("id").alias(f"c{i}") for i in range(9)])
    with pytest.raises(ValueError, match="63 bits"):
        TF.zorder_column(df, [f"c{i}" for i in range(9)], bits=8)


# --------------------------------------------------------------------------
# Hidden partitioning (Iceberg partition-spec transforms)
# --------------------------------------------------------------------------


def _part_dirs(df):
    """Distinct partition directories behind a DataFrame's scan."""
    return {os.path.dirname(p) for p in df.inputFiles()}


def _spread_days(docs, n=4):
    """synth timestamps span <1 day; spread them over n days so day()
    partitioning has something to partition."""
    return docs.withColumn(
        "warc_ts",
        F.expr(f"timestampadd(DAY, pmod(xxhash64(url), {n}), warc_ts)"),
    )


def test_hidden_partitioning_roundtrip_and_time_prune(spark, tmp_path):
    """day(warc_ts) x truncate(lang,1): rows come back exactly, a one-day
    time window scans only that day's partitions, and the superset guarantee
    holds (pruned + filter == full + filter).  The caller never names the
    partition key — predicates are on the DATA columns."""
    import datetime as dt

    docs = _spread_days(synth.documents(spark, 600).drop("html"))
    base = str(tmp_path / "t")
    TF.write_multi_sink(
        {"pages": docs}, base, spec=[("day", "warc_ts"), ("truncate", "lang", 1)]
    )

    full = TF.read_table(spark, base, "pages")
    assert full.count() == 600
    assert sorted(r["url"] for r in full.select("url").collect()) == sorted(
        r["url"] for r in docs.select("url").collect()
    )

    day = full.select(F.date_trunc("day", "warc_ts").alias("d")).orderBy("d").first()["d"]
    lo, hi = day, day + dt.timedelta(hours=23, minutes=59, seconds=59)
    pruned = TF.read_table(spark, base, "pages", prune=("warc_ts", lo, hi))
    all_dirs, hit_dirs = _part_dirs(full), _part_dirs(pruned)
    assert hit_dirs < all_dirs  # strictly fewer partitions scanned
    for d in hit_dirs:  # every surviving dir is that day's
        assert os.path.basename(d).split("~")[0] == f"{TF.PART_COL}={day:%Y-%m-%d}"
    flt = F.col("warc_ts").between(lo, hi)
    assert pruned.filter(flt).count() == full.filter(flt).count() > 0


def test_hidden_partition_bucket_eq_prune(spark, tmp_path):
    """bucket(url, 8): a point lookup scans ONE bucket's partitions and
    still returns every row for that url."""
    docs = synth.documents(spark, 400).drop("html")
    base = str(tmp_path / "t")
    TF.write_multi_sink({"pages": docs}, base, spec=[("bucket", "url", 8)])
    url = docs.select("url").first()["url"]

    full = TF.read_table(spark, base, "pages")
    hit = TF.read_table(spark, base, "pages", prune_eq=("url", url))
    assert len(_part_dirs(hit)) == 1
    assert len(_part_dirs(full)) > 1
    assert (
        hit.filter(F.col("url") == url).count()
        == full.filter(F.col("url") == url).count()
        > 0
    )


def test_hidden_partition_null_keys_prune_but_survive(spark, tmp_path):
    """NULL transform inputs land in a 'null' token partition: any predicate
    on that column prunes it (SQL NULL never matches), while a full read
    still returns the rows."""
    docs = synth.documents(spark, 300).drop("html")
    docs = docs.withColumn(
        "lang", F.when(F.xxhash64("url") % 5 == 0, F.lit(None)).otherwise(F.col("lang"))
    )
    n_null = docs.filter(F.col("lang").isNull()).count()
    assert n_null > 0
    base = str(tmp_path / "t")
    TF.write_multi_sink({"pages": docs}, base, spec=[("truncate", "lang", 1)])

    full = TF.read_table(spark, base, "pages")
    assert full.filter(F.col("lang").isNull()).count() == n_null
    hit = TF.read_table(spark, base, "pages", prune=("lang", "a", "zz"))
    null_dirs = {d for d in _part_dirs(full) if d.endswith("=null")}
    assert null_dirs and not (null_dirs & _part_dirs(hit))


def test_hidden_partition_spec_is_immutable(spark, tmp_path):
    docs = synth.documents(spark, 50).drop("html")
    base = str(tmp_path / "t")
    TF.write_multi_sink({"pages": docs}, base, spec=[("day", "warc_ts")])
    with pytest.raises(ValueError, match="spec change refused"):
        TF.write_multi_sink({"pages": docs}, base, spec=[("bucket", "url", 4)])
    # an unkeyed sink cannot be silently switched to hidden partitioning
    lineage = CP.with_part_key(docs, n_parts=2, key_cols=["url"])
    base2 = str(tmp_path / "t2")
    TF.write_multi_sink({"pages": lineage}, base2)
    with pytest.raises(ValueError, match="committed partitions without a spec"):
        TF.write_multi_sink({"pages": docs}, base2, spec=[("day", "warc_ts")])


def test_hidden_partition_resume_skips_committed(spark, tmp_path):
    """The derived key is deterministic from data, so the resume filter
    (committed partitions skipped on rerun) works unchanged."""
    docs = _spread_days(synth.documents(spark, 200).drop("html"))
    base = str(tmp_path / "t")
    spec = [("day", "warc_ts")]
    w1 = TF.write_multi_sink({"pages": docs}, base, spec=spec)
    assert sum(w1["pages"].values()) == 200
    w2 = TF.write_multi_sink({"pages": docs}, base, spec=spec)
    assert w2["pages"] == {}  # nothing re-written
    assert TF.read_table(spark, base, "pages").count() == 200


def test_hidden_partition_spec_survives_expire(spark, tmp_path):
    """expire_snapshots folds specs into the checkpoint snapshot — pruning
    still works after history is dropped."""
    docs = synth.documents(spark, 300).drop("html")
    base = str(tmp_path / "t")
    TF.write_multi_sink({"pages": docs}, base, spec=[("bucket", "url", 8)])
    TF.expire_snapshots(base)
    url = docs.select("url").first()["url"]
    hit = TF.read_table(spark, base, "pages", prune_eq=("url", url))
    assert len(_part_dirs(hit)) == 1
    assert hit.filter(F.col("url") == url).count() > 0


def test_hidden_partition_composes_with_file_stats(spark, tmp_path):
    """Iceberg's two-level skip: the spec prunes PARTITIONS from the time
    predicate, per-file min/max stats then prune FILES within survivors."""
    import datetime as dt

    docs = _spread_days(synth.documents(spark, 800).drop("html")).withColumn(
        "size", F.length("text")
    )
    base = str(tmp_path / "t")
    TF.write_multi_sink({"pages": docs}, base, spec=[("day", "warc_ts")])
    TF.pin_files(base, "pages")
    # max_files=0: force the sort-order rewrite even though the distributed
    # spec write already leaves one file per partition — the POINT here is
    # the size clustering, not the small-file merge.
    TF.compact_table(spark, base, "pages", max_files=0, target_files=4,
                     cluster_by="size")
    TF.collect_file_stats(spark, base, "pages", ["size"])

    full = TF.read_table(spark, base, "pages")
    day = full.select(F.date_trunc("day", "warc_ts").alias("d")).orderBy("d").first()["d"]
    q25 = docs.approxQuantile("size", [0.25], 0.01)[0]
    win = [("warc_ts", day, day + dt.timedelta(hours=23)), ("size", 0, q25)]
    both = TF.read_table(spark, base, "pages", prune=win)
    assert len(_part_dirs(both)) < len(_part_dirs(full))       # partition level
    time_only = TF.read_table(
        spark, base, "pages", prune=("warc_ts", day, day + dt.timedelta(hours=23))
    )
    assert len(both.inputFiles()) < len(time_only.inputFiles())  # file level
    flt = F.col("warc_ts").between(win[0][1], win[0][2]) & F.col("size").between(0, q25)
    assert both.filter(flt).count() == full.filter(flt).count()


def test_hidden_partition_delete_where_prunes(spark, tmp_path):
    """Row-level DELETE on a spec-partitioned table rewrites only the
    partitions the predicate can touch."""
    import datetime as dt

    docs = _spread_days(synth.documents(spark, 400).drop("html"))
    base = str(tmp_path / "t")
    TF.write_multi_sink({"pages": docs}, base, spec=[("day", "warc_ts")])
    full = TF.read_table(spark, base, "pages")
    day = full.select(F.date_trunc("day", "warc_ts").alias("d")).orderBy("d").first()["d"]
    n_day = full.filter(F.date_trunc("day", "warc_ts") == day).count()
    out = TF.delete_where(
        spark, base, "pages",
        F.col("warc_ts").between(day, day + dt.timedelta(hours=23, minutes=59, seconds=59)),
        prune=("warc_ts", day, day + dt.timedelta(hours=23, minutes=59, seconds=59)),
    )
    assert out["deleted"] == n_day > 0
    assert out["files_scanned"] < out["files_total"]
    assert TF.read_table(spark, base, "pages").count() == 400 - n_day


def test_hidden_partition_unicode_identity_roundtrip(spark, tmp_path):
    """identity(string) hex-encodes arbitrary UTF-8 (including characters
    Spark's path escaping would mangle) and equality-prunes exactly."""
    rows = [("café/№1=?", 1), ("plain", 2), ("", 3), ("café/№1=?", 4)]
    df = spark.createDataFrame(rows, "k string, v int")
    base = str(tmp_path / "t")
    TF.write_multi_sink({"t": df}, base, spec=[("identity", "k")])
    full = TF.read_table(spark, base, "t")
    assert sorted((r["k"], r["v"]) for r in full.collect()) == sorted(rows)
    hit = TF.read_table(spark, base, "t", prune_eq=("k", "café/№1=?"))
    assert len(_part_dirs(hit)) == 1
    assert hit.filter(F.col("k") == "café/№1=?").count() == 2


# --------------------------------------------------------------------------
# Partition-spec evolution (Iceberg spec evolution)
# --------------------------------------------------------------------------


def test_spec_evolution_mixed_generations(spark, tmp_path):
    """day -> day x bucket: old partitions keep the old layout, new writes
    use the new one (g1~ prefix), a time-window prune hits BOTH generations
    correctly, and an equality prune on the bucketed column prunes gen-1
    only (gen-0 day partitions are all kept — sound, never wrong)."""
    rows = spark.range(400).select(
        F.concat(F.lit("u"), (F.col("id") % 7).cast("string")).alias("url"),
        F.expr(
            "timestampadd(HOUR, cast(id % 72 as int), timestamp'2026-01-01 00:00:00')"
        ).alias("ts"),
        F.col("id").alias("v"),
    )
    base = str(tmp_path / "t")
    TF.write_multi_sink({"t": rows.filter("v < 200")}, base, spec=[("day", "ts")])
    TF.evolve_spec(base, "t", [("day", "ts"), ("bucket", "url", 4)])
    TF.write_multi_sink(
        {"t": rows.filter("v >= 200")}, base,
        spec=[("day", "ts"), ("bucket", "url", 4)],
    )

    full = TF.read_table(spark, base, "t")
    assert full.count() == 400
    keys = {os.path.basename(d).split("=", 1)[1] for d in _part_dirs(full)}
    assert any(k.startswith("g1~") for k in keys)
    assert any(not k.startswith("g1~") for k in keys)

    lo, hi = "2026-01-02 00:00:00", "2026-01-02 23:59:59"
    pruned = TF.read_table(spark, base, "t", prune=("ts", lo, hi))
    pk = {os.path.basename(d).split("=", 1)[1] for d in _part_dirs(pruned)}
    assert all("2026-01-02" in k for k in pk)  # both gens, only that day
    assert any(k.startswith("g1~") for k in pk) and any(not k.startswith("g1~") for k in pk)
    flt = F.col("ts").between(lo, hi)
    assert pruned.filter(flt).count() == full.filter(flt).count() > 0

    eq = TF.read_table(spark, base, "t", prune_eq=("url", "u3"))
    ek = {os.path.basename(d).split("=", 1)[1] for d in _part_dirs(eq)}
    g0 = {k for k in ek if not k.startswith("g1~")}
    g1 = {k for k in ek if k.startswith("g1~")}
    assert len(g0) == 3  # every gen-0 day survives: day spec can't prune url
    assert len({k.rsplit("~", 1)[1] for k in g1}) == 1  # exactly one bucket
    assert (
        eq.filter(F.col("url") == "u3").count()
        == full.filter(F.col("url") == "u3").count()
        > 0
    )


def test_spec_evolution_from_flat(spark, tmp_path):
    """A flat (lineage-keyed) sink evolves onto its first spec: old
    partitions are never pruned (gen 0 has no spec), new writes are."""
    docs = _spread_days(synth.documents(spark, 300).drop("html"))
    base = str(tmp_path / "t")
    half = F.pmod(F.xxhash64("url", F.lit(9)), F.lit(2)) == 0
    keyed = CP.with_part_key(docs.filter(half), n_parts=4, key_cols=["url"])
    TF.write_multi_sink({"pages": keyed}, base)
    TF.evolve_spec(base, "pages", [("day", "warc_ts")])
    TF.write_multi_sink(
        {"pages": docs.filter(~half)}, base, spec=[("day", "warc_ts")]
    )
    full = TF.read_table(spark, base, "pages")
    assert full.count() == 300
    day = full.select(F.date_trunc("day", "warc_ts").alias("d")).orderBy("d").first()["d"]
    import datetime as dt

    lo, hi = day, day + dt.timedelta(hours=23, minutes=59, seconds=59)
    pruned = TF.read_table(spark, base, "pages", prune=("warc_ts", lo, hi))
    pk = {os.path.basename(d).split("=", 1)[1] for d in _part_dirs(pruned)}
    flat_keys = {k for k in pk if not k.startswith("g1~")}
    spec_keys = {k for k in pk if k.startswith("g1~")}
    assert len(flat_keys) == 4  # every flat partition kept — never pruned
    assert len(spec_keys) == 1  # exactly the queried day
    flt = F.col("warc_ts").between(lo, hi)
    assert pruned.filter(flt).count() == full.filter(flt).count() > 0


def test_spec_evolution_refusals(spark, tmp_path):
    rows = spark.createDataFrame([("a", 1)], "k string, v int")
    base = str(tmp_path / "t")
    TF.write_multi_sink({"t": rows}, base, spec=[("identity", "k")])
    # stale-generation write
    TF.evolve_spec(base, "t", [("truncate", "k", 1)])
    with pytest.raises(ValueError, match="evolve_spec"):
        TF.write_multi_sink(
            {"t": spark.createDataFrame([("b", 2)], "k string, v int")},
            base, spec=[("identity", "k")],
        )
    # no-op evolve
    with pytest.raises(ValueError, match="already in force"):
        TF.evolve_spec(base, "t", [("truncate", "k", 1)])
    # unknown column (schema is recorded)
    with pytest.raises(ValueError, match="not in the recorded schema"):
        TF.evolve_spec(base, "t", [("identity", "nope")])
    # flat sink still can't be switched implicitly (without evolve_spec)
    base2 = str(tmp_path / "t2")
    TF.write_multi_sink({"t": CP.with_part_key(rows, n_parts=2, key_cols=["k"])}, base2)
    with pytest.raises(ValueError, match="evolve_spec"):
        TF.write_multi_sink({"t": rows}, base2, spec=[("identity", "k")])


def test_spec_evolution_survives_expire_and_rollback(spark, tmp_path):
    """The spec HISTORY (not just the current spec) survives
    expire_snapshots, and rollback to a pre-evolution version restores the
    old current spec — a write under it succeeds again."""
    rows = spark.range(100).select(
        F.expr(
            "timestampadd(HOUR, cast(id % 48 as int), timestamp'2026-01-01 00:00:00')"
        ).alias("ts"),
        F.col("id").alias("v"),
    )
    base = str(tmp_path / "t")
    TF.write_multi_sink({"t": rows.filter("v < 50")}, base, spec=[("day", "ts")])
    pre_evolve = TF.CommitLog(base).current_version()
    TF.evolve_spec(base, "t", [("hour", "ts")])
    TF.write_multi_sink({"t": rows.filter("v >= 50")}, base, spec=[("hour", "ts")])

    TF.expire_snapshots(base)
    hist = TF.CommitLog(base).spec_history()["t"]
    assert len(hist) == 2 and hist[0][0]["transform"] == "day"
    lo, hi = "2026-01-01 05:00:00", "2026-01-01 05:59:59"
    pruned = TF.read_table(spark, base, "t", prune=("ts", lo, hi))
    pk = {os.path.basename(d).split("=", 1)[1] for d in _part_dirs(pruned)}
    # gen-0 day partition for Jan 1 kept; gen-1 pruned to the single hour
    assert pk == {"2026-01-01", "g1~2026-01-01-05"}
    flt = F.col("ts").between(lo, hi)
    assert pruned.filter(flt).count() == TF.read_table(spark, base, "t").filter(flt).count() > 0

    base2 = str(tmp_path / "t2")
    TF.write_multi_sink({"t": rows.filter("v < 50")}, base2, spec=[("day", "ts")])
    v0 = TF.CommitLog(base2).current_version()
    TF.evolve_spec(base2, "t", [("hour", "ts")])
    TF.rollback_table(base2, v0)
    # current spec is day again: a day-spec write is accepted (fresh day
    # partitions — write_multi_sink's resume filter skips committed keys)
    later = rows.filter("v >= 50").withColumn(
        "ts", F.expr("timestampadd(DAY, 10, ts)")
    )
    TF.write_multi_sink({"t": later}, base2, spec=[("day", "ts")])
    assert TF.read_table(spark, base2, "t").count() == 100
    with pytest.raises(ValueError, match="evolve_spec"):
        TF.write_multi_sink({"t": later}, base2, spec=[("hour", "ts")])


# --------------------------------------------------------------------------
# Metadata inspection tables (Iceberg t.snapshots / t.partitions / t.files)
# --------------------------------------------------------------------------


def test_inspect_table_kinds(spark, tmp_path):
    rows = spark.range(200).select(
        F.concat(F.lit("u"), (F.col("id") % 5).cast("string")).alias("url"),
        F.expr(
            "timestampadd(HOUR, cast(id % 48 as int), timestamp'2026-01-01 00:00:00')"
        ).alias("ts"),
        F.col("id").alias("v"),
    )
    base = str(tmp_path / "t")
    TF.write_multi_sink({"t": rows.filter("v<100")}, base, spec=[("day", "ts")], run_id="r1")
    TF.evolve_spec(base, "t", [("hour", "ts")])
    TF.write_multi_sink({"t": rows.filter("v>=100")}, base, spec=[("hour", "ts")], run_id="r2")
    TF.pin_files(base, "t")
    TF.collect_file_stats(spark, base, "t", ["ts", "v"])
    TF.collect_file_blooms(spark, base, "t", "url")

    snaps = {r["version"]: r for r in TF.inspect_table(spark, base, kind="snapshots").collect()}
    assert snaps[1]["operation"] == "append" and snaps[1]["run_id"] == "r1"
    assert snaps[2]["operation"] == "evolve_spec"
    assert all(r["committed_at"] is not None for r in snaps.values())
    assert list(snaps) == sorted(snaps)

    parts = TF.inspect_table(spark, base, "t", kind="partitions").collect()
    man = TF.CommitLog(base).manifest()["t"]
    assert {r["part_key"] for r in parts} == set(man)
    assert sum(r["rows"] for r in parts) == 200
    assert {r["spec_gen"] for r in parts} == {0, 1}
    assert all(r["file_mode"] and r["files_with_stats"] == r["n_files"] for r in parts)

    files = TF.inspect_table(spark, base, "t", kind="files").collect()
    assert len(files) == sum(len(i["files"]) for i in man.values())
    assert all(r["add_version"] is not None and r["has_bloom"] for r in files)
    import json as _json

    st = _json.loads(files[0]["stats"])
    assert {"ts", "v", "_rowcount"} <= set(st) and len(st["v"]) == 2

    specs = TF.inspect_table(spark, base, "t", kind="specs").collect()
    assert [r["generation"] for r in specs] == [0, 1]
    assert [r["is_current"] for r in specs] == [False, True]

    with pytest.raises(ValueError, match="needs a sink"):
        TF.inspect_table(spark, base, kind="partitions")
    with pytest.raises(ValueError, match="unknown inspect_table kind"):
        TF.inspect_table(spark, base, "t", kind="nope")


# --------------------------------------------------------------------------
# Incremental / changelog reads (Iceberg incremental append scan analog)
# --------------------------------------------------------------------------


def _kv(spark, lo, hi, mult=1):
    return spark.range(lo, hi).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("url"),
        (F.col("id") * mult).alias("v"),
    )


def test_changelog_append_and_cdc_window(spark, tmp_path):
    """(v1, v2] over an append + cdc_upsert history returns exactly the
    delta, and replaying the changelog over the base state reproduces the
    current table (upsert semantics)."""
    base = str(tmp_path / "t")
    TF.write_multi_sink(
        {"t": CP.with_part_key(_kv(spark, 0, 100), n_parts=2, key_cols=["url"])},
        base, run_id="a",
    )
    v1 = TF.CommitLog(base).current_version()
    batch = CP.with_part_key(_kv(spark, 90, 150, mult=1000), n_parts=2, key_cols=["url"])
    TF.upsert_keys(spark, base, "t", batch, ["url"], run_id="b1")
    v2 = TF.CommitLog(base).current_version()

    ch = TF.read_table_changes(spark, base, "t", v1)
    ins = ch.filter("_change_type='insert'")
    dels = ch.filter("_change_type='delete'")
    assert ins.count() == 60 and dels.count() == 60
    assert dels.filter(F.col("v").isNotNull()).count() == 0  # blind deletes

    # replay: base state minus deleted keys plus inserts == current table
    base_state = TF.read_table_changes(spark, base, "t", 0, to_version=v1)
    replayed = (
        base_state.select("url", "v")
        .join(dels.select("url"), "url", "left_anti")
        .unionByName(ins.select("url", "v"))
    )
    tbl = TF.read_table(spark, base, "t").select("url", "v")
    assert sorted(map(tuple, replayed.collect())) == sorted(map(tuple, tbl.collect()))

    # empty window
    assert TF.read_table_changes(spark, base, "t", v2, to_version=v2).count() == 0


def test_changelog_survives_compaction_and_materialize(spark, tmp_path):
    """Compaction + materialize_deletes inside the window are logical
    no-ops: the changelog still reads the ORIGINAL bytes of each version
    (pins record the append's files; added files persist until vacuum)."""
    base = str(tmp_path / "t")
    TF.write_multi_sink(
        {"t": CP.with_part_key(_kv(spark, 0, 100), n_parts=2, key_cols=["url"])}, base
    )
    v1 = TF.CommitLog(base).current_version()
    batch = CP.with_part_key(_kv(spark, 90, 150, mult=7), n_parts=2, key_cols=["url"])
    TF.upsert_keys(spark, base, "t", batch, ["url"], run_id="b")
    v2 = TF.CommitLog(base).current_version()
    TF.materialize_deletes(spark, base, "t")
    TF.compact_table(spark, base, "t", max_files=0)

    assert (
        TF.read_table_changes(spark, base, "t", v1, to_version=v2)
        .filter("_change_type='insert'").count() == 60
    )
    full = TF.read_table_changes(spark, base, "t", 0)
    assert full.filter("_change_type='insert'").count() == 160
    assert full.filter("_change_type='delete'").count() == 60

    # vacuum reclaims the rewritten-away originals → refusal, not silence
    TF.vacuum_table(base, "t", staging_grace_s=0)
    with pytest.raises(TF.IncrementalUnavailable, match="vacuumed"):
        TF.read_table_changes(spark, base, "t", v1, to_version=v2)


def test_changelog_refusals(spark, tmp_path):
    """COW delete, rollback, and expired history in the window refuse
    loudly; windows that avoid them still work."""
    base = str(tmp_path / "t")
    TF.write_multi_sink(
        {"t": CP.with_part_key(_kv(spark, 0, 50), n_parts=2, key_cols=["url"])}, base
    )
    v1 = TF.CommitLog(base).current_version()
    TF.delete_where(spark, base, "t", F.col("v") < 5)
    with pytest.raises(TF.IncrementalUnavailable, match="not derivable"):
        TF.read_table_changes(spark, base, "t", v1)
    assert TF.read_table_changes(spark, base, "t", 0, to_version=v1).count() == 50

    base3 = str(tmp_path / "t3")
    TF.write_multi_sink(
        {"t": CP.with_part_key(_kv(spark, 0, 50), n_parts=2, key_cols=["url"])}, base3
    )
    v31 = TF.CommitLog(base3).current_version()
    TF.write_multi_sink(
        {"t2": CP.with_part_key(
            _kv(spark, 50, 80).withColumn("url", F.concat(F.lit("x"), F.col("url"))),
            n_parts=2, key_cols=["url"],
        )}, base3
    )
    TF.rollback_table(base3, v31)
    with pytest.raises(TF.IncrementalUnavailable, match="rollback"):
        TF.read_table_changes(spark, base3, "t", v31)

    base2 = str(tmp_path / "t2")
    TF.write_multi_sink(
        {"t": CP.with_part_key(_kv(spark, 0, 50), n_parts=2, key_cols=["url"])}, base2
    )
    TF.write_multi_sink(
        {"t2": CP.with_part_key(
            _kv(spark, 50, 80).withColumn("url", F.concat(F.lit("x"), F.col("url"))),
            n_parts=2, key_cols=["url"],
        )}, base2
    )
    TF.expire_snapshots(base2)
    # expired history at the window START surfaces the documented refusal
    # type, never a bare ValueError — consumers catch ONE exception for
    # every non-derivable window
    with pytest.raises(TF.IncrementalUnavailable, match="expire"):
        TF.read_table_changes(spark, base2, "t", 1)

    with pytest.raises(ValueError, match="bad window"):
        TF.read_table_changes(spark, base, "t", 99)


def test_row_ops_derive_spec_partition_keys(spark, tmp_path):
    """upsert_keys / add_files / merge_upsert into a HIDDEN-PARTITIONED
    sink derive the partition key from the data under the CURRENT spec —
    caller-provided keys (right or wrong) are ignored, so spec pruning
    stays exact after CDC traffic, including across an evolution."""
    rows = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("url"),
        F.expr(
            "timestampadd(HOUR, cast(id % 24 as int), timestamp'2026-01-01 00:00:00')"
        ).alias("ts"),
        F.col("id").alias("v"),
    )
    base = str(tmp_path / "t")
    TF.write_multi_sink({"t": rows}, base, spec=[("hour", "ts")])

    # upsert WITHOUT any part column; one key moves to a different hour
    batch = spark.createDataFrame(
        [("k5", "2026-01-01 23:00:00", 5000), ("knew", "2026-01-01 22:30:00", 1)],
        "url string, ts string, v long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    TF.upsert_keys(spark, base, "t", batch, ["url"], run_id="c1")

    full = TF.read_table(spark, base, "t")
    assert full.count() == 101
    # the moved row is found by pruning in its NEW hour, not its old one
    hit = TF.read_table(
        spark, base, "t", prune=("ts", "2026-01-01 23:00:00", "2026-01-01 23:59:59")
    )
    got = hit.filter(F.col("url") == "k5").collect()
    assert len(got) == 1 and got[0]["v"] == 5000
    data_dirs = {d for d in _part_dirs(hit) if "_deletes" not in d}
    assert len(data_dirs) == 1  # exactly the 23:00 partition scanned

    # a WRONG caller-provided part key is overridden, not trusted
    bad = batch.withColumn("v", F.lit(7).cast("long")).withColumn(TF.PART_COL, F.lit("g9~zzz"))
    TF.upsert_keys(spark, base, "t", bad, ["url"], run_id="c2")
    hit2 = TF.read_table(
        spark, base, "t", prune=("ts", "2026-01-01 23:00:00", "2026-01-01 23:59:59")
    )
    assert hit2.filter(F.col("url") == "k5").collect()[0]["v"] == 7
    keys = {
        os.path.basename(d).split("=", 1)[1]
        for d in _part_dirs(TF.read_table(spark, base, "t"))
        if "=" in os.path.basename(d)  # skip the _deletes tombstone dir
    }
    assert "g9~zzz" not in keys

    # after an evolution, CDC rows land under the NEW generation
    TF.evolve_spec(base, "t", [("day", "ts"), ("bucket", "url", 4)])
    TF.materialize_deletes(spark, base, "t")
    b2 = spark.createDataFrame(
        [("k5", "2026-01-02 01:00:00", 9)], "url string, ts string, v long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    TF.merge_upsert(spark, base, "t", b2, ["url"])
    keys = {
        os.path.basename(d).split("=", 1)[1]
        for d in _part_dirs(TF.read_table(spark, base, "t"))
        if "=" in os.path.basename(d)
    }
    assert any(k.startswith("g1~2026-01-02~") for k in keys)
    hit3 = TF.read_table(spark, base, "t", prune_eq=("url", "k5"))
    assert hit3.filter(F.col("url") == "k5").collect()[0]["v"] == 9
    assert TF.read_table(spark, base, "t").filter("url = 'k5'").count() == 1
