"""Streaming READ of the table shim (streaming/table_source.py — the Iceberg
Spark-streaming-source analog over the commit log): micro-batches must equal
the batch changelog for the same snapshot window, restarts must resume from
the engine checkpoint without duplicates, non-changelog-able snapshots must
fail the stream (or be skipped whole when opted in), and admission control
must bound how many snapshots one batch drains."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from vector_spark.plans import table_format as TF
from vector_spark.streaming.table_source import (
    TableChangesDataSource,
    _TableChangesStreamReader,
)

ROW_COLS = ["url", "warc_ts", "html", "text", "lang"]


def _docs(spark, lo, hi, tag, text=None):
    df = spark.range(lo, hi).select(
        F.concat(F.lit("https://ex.com/"), F.col("id")).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.col("id"))
        ).alias("warc_ts"),
        F.encode(F.concat(F.lit("<p>"), F.col("id"), F.lit("</p>")), "utf-8").alias(
            "html"
        ),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    if text is not None:
        df = df.withColumn("text", F.lit(text))
    # fresh part keys per batch: shim appends are new-partition writes
    # (same-key redo is the RESUME path; mutations go through row ops)
    return df.withColumn(
        "_part", F.concat(F.lit(tag + "-"), (F.crc32("url") % 2).cast("string"))
    )


def _register(spark):
    spark.dataSource.register(TableChangesDataSource)


def _open_stream(spark, base, ckpt, name, **opts):
    reader = (
        spark.readStream.format("table_changes")
        .option("base", base)
        .option("sink", "events")
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )


def _key(rows):
    return sorted(
        (r["url"], r["text"] or "", r["lang"] or "", r["_change_type"], r["_commit_version"])
        for r in rows
    )


def test_stream_equals_batch_changelog(spark, tmp_path):
    """The streamed rows for (0, current] are EXACTLY read_table_changes'
    rows — inserts per append version, delete+insert pairs for cdc_upsert."""
    _register(spark)
    base = str(tmp_path / "t")
    TF.write_multi_sink({"events": _docs(spark, 0, 80, "b1")}, base)
    q = _open_stream(spark, base, str(tmp_path / "ck"), "chg_eq")
    try:
        q.processAllAvailable()
        TF.write_multi_sink({"events": _docs(spark, 80, 120, "b2")}, base)
        TF.upsert_keys(
            spark, base, "events", _docs(spark, 0, 5, "b1", text="UPDATED"), ["url"]
        )
        q.processAllAvailable()
        got = spark.sql("select * from chg_eq").collect()
    finally:
        q.stop()
    want = TF.read_table_changes(spark, base, "events", 0).collect()
    assert _key(got) == _key(want)
    # the upsert batch carries both halves at ONE version, keys-only deletes
    ups = [r for r in got if r["_change_type"] == "delete"]
    assert len(ups) == 5 and all(r["text"] is None and r["url"] for r in ups)


def test_restart_resumes_without_duplicates(spark, tmp_path):
    """Kill the stream, commit more snapshots, restart on the same
    checkpoint: only the unseen window arrives (engine offset log + version
    offsets = exactly-once)."""
    _register(spark)
    base, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    out = str(tmp_path / "out")
    TF.write_multi_sink({"events": _docs(spark, 0, 60, "b1")}, base)

    def _run():
        # parquet sink (memory sink cannot recover from a checkpoint)
        q = (
            spark.readStream.format("table_changes")
            .option("base", base)
            .option("sink", "events")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _run()
    assert spark.read.parquet(out).count() == 60

    TF.write_multi_sink({"events": _docs(spark, 60, 90, "b2")}, base)
    _run()
    got = (
        spark.read.parquet(out)
        .groupBy("_commit_version")
        .count()
        .collect()
    )
    # exactly-once across the restart: v1 NOT re-delivered, v2 delivered once
    assert {(r["_commit_version"], r["count"]) for r in got} == {(1, 60), (2, 30)}


def test_cow_delete_fails_stream_unless_skipped(spark, tmp_path):
    """A copy-on-write DELETE has no key-addressable pre-image: the stream
    refuses (IncrementalUnavailable surface) rather than emit a wrong
    changelog; skip_unreadable=true skips that snapshot whole and keeps
    consuming later appends — Iceberg's streaming-skip-delete-snapshots."""
    _register(spark)
    base = str(tmp_path / "t")
    TF.write_multi_sink({"events": _docs(spark, 0, 40, "b1")}, base)
    TF.delete_where(spark, base, "events", F.col("lang") == "de")
    TF.write_multi_sink({"events": _docs(spark, 40, 50, "b2")}, base)

    q = _open_stream(spark, base, str(tmp_path / "ck1"), "chg_cow")
    with pytest.raises(Exception, match="pre-image|IncrementalUnavailable"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    q2 = _open_stream(
        spark, base, str(tmp_path / "ck2"), "chg_skip", skip_unreadable="true"
    )
    try:
        q2.processAllAvailable()
        got = spark.sql(
            "select _commit_version v, count(*) n from chg_skip group by 1"
        ).collect()
    finally:
        q2.stop()
    # v1 appends flow, the CoW delete's effects are absent, trailing appends
    # flow (delete_where = pin_files v2 + delete v3, so b2 lands at v4)
    assert {(r["v"], r["n"]) for r in got} == {(1, 40), (4, 10)}


def test_admission_control_bounds_batch(spark, tmp_path):
    """max_versions_per_batch caps each micro-batch's snapshot window —
    driver-level check on the reader itself (no engine), the same hooks the
    engine calls."""
    base = str(tmp_path / "t")
    for i in range(5):
        TF.write_multi_sink(
            {"events": _docs(spark, i * 10, (i + 1) * 10, f"b{i}")}, base
        )
    schema = TableChangesDataSource(
        {"base": base, "sink": "events"}
    ).schema()
    r = _TableChangesStreamReader(
        {"base": base, "sink": "events", "max_versions_per_batch": "2"},
        json.dumps(schema.jsonValue()),
    )
    assert r.initialOffset() == {"version": 0}
    ends = []
    start = r.initialOffset()
    for _ in range(3):
        end = r.latestOffset()
        r.partitions(start, end)
        ends.append(end["version"])
        start = end
    assert ends == [2, 4, 5]


def test_stream_schema_pins_all_columns_nullable(spark, tmp_path):
    """Tombstones null-pad payload columns, so the stream schema must be
    nullable everywhere even when the writer's schema was not."""
    base = str(tmp_path / "t")
    TF.write_multi_sink({"events": _docs(spark, 0, 10, "b1")}, base)
    schema = TableChangesDataSource({"base": base, "sink": "events"}).schema()
    by_name = {f.name: f for f in schema.fields}
    assert set(by_name) == set(ROW_COLS) | {"_change_type", "_commit_version"}
    assert all(by_name[c].nullable for c in ROW_COLS)
    assert not by_name["_change_type"].nullable


def test_admission_control_never_rewinds_after_restart(spark, tmp_path):
    """A RESTARTED reader (engine supplies the checkpointed offset;
    initialOffset is never consulted) must not floor the cap at
    from_version: returning latest < the engine's committed offset would
    plan a rewound batch and re-emit delivered versions.  The first
    post-restart batch is uncapped; later batches are bounded again."""
    base = str(tmp_path / "t")
    for i in range(7):
        TF.write_multi_sink(
            {"events": _docs(spark, i * 10, (i + 1) * 10, f"b{i}")}, base
        )
    schema = TableChangesDataSource({"base": base, "sink": "events"}).schema()
    r = _TableChangesStreamReader(
        {"base": base, "sink": "events", "max_versions_per_batch": "2"},
        json.dumps(schema.jsonValue()),
    )
    # simulate restart: engine committed offset 5, initialOffset NOT called
    assert r.latestOffset() == {"version": 7}          # uncapped, no rewind
    r.partitions({"version": 5}, {"version": 7})       # engine-planned batch
    # two more snapshots land; the cap applies again from the planned end
    for i in range(7, 9):
        TF.write_multi_sink(
            {"events": _docs(spark, i * 10, (i + 1) * 10, f"b{i}")}, base
        )
    assert r.latestOffset() == {"version": 9}          # 7 + 2
