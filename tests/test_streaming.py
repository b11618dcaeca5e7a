"""Structured Streaming variants: routed-row equality vs batch, bounded-state
dedupe, watermarked windowed agg, and checkpoint resume-without-reprocessing
(the reference's acknowledgement/buffer semantics — offsets commit with the
sinks; a restarted job processes only new input)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vector_spark import streaming as st
from vector_spark import synth
from vector_spark.plans import flagship


@pytest.fixture()
def doc_chunks(spark, tmp_path):
    """Two parquet 'arrival' chunks of the deterministic documents table.

    Function-scoped on purpose: the resume test appends chunk_b.parquet to the
    input dir, so a shared module-scoped dir would make the routed-equality
    test order-dependent (600 vs 400 rows depending on which ran first)."""
    full = synth.documents_pdf(600)
    a, b = full.iloc[:400], full.iloc[400:]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    a.to_parquet(in_dir / "chunk_a.parquet")
    return {"dir": str(in_dir), "a": a, "b": b, "base": str(tmp_path)}


def _drain_flagship(spark, in_dir, out_dir, ckpt):
    stream = st.document_stream(spark, in_dir)
    st.run_available_now(st.streaming_flagship(spark, stream, out_dir, ckpt))


def test_streaming_routed_equals_batch(spark, doc_chunks, tmp_path):
    out = str(tmp_path / "out")
    _drain_flagship(spark, doc_chunks["dir"], out, str(tmp_path / "ckpt"))

    streamed = spark.read.parquet(f"{out}/routed")
    batch_docs = spark.createDataFrame(doc_chunks["a"])
    batch = flagship.route_stage(flagship.enrich_stage(flagship.parse_stage(batch_docs), spark)).drop("html")

    s_rows = {tuple(r) for r in streamed.select("url", "route", "extracted_text").collect()}
    b_rows = {tuple(r) for r in batch.select("url", "route", "extracted_text").collect()}
    assert s_rows == b_rows  # routed-row equality, streaming vs batch


def test_streaming_resume_processes_only_new_files(spark, doc_chunks, tmp_path):
    """Kill/restart semantics: run 1 drains chunk A; chunk B arrives; run 2
    with the SAME checkpoint processes ONLY B (no reprocessing, no loss)."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    in_dir = doc_chunks["dir"]
    _drain_flagship(spark, in_dir, out, ckpt)
    n_after_first = spark.read.parquet(f"{out}/routed").count()
    assert n_after_first == len(doc_chunks["a"])

    doc_chunks["b"].to_parquet(f"{in_dir}/chunk_b.parquet")
    _drain_flagship(spark, in_dir, out, ckpt)

    routed = spark.read.parquet(f"{out}/routed")
    assert routed.count() == 600  # A exactly once + B exactly once
    assert routed.select("url").distinct().count() == 600
    # the per-batch agg partials sum to the full batch-mode aggregate
    agg = spark.read.parquet(f"{out}/agg")
    total = agg.agg(F.sum("event_count")).collect()[0][0]
    assert total == 600


def test_streaming_windowed_agg_append(spark, tmp_path):
    """Watermarked windowed agg emits a closed (bucket, keys) row once the
    watermark passes — late-but-in-watermark rows still count."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    pdf = synth.documents_pdf(300)
    pdf.to_parquet(in_dir / "a.parquet")

    stream = st.document_stream(spark, str(in_dir))
    tagged = st.streaming_parse_enrich_route(spark, stream)
    agg = st.streaming_windowed_agg(tagged, interval="1 hour", watermark="2 hours", keys=("route", "lang"))

    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits nothing until the watermark advances past a window —
    # a single drain of one chunk yields only windows older than max_ts - 2h
    emitted = spark.sql("select * from win_agg")
    batch_docs = flagship.parse_stage(spark.createDataFrame(pdf))
    max_ts = batch_docs.agg(F.max("warc_ts")).collect()[0][0]
    closed = emitted.filter(F.col("bucket") < F.expr(f"timestamp'{max_ts}' - interval 2 hours"))
    assert emitted.count() == closed.count()  # nothing un-closed leaked


def test_streaming_dedupe_bounded_state(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    pdf = synth.documents_pdf(100)
    dup = pd.concat([pdf, pdf.iloc[:30]], ignore_index=True)  # 30 dups
    dup.to_parquet(in_dir / "a.parquet")

    stream = st.document_stream(spark, str(in_dir))
    deduped = st.streaming_dedupe(stream, ["url"], ts_col="warc_ts", watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("select count(distinct url) c from dedup_stream").collect()[0]["c"] == 100
    assert spark.sql("select count(*) c from dedup_stream").collect()[0]["c"] == 100


def test_rate_events_shape(spark):
    """rate source (demo_logs interval analog) produces the log-event schema."""
    df = st.rate_events(spark, rows_per_second=500)
    assert df.isStreaming
    assert set(df.columns) == {"timestamp", "message", "level", "host", "service", "pid", "status"}


def test_streaming_throttle_state_spans_batches(spark, tmp_path):
    """applyInPandasWithState throttle: threshold counts persist across
    micro-batches — key 'u1' gets 2 of its 6 events total even though they
    arrive 3 per batch in the same window."""
    import pandas as pd

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    base = pd.Timestamp("2026-01-01T00:00:00", tz="UTC")

    def chunk(offset, n=3):
        return pd.DataFrame(
            {
                "url": [f"https://h/{offset + i}" for i in range(n)],
                "warc_ts": [base + pd.Timedelta(seconds=offset + i) for i in range(n)],
                "html": [b""] * n,
                "text": [""] * n,
                "lang": ["en"] * n,
            }
        )

    def write_chunk(pdf, name):
        from vector_spark.schema import DOCUMENTS_SCHEMA

        spark.createDataFrame(pdf, DOCUMENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir / name))

    write_chunk(chunk(0), "a")
    write_chunk(chunk(10), "b")  # same hour window, will arrive as batch 2

    # maxFilesPerTrigger=1 → each chunk is its own micro-batch within ONE
    # query run; the GroupState must carry (window_start, emitted) across
    # the batch boundary for the threshold to hold globally.
    # State-store files are written per shuffle partition per batch — keep
    # the partition count tiny so the test isn't I/O-bound.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    stream = st.document_stream(spark, str(in_dir / "*"), max_files_per_trigger=1)
    throttled = st.streaming_throttle(
        stream, key_field="lang", ts_col="warc_ts", threshold=2, window_secs=3600
    )
    q = (
        throttled.writeStream.format("memory")
        .queryName("thr")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        progress = [p for p in q.recentProgress if p]
        assert len(progress) >= 2  # really did run as 2+ micro-batches
        # 6 events in one hour window across 2 batches, threshold 2 → 2 out
        assert spark.sql("select count(*) c from thr").collect()[0]["c"] == 2
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (its state-server "
    "wire protocol); not installed in this container and pip is unavailable",
)
def test_streaming_throttle_tws_matches_classic(spark, tmp_path):
    """Spark 4 transformWithStateInPandas throttle enforces the same
    cross-batch threshold as the applyInPandasWithState version."""
    import pandas as pd

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    base = pd.Timestamp("2026-01-01T00:00:00", tz="UTC")

    def chunk(offset, n=3):
        return pd.DataFrame(
            {
                "url": [f"https://h/{offset + i}" for i in range(n)],
                "warc_ts": [base + pd.Timedelta(seconds=offset + i) for i in range(n)],
                "html": [b""] * n,
                "text": [""] * n,
                "lang": ["en"] * n,
            }
        )

    from vector_spark.schema import DOCUMENTS_SCHEMA

    for name, off in (("a", 0), ("b", 10)):
        spark.createDataFrame(chunk(off), DOCUMENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir / name))

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stream = st.document_stream(spark, str(in_dir / "*"), max_files_per_trigger=1)
        throttled = st.streaming_throttle_tws(
            stream, key_field="lang", ts_col="warc_ts", threshold=2, window_secs=3600
        )
        q = (
            throttled.writeStream.format("memory")
            .queryName("thr_tws")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # 6 events in one window across 2 micro-batches, threshold 2 → 2 out
        assert spark.sql("select count(*) c from thr_tws").collect()[0]["c"] == 2
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def test_streaming_reduce_sessions(spark, tmp_path):
    """Native session_window reduce: events within the gap merge into one
    session; a > gap silence splits sessions; append emits closed sessions."""
    from vector_spark.schema import DOCUMENTS_SCHEMA

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    base = pd.Timestamp("2026-01-01T00:00:00", tz="UTC")
    # lang=en: two bursts separated by 2h (gap 30m → 2 sessions);
    # lang=de: one burst. A far-future row advances the watermark past both.
    rows = (
        [("https://h/a%d" % i, base + pd.Timedelta(minutes=5 * i), "en") for i in range(3)]
        + [("https://h/b%d" % i, base + pd.Timedelta(hours=3) + pd.Timedelta(minutes=i), "en") for i in range(2)]
        + [("https://h/c0", base + pd.Timedelta(minutes=1), "de")]
        + [("https://h/z", base + pd.Timedelta(days=2), "en")]
    )
    pdf = pd.DataFrame(
        {
            "url": [r[0] for r in rows],
            "warc_ts": [r[1] for r in rows],
            "html": [b""] * len(rows),
            "text": [""] * len(rows),
            "lang": [r[2] for r in rows],
        }
    )
    spark.createDataFrame(pdf, DOCUMENTS_SCHEMA).coalesce(1).write.parquet(str(in_dir / "a"))

    sess = st.streaming_reduce_sessions(
        st.document_stream(spark, str(in_dir / "*")),
        keys=["lang"],
        gap="30 minutes",
        watermark="1 hour",
        agg_exprs={"url": "count"},
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.lang, r.events_merged)
        for r in spark.sql("select * from sessions").collect()
    }
    # closed sessions: en burst1 (3 events), en burst2 (2), de (1)
    assert got == {("en", 3), ("en", 2), ("de", 1)}


def test_streaming_reduce_ends_when_spans_batches(spark, tmp_path):
    """Condition-closed reduce: a session that STARTS in batch 1 and is
    CLOSED by an event in batch 2 emits one merged row spanning both."""
    from vector_spark.schema import DOCUMENTS_SCHEMA

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    base = pd.Timestamp("2026-01-01T00:00:00", tz="UTC")

    def write_chunk(rows, name):
        pdf = pd.DataFrame(
            {
                "url": [r[0] for r in rows],
                "warc_ts": [base + pd.Timedelta(seconds=r[1]) for r in rows],
                "html": [b""] * len(rows),
                "text": [r[2] for r in rows],   # text 'END' closes the session
                "lang": ["en"] * len(rows),
            }
        )
        spark.createDataFrame(pdf, DOCUMENTS_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / name)
        )

    # batch A: 2 open events; batch B: 1 event then the closer, then 1 leftover
    write_chunk([("u1", 0, "x"), ("u2", 1, "x")], "a")
    write_chunk([("u3", 10, "x"), ("u4", 11, "END"), ("u5", 12, "x")], "b")

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stream = st.document_stream(spark, str(in_dir / "*"), max_files_per_trigger=1)
        reduced = st.streaming_reduce_ends_when(
            stream.withColumn("one", F.lit(1.0)),
            keys=["lang"],
            value_col="one",
            ends_when=lambda pdf: pdf["text"] == "END",
        )
        q = (
            reduced.writeStream.format("memory")
            .queryName("ew")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("select * from ew").collect()
        # one closed session: 2 (batch A) + 2 (batch B incl. closer) = 4 events
        assert [(r.lang, r.value_sum, r.events_merged) for r in rows] == [("en", 4.0, 4)]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def test_stateless_operators_compose_on_streams(spark, tmp_path):
    """filter / route tag / sample / datadog_search / remap are plain
    DataFrame transforms — the SAME operator code runs on a stream and
    yields identical results to the batch run over the same input."""
    from vector_spark.operators import filter_events, sample, tag_routes

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    pdf = synth.documents_pdf(300)
    pdf.to_parquet(in_dir / "a.parquet")

    def transform(df):
        out = tag_routes(df, {"en": '.lang == "en"', "rest": "true"})
        out = filter_events(out, 'starts_with(.url, "https")')
        return sample(out, 3, key="url").select("url", "route")

    stream = st.document_stream(spark, str(in_dir))
    q = (
        transform(stream).writeStream.format("memory")
        .queryName("stateless_ops")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {tuple(r) for r in spark.sql("select * from stateless_ops").collect()}
    batch = {tuple(r) for r in transform(spark.createDataFrame(pdf)).collect()}
    assert streamed == batch and len(batch) > 0


def test_streaming_statsd_log_to_metric(spark, tmp_path):
    """The statsd → log_to_metric streaming demo: raw statsd wire lines
    arrive as a file stream, parse via the codegen regex, aggregate per
    (window, name, type) with watermarked state.  Counters upscale by
    sample rate; timers emit summary components; malformed lines drop."""
    import datetime as dt

    from vector_spark.sources import statsd_parse

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    lines = [
        (t0, "api.requests:1|c"),
        (t0 + dt.timedelta(seconds=1), "api.requests:1|c|@0.5"),   # → +2
        (t0 + dt.timedelta(seconds=2), "api.latency:120|ms"),
        (t0 + dt.timedelta(seconds=3), "api.latency:80|ms"),
        (t0 + dt.timedelta(seconds=11), "api.requests:3|c"),       # next bucket
        (t0 + dt.timedelta(seconds=4), "garbage not statsd"),      # dropped
    ]
    in_dir = tmp_path / "statsd_in"
    in_dir.mkdir()
    def write_chunk(rows, name):
        pdf = pd.DataFrame(rows, columns=["timestamp", "message"])
        pdf["timestamp"] = pdf["timestamp"].astype("datetime64[us]")  # Spark reads µs
        pdf.to_parquet(in_dir / name)

    write_chunk(lines, "b0.parquet")
    # append mode emits a window only after the watermark passes it: a later
    # sentinel event, arriving as its own micro-batch (maxFilesPerTrigger=1),
    # advances the watermark beyond both data buckets
    write_chunk([(t0 + dt.timedelta(seconds=120), "tick:1|c")], "b1.parquet")

    stream = (
        spark.readStream.schema("timestamp timestamp, message string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    metrics = st.streaming_log_to_metric(statsd_parse(stream), ts_col="timestamp")
    q = (
        metrics.writeStream.format("memory")
        .queryName("statsd_metrics")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
    )
    st.run_available_now(q)
    rows = {
        (r.bucket.second + r.bucket.minute * 60, r.name, r.metric_type): r
        for r in spark.sql("SELECT * FROM statsd_metrics").collect()
    }
    # bucket [0,10): counter 1 + 1/0.5 = 3.0 ; timer count 2 sum 200 min 80 max 120
    c0 = rows[(0, "api.requests", "c")]
    assert c0.counter_total == 3.0 and c0["count"] == 2
    t = rows[(0, "api.latency", "ms")]
    assert (t["count"], t["sum"], t["min"], t["max"]) == (2, 200.0, 80.0, 120.0)
    # bucket [10,20): the late counter lands in its own window
    assert rows[(10, "api.requests", "c")].counter_total == 3.0
    # malformed line contributed to NO group
    assert all(name != "" and name is not None for _, name, _t in rows)


def test_streaming_incremental_dedup_loop(spark, tmp_path):
    """The daily-crawl loop as a stream: each micro-batch is filtered
    against the history corpus (exact + near passes) and its SURVIVORS are
    appended to history — so a later batch near-duplicating an earlier
    batch's survivor is dropped too.  foreachBatch + availableNow."""
    from vector_spark.functions import incremental_neardup_filter

    base = ("the quick brown fox jumps over the lazy dog and keeps running "
            "through the quiet field toward the river")
    hist_dir = str(tmp_path / "history")
    spark.createDataFrame([(0, base)], "doc_id long, text string").write.parquet(hist_dir)
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def sink(batch_df, _bid):
        hist = batch_df.sparkSession.read.parquet(hist_dir)
        kept = incremental_neardup_filter(batch_df, hist, threshold=0.5)
        kept.write.mode("append").parquet(hist_dir)

    def drain():
        q = (
            spark.readStream.schema("doc_id long, text string").parquet(str(in_dir))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    pd.DataFrame(
        {"doc_id": [10, 11],
         "text": [base + " tonight",
                  "totally fresh words about ships and harbors at dawn"]}
    ).to_parquet(in_dir / "c1.parquet")
    drain()
    assert {r.doc_id for r in spark.read.parquet(hist_dir).collect()} == {0, 11}

    pd.DataFrame(
        {"doc_id": [20, 21],
         "text": ["totally fresh words about ships and harbors at dusk",
                  "yet another brand new subject entirely about tall mountain passes"]}
    ).to_parquet(in_dir / "c2.parquet")
    drain()  # 20 near-dups batch-1's SURVIVOR 11 → dropped; 21 fresh → kept
    assert {r.doc_id for r in spark.read.parquet(hist_dir).collect()} == {0, 11, 21}


def test_streaming_rate_spikes_matches_batch(spark, tmp_path):
    """Window-over-window spike flags persist across micro-batches and match
    the batch rate_spikes operator on every bucket that has a successor."""
    import pandas as pd

    from vector_spark.functions import rate_spikes

    base = pd.Timestamp("2026-01-01T00:00:00", tz="UTC")

    def events(offsets):
        return pd.DataFrame(
            {
                "event_id": list(range(len(offsets))),
                "ts": [base + pd.Timedelta(seconds=s) for s in offsets],
                "event_type": ["a"] * len(offsets),
                "value": [1.0] * len(offsets),
            }
        )

    # bucket0 (0-59s): 2 events | bucket1: 5 (flag: 2.5x) | bucket2: 5 (no)
    # | bucket3: 20 (flag: 4x) | bucket4: 1 closer event so bucket3 closes
    offs = (
        [0, 30]
        + [60 + i for i in range(5)]
        + [120 + i for i in range(5)]
        + [180 + i % 50 for i in range(20)]
        + [240]
    )
    # split into 3 files -> 3 micro-batches, cutting ACROSS bucket1 so its
    # count must accumulate in state over a batch boundary
    chunks = [events(offs)[i::3].sort_values("ts") for i in range(3)]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    schema = "event_id long, ts timestamp, event_type string, value double"
    # per-batch files must arrive in event-time order for the cross-batch
    # bucket accounting (the operator's documented ordering contract)
    ordered = pd.concat(chunks).sort_values("ts").reset_index(drop=True)
    per_batch = [ordered.iloc[:9], ordered.iloc[9:17], ordered.iloc[17:]]
    for i, pdf in enumerate(per_batch):
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode("append").parquet(
            str(in_dir / f"f{i}")
        )

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        from vector_spark import streaming as st

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir / "*"))
        )
        spikes = st.streaming_rate_spikes(
            stream, key_field="event_type", ts_col="ts", bucket_s=60,
            ratio_milli=2_000,
        )
        q = (
            spikes.writeStream.format("memory")
            .queryName("spikes")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.bucket_epoch, r.cnt, r.prev_cnt)
            for r in spark.sql("select * from spikes").collect()
        }
        batch_df = spark.createDataFrame(ordered, schema)
        exp = {
            (r.bucket_epoch, r.cnt, r.prev_cnt)
            for r in rate_spikes(batch_df, bucket_s=60, ratio_milli=2_000)
            .select(
                F.unix_timestamp("bucket_start").cast("long").alias("bucket_epoch"),
                "cnt",
                "prev_cnt",
            )
            .collect()
        }
        # bucket3 closed by the 240s event; the still-open 240s bucket has
        # cnt=1 < 2x20 so the batch side doesn't flag it either -> exact
        # batch/stream parity on this stream
        assert got == exp
        assert len(got) == 2
        assert sorted(c for _, c, _ in got) == [5, 20]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def test_streaming_rollup_fine_matches_batch(spark, tmp_path):
    """Continuous-aggregate parity: the streaming fine grain emits (append,
    exactly-once) rows value-identical to the batch rollup's fine level, and
    the coarser grain derived from the emitted rows via rollup_merge_aggs
    equals the same merge over the batch fine level."""
    from vector_spark.operators.aggregate import rollup_hypertable, rollup_merge_aggs

    in_dir = tmp_path / "roll_in"
    in_dir.mkdir()
    synth.documents_pdf(400).to_parquet(in_dir / "a.parquet")
    synth.documents_pdf(300).iloc[150:].to_parquet(in_dir / "b.parquet")

    AGGS = {"n": ("count", None), "b_sum": ("sum", "b"), "b_max": ("max", "b")}

    # synth warc_ts spans only ~7 min; spread events over ~4 h (hash of the
    # url, identical on the stream and batch sides) so the 30-min watermark
    # actually closes windows
    def _spread(df):
        return df.select(
            (F.col("warc_ts") + F.make_interval(secs=F.pmod(F.xxhash64("url"), F.lit(14400)))).alias("warc_ts"),
            "lang",
            F.length("text").alias("b"),
        )

    stream = st.document_stream(spark, str(in_dir), max_files_per_trigger=1)
    ev_s = _spread(stream)
    fine_s = st.streaming_rollup_fine(
        ev_s, "warc_ts", AGGS, grain="10 minutes",
        watermark="30 minutes", group_by=("lang",),
    )
    q = (
        fine_s.writeStream.format("memory")
        .queryName("roll_fine")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "roll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = spark.sql("select * from roll_fine").cache()
    assert emitted.count() > 0, "watermark must have closed some windows"

    batch_ev = _spread(spark.read.parquet(str(in_dir)))
    batch_fine = rollup_hypertable(
        batch_ev, "warc_ts", AGGS, ("10 minutes",), group_by=["lang"]
    )["10 minutes"]

    # 1) every emitted row is value-identical to its batch counterpart
    joined = emitted.join(batch_fine, on=["bucket_start", "lang", "n", "b_sum", "b_max"])
    assert joined.count() == emitted.count()

    # 2) exactly the watermark-closed windows were emitted
    max_ts = batch_ev.agg(F.max("warc_ts")).collect()[0][0]
    closed = batch_fine.filter(
        F.col("bucket_start") + F.expr("interval 10 minutes")
        <= F.expr(f"timestamp'{max_ts}' - interval 30 minutes")
    )
    assert emitted.count() == closed.count()

    # 3) coarse refresh from the EMITTED fine rows == same merge over batch
    merge = rollup_merge_aggs(AGGS)
    coarse_s = rollup_hypertable(emitted, "bucket_start", merge, ("1 hour",), group_by=["lang"])["1 hour"]
    batch_restricted = batch_fine.join(
        emitted.select("bucket_start", "lang"), on=["bucket_start", "lang"], how="left_semi"
    )
    coarse_b = rollup_hypertable(batch_restricted, "bucket_start", merge, ("1 hour",), group_by=["lang"])["1 hour"]
    s_rows = {tuple(r) for r in coarse_s.collect()}
    b_rows = {tuple(r) for r in coarse_b.collect()}
    assert s_rows == b_rows


def test_streaming_to_table_snapshot_commits(spark, doc_chunks, tmp_path):
    """Streaming ingest into the commit-log table: every micro-batch is one
    atomic snapshot; a crash between the parquet write and the commit loses
    nothing and duplicates nothing on restart; maintenance tools apply."""
    from vector_spark.plans import table_format as TF

    base = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    routed = st.streaming_parse_enrich_route(
        spark, st.document_stream(spark, doc_chunks["dir"], max_files_per_trigger=1)
    ).drop("html")

    st.run_available_now(st.streaming_to_table(spark, routed, base, ckpt))
    t = TF.read_table(spark, base, "routed")
    assert t.count() == len(doc_chunks["a"])

    # inject a crash AFTER the parquet write, BEFORE the snapshot commit
    doc_chunks["b"].to_parquet(f"{doc_chunks['dir']}/chunk_b.parquet")
    real_commit = TF.CommitLog.commit
    state = {"boom": True}

    def crashing_commit(self, meta):
        if state["boom"]:
            state["boom"] = False
            raise RuntimeError("injected crash before snapshot commit")
        return real_commit(self, meta)

    TF.CommitLog.commit = crashing_commit
    try:
        with pytest.raises(Exception, match="injected"):
            st.run_available_now(
                st.streaming_to_table(spark, routed, base, ckpt)
            )
        # uncommitted batch data must be INVISIBLE to snapshot readers
        assert TF.read_table(spark, base, "routed").count() == len(doc_chunks["a"])
        # restart with the same checkpoint: the batch replays and commits
        st.run_available_now(st.streaming_to_table(spark, routed, base, ckpt))
    finally:
        TF.CommitLog.commit = real_commit

    t = TF.read_table(spark, base, "routed")
    assert t.count() == 600
    assert t.select("url").distinct().count() == 600  # exactly once

    # the streaming sink is a first-class table: compact + stats just work
    TF.compact_table(spark, base, "routed", max_files=0, target_files=1)
    TF.collect_file_stats(spark, base, "routed", ["warc_ts"])
    assert TF.read_table(spark, base, "routed").count() == 600


def test_streaming_cdc_upsert_row_level_exactly_once(spark, doc_chunks, tmp_path):
    """Streaming CDC upserts: each micro-batch is ONE atomic cdc_upsert
    snapshot (equality tombstones + data files, no table scan); updates to
    keys written by EARLIER batches apply at row granularity; a crash before
    the snapshot commit replays without duplicating anything; multi-version
    keys within a batch collapse last-writer-wins via dedupe_by."""
    from vector_spark.plans import table_format as TF

    base = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ck")

    def writer():
        stream = st.document_stream(spark, doc_chunks["dir"]).drop("html")
        return st.streaming_cdc_upsert(
            spark, stream, base, ckpt, "docs", ["url"], dedupe_by="warc_ts"
        )

    st.run_available_now(writer())
    assert TF.read_table(spark, base, "docs").count() == 400

    # chunk_c: 50 urls from chunk_a re-emitted TWICE (stale + fresh version)
    # plus chunk_b's 200 brand-new urls, all in one arrival file
    a = doc_chunks["a"]
    stale = a.iloc[:50].drop(columns=["html"]).copy()
    stale["text"] = "UPD-STALE"
    fresh = stale.copy()
    fresh["text"] = "UPD-FRESH"
    fresh["warc_ts"] = fresh["warc_ts"] + pd.Timedelta(hours=1)
    chunk_c = pd.concat(
        [stale, fresh, doc_chunks["b"].drop(columns=["html"])], ignore_index=True
    )
    # the file stream reads with the documents schema (html included) — write
    # chunk_c with an html column to keep arrival schemas uniform, and pin
    # warc_ts to microseconds (the Timedelta add upcast it to ns, which
    # Spark's timestamp reader refuses under an explicit schema)
    chunk_c["html"] = b""
    chunk_c["warc_ts"] = chunk_c["warc_ts"].astype("datetime64[us, UTC]")
    chunk_c = chunk_c[["url", "warc_ts", "html", "text", "lang"]]

    # crash INSIDE the cdc batch, before its snapshot commit
    real_commit = TF.CommitLog.commit
    state = {"boom": True}

    def crashing(self, meta):
        if meta.get("operation") == "cdc_upsert" and state["boom"]:
            state["boom"] = False
            raise RuntimeError("injected crash before cdc commit")
        return real_commit(self, meta)

    chunk_c.to_parquet(f"{doc_chunks['dir']}/chunk_c.parquet")
    TF.CommitLog.commit = crashing
    try:
        with pytest.raises(Exception, match="injected"):
            st.run_available_now(writer())
        # uncommitted tombstones + staged files are invisible
        assert TF.read_table(spark, base, "docs").count() == 400
        st.run_available_now(writer())  # replay from the same checkpoint
    finally:
        TF.CommitLog.commit = real_commit

    t = TF.read_table(spark, base, "docs")
    assert t.count() == 600
    assert t.select("url").distinct().count() == 600  # row-level exactly-once
    assert t.where("text = 'UPD-FRESH'").count() == 50  # last writer won
    assert t.where("text = 'UPD-STALE'").count() == 0

    # settle the tombstones; nothing changes logically
    TF.materialize_deletes(spark, base, "docs")
    t = TF.read_table(spark, base, "docs")
    assert t.count() == 600 and t.where("text = 'UPD-FRESH'").count() == 50


def test_streaming_to_table_dead_letter_catches_unrouted(spark, doc_chunks, tmp_path):
    """Multi-sink fan-out: rows whose route is unlisted (or NULL) land in the
    dead-letter sink instead of being checkpoint-acknowledged and dropped."""
    from vector_spark.plans import table_format as TF

    base = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    routed = st.streaming_parse_enrich_route(
        spark, st.document_stream(spark, doc_chunks["dir"], max_files_per_trigger=1)
    ).drop("html")
    # list ONE real flagship route; everything else must land in the
    # dead letter (committed in the same snapshot)
    q = st.streaming_to_table(
        spark, routed, base, ckpt, sinks=("english",), route_col="route",
        dead_letter="unrouted",
    )
    st.run_available_now(q)
    n_en = TF.read_table(spark, base, "english").count()
    n_dead = TF.read_table(spark, base, "unrouted").count()
    assert n_en + n_dead == len(doc_chunks["a"])
    assert n_en > 0 and n_dead > 0
    dead_routes = {
        r["route"]
        for r in TF.read_table(spark, base, "unrouted").select("route").distinct().collect()
    }
    assert "english" not in dead_routes


def test_streaming_to_table_dead_letter_name_collision_refused(spark):
    with pytest.raises(ValueError, match="collides"):
        st.streaming_to_table(
            spark, None, "/tmp/x", "/tmp/y",
            sinks=("english", "errors"), dead_letter="errors",
        )


def test_streaming_tail_sample_buffers_until_trace_complete(spark, tmp_path):
    """Tail sampling with EventTimeTimeout: a trace emits (whole, with its
    decision) only once the watermark passes its last span end + gap;
    decisions match the batch operator's md5 twin; still-open traces stay
    buffered."""
    from datetime import datetime

    from vector_spark.streaming import run_available_now, streaming_tail_sample

    def t(minute, sec=0):
        return datetime(2024, 1, 1, 0, minute, sec)

    schema = (
        "trace_id string, span_id string, status_code int, "
        "start_timestamp timestamp, end_timestamp timestamp"
    )
    d = tmp_path / "spans"
    d.mkdir()
    # file1: trace A (has an error span) + trace B (clean), both ~minute 0
    spark.createDataFrame(
        [
            ("A", "a1", 1, t(0, 0), t(0, 1)),
            ("A", "a2", 2, t(0, 2), t(0, 3)),
            ("B", "b1", 1, t(0, 0), t(0, 2)),
        ],
        schema,
    ).coalesce(1).write.parquet(str(d / "f1"))
    # file2: trace C at minute 10 — its max event time advances the
    # watermark (delay 1m) to 0:09, past A/B end+gap (0:01 + 60s) -> A and
    # B decide in this batch
    spark.createDataFrame([("C", "c1", 1, t(10, 0), t(10, 1))], schema) \
        .coalesce(1).write.parquet(str(d / "f2"))
    # file3: trace D at minute 30 -> watermark 0:29 passes C's 0:11 -> C
    # decides; D itself stays open forever (refusal, not a guess)
    spark.createDataFrame([("D", "d1", 1, t(30, 0), t(30, 1))], schema) \
        .coalesce(1).write.parquet(str(d / "f3"))

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    out = streaming_tail_sample(
        src, keep_fraction=1.0, gap_s=60, watermark="1 minute", seed="st"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tail_sampled")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM tail_sampled").collect()
    got = {(r["trace_id"], r["span_id"], r["sample_decision"]) for r in rows}
    # keep_fraction=1.0: every decided trace survives; A via the error
    # policy (BOTH its spans, including the clean one), B and C
    # probabilistic; D never decided
    assert got == {
        ("A", "a1", "error"),
        ("A", "a2", "error"),
        ("B", "b1", "probabilistic"),
        ("C", "c1", "probabilistic"),
    }


def test_streaming_tail_sample_drop_and_batch_parity(spark, tmp_path):
    """keep_fraction=0: only error traces survive; the per-trace md5
    decision matches the batch operator exactly."""
    from datetime import datetime

    from vector_spark.operators import tail_sample
    from vector_spark.streaming import streaming_tail_sample

    def t(minute, sec=0):
        return datetime(2024, 1, 1, 0, minute, sec)

    schema = (
        "trace_id string, span_id string, status_code int, "
        "start_timestamp timestamp, end_timestamp timestamp"
    )
    rows = [
        (f"T{i}", f"s{i}", 2 if i % 5 == 0 else 1, t(0, i), t(0, i + 1))
        for i in range(20)
    ]
    d = tmp_path / "spans2"
    d.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame([("LATE", "x", 1, t(30), t(30, 1))], schema) \
        .coalesce(1).write.parquet(str(d / "f2"))

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    out = streaming_tail_sample(
        src, keep_fraction=0.4, gap_s=60, watermark="1 minute", seed="p"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tail_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_got = {
        (r["trace_id"], r["sample_decision"])
        for r in spark.sql("SELECT * FROM tail_parity").collect()
    }
    batch = tail_sample(
        spark.createDataFrame(rows, schema),
        keep_fraction=0.4,
        seed="p",
        method="md5",
        with_decision=True,
    ).collect()
    batch_got = {(r["trace_id"], r["sample_decision"]) for r in batch}
    assert stream_got == batch_got and stream_got


def test_streaming_multiline_spans_batches(spark, tmp_path):
    """A stack trace whose continuation lines span micro-batches assembles
    into ONE event, emitted when the next start line arrives; an orphan
    continuation (no start yet) flushes alone, flagged; the event left
    open at end of input flushes via the processing-time timeout
    (availableNow keeps ticking empty batches until pending timers fire,
    so the flush happens BEFORE termination — Vector's timeout_ms)."""
    in_dir = tmp_path / "ml_in"
    in_dir.mkdir()
    schema = "host string, line_no long, message string"

    def write_chunk(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(in_dir / name)
        )

    write_chunk(
        [("a", 1, "2024-01-01 ERROR boom"), ("a", 2, "  at f1"),
         ("b", 1, "  orphan tail"), ("b", 2, "  orphan more")],
        "a",
    )
    write_chunk([("a", 3, "  at f2"), ("a", 4, "2024-01-01 INFO next")], "b")

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir / "*"))
        )
        out = st.streaming_multiline(
            stream, r"^\d{4}-", stream_by=["host"], timeout_ms=3_000
        )
        q = (
            out.writeStream.format("memory")
            .queryName("ml")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ml_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = sorted(
            spark.sql("select * from ml").collect(), key=lambda r: (r.host, r.first_line)
        )
        assert [
            (r.host, r.first_line, r.message, r.n_lines, r.timed_out) for r in rows
        ] == [
            ("a", 1, "2024-01-01 ERROR boom\n  at f1\n  at f2", 3, False),
            ("a", 4, "2024-01-01 INFO next", 1, True),  # timeout flush
            # BOTH leading orphan lines fold into ONE flagged fragment —
            # same event the batch twin would build
            ("b", 1, "  orphan tail\n  orphan more", 2, True),
        ]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def test_streaming_rollup_fine_distinct_sketches(spark, tmp_path):
    """The streaming fine grain accepts the r5 'distinct' (HLL sketch)
    kind: closed fine buckets carry mergeable sketch state, and the batch
    merge refresh folds them to the exact distinct count."""
    from vector_spark.operators import (
        estimate_distinct,
        rollup_hypertable,
        rollup_merge_aggs,
    )
    from vector_spark.schema import DOCUMENTS_SCHEMA

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    base = pd.Timestamp("2026-01-01T00:00:00", tz="UTC")
    pdf = pd.DataFrame(
        {
            "url": [f"https://h{i % 37}/p{i}" for i in range(300)],
            "warc_ts": [base + pd.Timedelta(minutes=i) for i in range(300)],
            "html": [b""] * 300,
            "text": [f"u{i % 83}" for i in range(300)],  # 83 distinct users
            "lang": ["en"] * 300,
        }
    )
    spark.createDataFrame(pdf, DOCUMENTS_SCHEMA).coalesce(1).write.parquet(
        str(in_dir / "a")
    )
    # a far-future row pushes the watermark so every real window closes
    tail = pdf.iloc[:1].assign(warc_ts=[base + pd.Timedelta(days=3)])
    spark.createDataFrame(tail, DOCUMENTS_SCHEMA).coalesce(1).write.parquet(
        str(in_dir / "b")
    )

    aggs = {"users": ("distinct", "text"), "n": ("count", None)}
    stream = st.document_stream(spark, str(in_dir / "*"), max_files_per_trigger=1)
    fine = st.streaming_rollup_fine(
        stream, "warc_ts", aggs, grain="1 hour", watermark="1 hour"
    )
    q = (
        fine.writeStream.format("memory")
        .queryName("hll_fine")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    closed = spark.sql("select * from hll_fine")
    assert closed.count() >= 5  # the 5 real hours all closed
    day = rollup_hypertable(
        closed, "bucket_start", rollup_merge_aggs(aggs), ("1 day",)
    )["1 day"]
    row = estimate_distinct(day, ["users"]).orderBy("bucket_start").collect()[0]
    assert row.users == 83 and row.n == 300
