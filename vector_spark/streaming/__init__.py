"""Structured Streaming variants of the pipeline (SURVEY §2.4 streaming-only).

The reference is a streaming engine: sources emit continuously, transforms
are per-event or interval-windowed, sinks flush incrementally, and
acknowledgement/buffer semantics make delivery resumable.  The Spark-first
mapping:

  continuous source      → ``readStream`` (rate source ≙ demo_logs
                           interval mode, config_panel.rs:775-900; file/
                           parquet stream ≙ incremental table ingest;
                           kafka source form config_panel.rs:1020-1040 →
                           ``readStream.format("kafka")``, gated on the
                           connector being present)
  per-event transforms   → identical DataFrame ops as batch (parse /
                           enrich / route compile unchanged onto a
                           streaming DataFrame — same code path)
  aggregate interval_ms  → event-time ``window()`` + ``withWatermark``
                           (config_panel.rs:1831-1861); Vector flushes
                           per interval ⇒ append mode emits each window
                           once its watermark passes
  dedupe cache           → ``dropDuplicatesWithinWatermark`` — bounded
                           state ≙ the LRU cache.num_events bound
                           (config_panel.rs:1713-1751)
  multi-sink fan-out     → ``foreachBatch`` writing the routed batch once,
                           partitioned by route (same single-scan shape as
                           the batch sink)
  acknowledgements       → the streaming checkpoint: offsets commit only
                           after the batch's sinks commit, so a killed job
                           resumes without reprocessing or loss
                           (vector_manager buffer/ack semantics analog)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_spark.schema import DOCUMENTS_SCHEMA

__all__ = [
    "rate_events",
    "document_stream",
    "streaming_parse_enrich_route",
    "streaming_flagship",
    "streaming_windowed_agg",
    "streaming_dedupe",
    "streaming_sample",
    "streaming_throttle",
    "streaming_reduce_sessions",
    "streaming_reduce_ends_when",
    "streaming_multiline",
    "streaming_rate_spikes",
    "streaming_rollup_fine",
    "streaming_to_table",
    "streaming_cdc_upsert",
    "streaming_tail_sample",
    "run_available_now",
    "TableChangesDataSource",
]

from vector_spark.streaming.table_source import TableChangesDataSource  # noqa: E402


# ----------------------------------------------------------------- sources

def rate_events(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """``demo_logs`` with an interval: the rate source emits (timestamp,
    value); we derive the same deterministic log-event fields from `value`
    that the batch generator derives from doc_id."""
    levels = F.array(*[F.lit(x) for x in ("info", "debug", "warn", "error")])
    statuses = F.array(*[F.lit(x) for x in ("200", "201", "301", "404", "500", "503")])
    raw = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    h = F.xxhash64(F.col("value"))
    return raw.select(
        F.col("timestamp"),
        F.concat(F.lit("Processing incoming request "), F.col("value")).alias("message"),
        levels[(F.col("value") % 4).cast("int")].alias("level"),
        F.format_string("host-%04d", (F.pmod(h, F.lit(20))).cast("int")).alias("host"),
        F.lit("demo-app").alias("service"),
        (F.lit(12345) + F.col("value") % 7).cast("int").alias("pid"),
        statuses[F.pmod(F.shiftrightunsigned(h, 16), F.lit(6)).cast("int")].alias("status"),
    )


def document_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Incremental ingest of the documents table: new parquet files in
    ``path`` become micro-batches (the Iceberg/warehouse streaming-ingest
    analog of the `file` source's watch mode)."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


# -------------------------------------------------------------- transforms

def streaming_parse_enrich_route(spark: SparkSession, stream: DataFrame) -> DataFrame:
    """The flagship's per-event stages compile UNCHANGED onto a streaming
    DataFrame — parse (regex + Arrow UDF), broadcast enrich, route tag are
    all stateless, so batch and streaming share one code path."""
    from vector_spark.plans import flagship

    return flagship.route_stage(flagship.enrich_stage(flagship.parse_stage(stream), spark))


def streaming_windowed_agg(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    interval: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("route", "lang", "host"),
    bytes_col: str = "content_bytes",
) -> DataFrame:
    """Per-sink aggregate as a native streaming windowed agg: event-time
    buckets + watermark bound the state; append mode emits each
    (window, keys) row exactly once when the watermark passes —
    Vector's aggregate interval flush (config_panel.rs:1831-1861)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, interval).alias("bucket"), *[F.col(k) for k in keys])
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(bytes_col).alias("byte_total"),
        )
        .select(F.col("bucket").start.alias("bucket"), *keys, "event_count", "byte_total")
    )


def streaming_rollup_fine(
    stream: DataFrame,
    ts_col: str,
    aggs: dict[str, tuple[str, str | None]],
    grain: str = "10 minutes",
    watermark: str = "30 minutes",
    group_by: tuple[str, ...] = (),
) -> DataFrame:
    """The streaming half of a continuous aggregate: maintain the FINEST
    rollup grain as a watermarked windowed agg.  Append mode emits each
    (bucket, keys) row exactly once when the watermark closes the window, so
    the sink table accumulates closed fine-grain buckets with no updates —
    ready for ``rollup_hypertable(fine, "bucket_start",
    rollup_merge_aggs(aggs), coarser_grains)`` to derive the 1 h / 1 d
    levels as cheap batch views (operators/aggregate.py).  This split is the
    standard continuous-aggregate architecture: the stream touches only the
    smallest level; coarser refreshes read rollup rows, never raw events.
    State is bounded by (watermark / grain) open windows per key set."""
    from vector_spark.operators.aggregate import _MERGEABLE

    exprs = [
        _MERGEABLE[how][0](col).alias(name) for name, (how, col) in aggs.items()
    ]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, grain).alias("_w"), *[F.col(k) for k in group_by])
        .agg(*exprs)
        .select(F.col("_w.start").alias("bucket_start"), *group_by, *aggs.keys())
    )


def streaming_dedupe(
    stream: DataFrame,
    fields: list[str],
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """T6 dedupe with bounded state: duplicates by `fields` are dropped for
    as long as their event time is within the watermark — the streaming
    analog of the reference's cache.num_events LRU bound."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(fields)


def streaming_sample(stream: DataFrame, rate: int, id_col: str) -> DataFrame:
    """T4 sample — deterministic 1-in-N works identically on a stream."""
    return stream.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(rate)) == 0)


def streaming_log_to_metric(
    stream: DataFrame,
    ts_col: str = "timestamp",
    interval: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """T9 on a stream: statsd-shaped rows (name, value, metric_type,
    sample_rate — the statsd_parse output) → per-(window, name, type)
    metric emission.  The statsd source + this agg is Vector's
    statsd → log_to_metric → flush-interval path as one native windowed
    aggregation: watermark bounds state, append mode emits each bucket
    exactly once.

    Per-type semantics (statsd wire protocol):
      c  — counter: sum(value / sample_rate)  (sample-rate upscaling)
      ms — timer:   count / sum / min / max   (summary components)
      g  — gauge:   min/max bracket the window (a true 'last' is
           arrival-order dependent — not reproducible in a shuffled
           windowed agg, so it is intentionally not offered)
      s  — set:     approx_count_distinct (exact distinct is unsupported
           state-wise in streaming aggs; the sketch is the scale answer)
    """
    return (
        stream.where(F.col("name").isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, interval).alias("bucket"),
            "name",
            "metric_type",
        )
        .agg(
            F.sum(
                F.when(F.col("metric_type") == "c", F.col("value") / F.col("sample_rate"))
            ).alias("counter_total"),
            F.count("value").alias("count"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.approx_count_distinct("value").alias("distinct_values"),
        )
        .select(
            F.col("bucket").start.alias("bucket"),
            "name",
            "metric_type",
            "counter_total",
            "count",
            "sum",
            "min",
            "max",
            "distinct_values",
        )
    )


# ------------------------------------------------------------------- sinks

def streaming_flagship(
    spark: SparkSession,
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """End-to-end streaming flagship: parse → enrich → route, then a
    foreachBatch sink that (1) appends the routed rows once, partitioned by
    route — the single-scan multi-sink fan-out — and (2) appends the
    per-batch partial aggregate (Vector's incremental metric flush;
    downstream readers SUM partials per bucket).  Offsets commit to the
    streaming checkpoint only after both writes succeed, so kill/restart
    resumes exactly where the sinks left off (ack/buffer semantics).

    Exactly-once: foreachBatch is at-least-once per sink (a crash between
    the two writes replays the whole batch), so both sinks partition by
    batch_id and use DYNAMIC partition overwrite — a replayed batch
    rewrites exactly its own partitions, making the replay idempotent and
    the sinks exactly-once end to end.

    Returns the StreamingQuery (caller picks the trigger via
    ``run_available_now`` or leaves it continuous)."""
    routed = streaming_parse_enrich_route(spark, stream)

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.drop("html").withColumn("batch_id", F.lit(batch_id))
        # Per-write dynamic overwrite (NOT just the session default from
        # session.py): with static mode an overwrite would truncate the whole
        # routed/ and agg/ dirs every micro-batch.  The writer-level option
        # overrides whatever session config the caller's SparkSession has, so
        # exactly-once holds for ANY session.
        batch_df.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id", "route").parquet(f"{out_dir}/routed")
        agg = (
            batch_df.groupBy(
                "route", "lang", "host", F.date_trunc("hour", "warc_ts").alias("bucket")
            )
            .agg(
                F.count(F.lit(1)).alias("event_count"),
                F.sum("content_bytes").alias("byte_total"),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        agg.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id", "route").parquet(f"{out_dir}/agg")

    return (
        routed.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def streaming_to_table(
    spark: SparkSession,
    stream: DataFrame,
    base: str,
    checkpoint_dir: str,
    sinks: tuple[str, ...] = ("routed",),
    route_col: str = "route",
    dead_letter: str | None = None,
):
    """Streaming ingest into the COMMIT-LOG table (plans/table_format.py)
    with snapshot isolation — the step past ``streaming_flagship``'s
    dynamic-overwrite idempotence: each micro-batch lands as one atomic
    snapshot commit, so a concurrent ``read_table`` sees whole batches or
    nothing, never a half-written one, and every table-maintenance tool
    (pin/compact/cluster/stats/bloom/vacuum/expire) applies to the
    streaming sink unchanged.

    Exactly-once mechanics: batches partition by ``batch_id``;
    ``write_multi_sink``'s resume filter drops already-COMMITTED partitions
    from a replayed batch, and a crash between the parquet write and the
    snapshot commit leaves only invisible uncommitted files, which the
    replay's dynamic partition overwrite replaces before committing — the
    same two-phase protocol the batch pipeline is chaos-certified on, now
    driven by foreachBatch (offsets advance only after the commit).

    ``sinks`` > 1 fans the routed stream out by ``route_col`` value into
    separate table sinks (the multi-sink topology) in ONE pass per sink of
    the already-computed batch; all sinks commit in the SAME snapshot.

    Route semantics: with ONE sink and no ``dead_letter`` the whole batch
    lands in that sink unfiltered (the single-sink fan-in form — no route
    predicate is applied at all).  With MULTIPLE sinks, rows whose route
    value is NULL or not in ``sinks`` match no sink and are DROPPED
    (Vector's semantics for an unconnected ``_unmatched`` output) — the
    checkpoint still acknowledges them, so the drop is permanent.  Pass
    ``dead_letter="some_name"`` to land every such row in that extra table
    sink instead (committed in the same snapshot) — the refusal-not-loss
    form; setting it also switches a single-sink call into filtered
    (fan-out) mode, since an unfiltered sink would leave the dead letter
    nothing to catch.  ``dead_letter`` must not name one of ``sinks`` —
    the unmatched rows would overwrite that sink's own routed rows."""
    from vector_spark.plans.checkpoint import PART_COL
    from vector_spark.plans.table_format import write_multi_sink

    if dead_letter is not None and dead_letter in sinks:
        raise ValueError(
            f"dead_letter {dead_letter!r} collides with a routed sink name — "
            "its unmatched rows would replace that sink's routed rows"
        )

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.withColumn(PART_COL, F.lit(str(batch_id)))
        if len(sinks) == 1 and dead_letter is None:
            payload = {sinks[0]: b}
        else:
            payload = {s: b.where(F.col(route_col) == s) for s in sinks}
            if dead_letter is not None:
                # NULL-safe: isin is NULL for NULL routes, which must land
                # in the dead letter too, not vanish
                matched = F.coalesce(
                    F.col(route_col).isin(list(sinks)), F.lit(False)
                )
                payload[dead_letter] = b.where(~matched)
        write_multi_sink(payload, base, run_id=f"stream-batch-{batch_id}")

    return (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def streaming_cdc_upsert(
    spark: SparkSession,
    stream: DataFrame,
    base: str,
    checkpoint_dir: str,
    sink: str,
    key_cols: list[str],
    part_col: str | None = None,
    n_parts: int = 8,
    dedupe_by: str | None = None,
):
    """Streaming CDC UPSERT into the commit-log table: each micro-batch
    becomes ONE atomic ``cdc_upsert`` snapshot (equality tombstones for the
    batch's keys + the batch's data files, committed together via
    ``upsert_keys``) — NO table scan per batch, so per-batch cost is
    O(batch) no matter how large the table has grown; readers absorb the
    changes through the merge-on-read anti-join until a scheduled
    ``materialize_deletes``/``compact_table`` pass.

    Exactly-once: ``run_id=f"cdc-{batch_id}"`` — a replayed batch (crash
    between commit and offset advance) is recognized as already committed
    and skipped whole, the same contract as ``streaming_to_table`` but at
    ROW granularity (a batch may freely update keys earlier batches wrote,
    which partition-level resume cannot express).

    Rows are spread across ``n_parts`` hash partitions of the key (NOT by
    batch_id): CDC partitions must be stable across batches so that every
    generation of a key lands in the same partition.

    ``dedupe_by`` handles batches carrying SEVERAL updates to one key:
    last-writer-wins per key by that column (``max_by`` — deterministic,
    partition-layout-independent, the same discipline as the reduce/gauge
    operators).  Without it, a multi-row key would insert every version
    (the tombstone only kills OLDER files, per the sequence rule)."""
    from vector_spark.plans.checkpoint import PART_COL, with_part_key
    from vector_spark.plans.table_format import upsert_keys

    pcol = part_col or PART_COL

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        b = batch_df
        if dedupe_by is not None:
            others = [c for c in b.columns if c not in key_cols]
            b = b.groupBy(*key_cols).agg(
                *[
                    F.max_by(F.col(c), F.col(dedupe_by)).alias(c)
                    for c in others
                ]
            ).select(*batch_df.columns)
        b = with_part_key(b, n_parts=n_parts, key_cols=key_cols)
        if pcol != PART_COL:
            b = b.withColumnRenamed(PART_COL, pcol)
        upsert_keys(
            spark, base, sink, b, key_cols, part_col=pcol,
            run_id=f"cdc-{batch_id}",
        )

    return (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def run_available_now(writer, timeout_secs: float = 300.0) -> None:
    """Drain everything currently available, then stop (the batch-like
    trigger used by tests and catch-up runs)."""
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(timeout_secs)
    if q.isActive:
        q.stop()
        raise TimeoutError("streaming query did not drain in time")
    if q.exception() is not None:
        raise q.exception()


def streaming_throttle(
    stream: DataFrame,
    key_field: str,
    ts_col: str = "warc_ts",
    threshold: int = 10,
    window_secs: float = 1.0,
) -> DataFrame:
    """T5 throttle with REAL cross-batch state (applyInPandasWithState):
    at most `threshold` events per key per `window_secs`, enforced across
    micro-batches — the reference's rate-limit semantics
    (config_panel.rs:1671-1709), which per-batch windowing can't honor when
    a key's events span batches.

    State per key: (window_start_epoch, emitted_in_window) — two scalars, so
    state size is O(distinct keys) and NoTimeout is safe for the bounded-
    cardinality keys throttle is used with (host, service, user bucket).
    (ProcessingTimeTimeout is deliberately NOT used: with availableNow
    triggers Spark schedules endless timeout-processing micro-batches and
    the query never drains.)  Arrival order within a batch follows event
    time (sorted), matching the batch operator's tiebreaker semantics.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = stream.schema
    state_schema = T.StructType(
        [
            T.StructField("win_start", T.DoubleType()),
            T.StructField("emitted", T.IntegerType()),
        ]
    )

    def throttle_fn(key, pdf_iter, state: GroupState):
        win_start, emitted = state.get if state.exists else (None, 0)
        # pdf_iter may yield several chunks per key per batch; event-time
        # order must hold ACROSS chunks, so gather then sort once.
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(ts_col)
            keep = np.zeros(len(pdf), dtype=bool)
            ts_epoch = pdf[ts_col].astype("int64").to_numpy() / 1e9
            for i, t in enumerate(ts_epoch):
                if win_start is None or t - win_start >= window_secs:
                    win_start, emitted = t, 0
                if emitted < threshold:
                    keep[i] = True
                    emitted += 1
            if keep.any():
                yield pdf[keep]
        state.update((float(win_start) if win_start is not None else 0.0, int(emitted)))

    return stream.groupBy(F.col(key_field)).applyInPandasWithState(
        throttle_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_throttle_tws(
    stream: DataFrame,
    key_field: str,
    ts_col: str = "warc_ts",
    threshold: int = 10,
    window_secs: float = 1.0,
) -> DataFrame:
    """T5 throttle on the Spark 4 `transformWithStateInPandas` API — the
    successor of applyInPandasWithState (streaming_throttle keeps the classic
    API; both enforce identical semantics, asserted by test_streaming).

    Differences that matter here: state is a named ValueState on a
    StatefulProcessorHandle (composable — a future operator can add a
    ListState next to it), timeMode="None" replaces the timeoutConf enum, and
    rows arrive as an iterator of pandas chunks exactly like before — the
    cross-chunk concat+sort is still required for event-time order.

    NOTE: the TWS state-server wire protocol needs ``google.protobuf`` at
    runtime; this container ships pyspark 4.1.2 WITHOUT protobuf (and no pip),
    so the e2e test is skipif-gated on the import.  The plan compiles either
    way; on a normal cluster install this runs as-is."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = stream.schema

    class ThrottleProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "throttle_win", "win_start double, emitted int"
            )

        def handleInputRows(self, key, rows, timer_values):
            cur = self._state.get() if self._state.exists() else None
            win_start, emitted = (cur[0], cur[1]) if cur is not None else (None, 0)
            chunks = list(rows)
            if chunks:
                pdf = pd.concat(chunks, ignore_index=True).sort_values(ts_col)
                keep = np.zeros(len(pdf), dtype=bool)
                ts_epoch = pdf[ts_col].astype("int64").to_numpy() / 1e9
                for i, t in enumerate(ts_epoch):
                    if win_start is None or t - win_start >= window_secs:
                        win_start, emitted = t, 0
                    if emitted < threshold:
                        keep[i] = True
                        emitted += 1
                if keep.any():
                    yield pdf[keep]
            self._state.update(
                (float(win_start) if win_start is not None else 0.0, int(emitted))
            )

        def close(self) -> None:
            pass

    return stream.groupBy(F.col(key_field)).transformWithStateInPandas(
        statefulProcessor=ThrottleProcessor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="None",
    )


def streaming_reduce_sessions(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "warc_ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    agg_exprs: dict[str, str] | None = None,
) -> DataFrame:
    """T7 `reduce` as native streaming sessionization: events for a key that
    arrive within `gap` of each other collapse into one session row, emitted
    (append mode) once the watermark closes the session — the streaming
    analog of reduce's merge-until-idle semantics (config_panel.rs:1756-1794;
    the batch operator's `ends_when` variant closes on a condition instead,
    an intentional delta documented in operators/reduce.py).

    ``agg_exprs`` maps column → {sum, max, min, first, last, count}; always
    includes events_merged (the reduce contract's merge count).
    """
    aggs = [F.count(F.lit(1)).alias("events_merged")]
    for col, how in (agg_exprs or {}).items():
        fn = {"sum": F.sum, "max": F.max, "min": F.min, "first": F.first, "last": F.last,
              "count": F.count}[how]
        aggs.append(fn(col).alias(f"{col}_{how}"))
    sess = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), *[F.col(k) for k in keys])
        .agg(*aggs)
    )
    return sess.select(
        *keys,
        F.col("session").start.alias("session_start"),
        F.col("session").end.alias("session_end"),
        *[c for c in sess.columns if c not in ("session", *keys)],
    )


def streaming_reduce_ends_when(
    stream: DataFrame,
    keys: list[str],
    value_col: str,
    ends_when,
    ts_col: str = "warc_ts",
) -> DataFrame:
    """T7 ``reduce`` with the reference's EXACT close semantics: a session
    accumulates per key until an event satisfying ``ends_when`` arrives,
    which closes the session (inclusive of the closing event) — carried
    ACROSS micro-batches with applyInPandasWithState
    (config_panel.rs:1756-1794, `ends_when` VRL condition).

    ``ends_when`` is a callable ``pd.DataFrame -> bool Series`` (the pandas
    analog of the compiled VRL predicate; batch reduce compiles the same
    condition to a Column).  Output rows: keys + value_sum +
    events_merged; sessions still open at the end of input remain in state
    (and would emit on the closing event of a later batch) — matching the
    reference, where an unterminated reduce window stays buffered.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_fields = [stream.schema[k] for k in keys]
    out_schema = T.StructType(
        [*key_fields,
         T.StructField("value_sum", T.DoubleType()),
         T.StructField("events_merged", T.LongType())]
    )
    state_schema = T.StructType(
        [T.StructField("acc", T.DoubleType()), T.StructField("n", T.LongType())]
    )

    def reduce_fn(key, pdf_iter, state: GroupState):
        acc, n = state.get if state.exists else (0.0, 0)
        closed = []
        chunks = list(pdf_iter)  # event-time order must hold ACROSS chunks
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(ts_col)
            ends = ends_when(pdf).to_numpy()
            vals = pdf[value_col].to_numpy()
            for v, e in zip(vals, ends):
                acc += float(v)
                n += 1
                if e:
                    closed.append((*key, acc, n))
                    acc, n = 0.0, 0
        if closed:
            yield pd.DataFrame(closed, columns=[*keys, "value_sum", "events_merged"])
        state.update((acc, n))

    return stream.groupBy(*[F.col(k) for k in keys]).applyInPandasWithState(
        reduce_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_multiline(
    stream: DataFrame,
    pattern: str,
    stream_by: list[str],
    *,
    mode: str = "start_pattern",
    order_col: str = "line_no",
    text_col: str = "message",
    joiner: str = "\n",
    timeout_ms: int = 5000,
) -> DataFrame:
    """Cross-batch multiline assembly — the streaming twin of
    ``operators.multiline.assemble_multiline`` with upstream Vector's
    ``multiline.timeout_ms`` semantics: an event whose continuation lines
    span micro-batches stays buffered in state until either its closing
    boundary arrives (a new start line) or the processing-time timeout
    fires, which flushes the partial event (flagged ``timed_out`` — a
    stack trace cut by a crashed writer still surfaces).

    State per key is ONE open event (first_line, buffered text, count) —
    bounded regardless of stream length.  Lines inside each batch chunk
    are sorted by ``order_col``; cross-batch order relies on the source's
    per-stream monotonicity (file offsets / tailer sequence), same as
    Vector's file source.

    Drain semantics: with ``trigger(availableNow=True)`` a pending
    processing-time timer keeps the query ticking empty batches until it
    fires, so events still open at end of input DO flush (``timed_out``
    true) before termination — budget ~``timeout_ms`` of extra wall time
    in batch-drain jobs, or keep it small there.
    """
    import re as _re

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if mode not in ("start_pattern", "continuation"):
        raise ValueError(
            f"mode must be 'start_pattern' or 'continuation', got {mode!r}"
        )
    key_fields = [stream.schema[k] for k in stream_by]
    out_schema = T.StructType(
        [*key_fields,
         T.StructField("first_line", T.LongType()),
         T.StructField("message", T.StringType()),
         T.StructField("n_lines", T.LongType()),
         T.StructField("timed_out", T.BooleanType())]
    )
    state_schema = T.StructType(
        [T.StructField("first_line", T.LongType()),
         T.StructField("buf", T.StringType()),
         T.StructField("n", T.LongType()),
         T.StructField("orphan", T.BooleanType())]
    )
    rx = _re.compile(pattern)

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            first, buf, n, _orphan = state.get
            state.remove()
            yield pd.DataFrame(
                [(*key, first, buf, n, True)],
                columns=[*stream_by, "first_line", "message", "n_lines", "timed_out"],
            )
            return
        # open event: (first_line, buf, n, is_orphan_fragment)
        open_ev = state.get if state.exists else None
        chunks = list(pdf_iter)
        closed: list[tuple] = []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order_col)
            texts = pdf[text_col].astype(str)
            # str.contains = re.search — the same UNANCHORED semantics the
            # batch twin's Column.rlike uses (str.match would anchor at
            # position 0 and segment differently for unanchored patterns)
            starts = texts.str.contains(rx).to_numpy()
            if mode == "continuation":
                starts = ~starts
            for ln, txt, is_start in zip(
                pdf[order_col].to_numpy(), texts.to_numpy(), starts
            ):
                if is_start:
                    if open_ev is not None:
                        first, buf, n, orphan = open_ev
                        # an orphan head fragment closes flagged (it is
                        # incomplete), a normal event closes clean
                        closed.append((*key, first, buf, n, orphan))
                    open_ev = (int(ln), txt, 1, False)
                elif open_ev is None:
                    # orphan continuation before any start: open an orphan
                    # fragment and keep folding into it — the batch twin
                    # folds ALL leading orphan lines into one event
                    open_ev = (int(ln), txt, 1, True)
                else:
                    first, buf, n, orphan = open_ev
                    open_ev = (first, buf + joiner + txt, n + 1, orphan)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[*stream_by, "first_line", "message", "n_lines", "timed_out"],
            )
        if open_ev is not None:
            state.update(open_ev)
            state.setTimeoutDuration(timeout_ms)
        elif state.exists:
            state.remove()

    return stream.groupBy(*[F.col(k) for k in stream_by]).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_rate_spikes(
    stream: DataFrame,
    key_field: str = "event_type",
    ts_col: str = "ts",
    bucket_s: int = 600,
    ratio_milli: int = 2_000,
) -> DataFrame:
    """Streaming twin of :func:`vector_spark.functions.anomaly.rate_spikes`:
    per-key tumbling-bucket counts flagged when a bucket exceeds ratio× the
    PREVIOUS bucket.  Window-over-window comparison needs cross-batch state
    (the previous bucket may have closed many micro-batches ago), so this
    is applyInPandasWithState, not a windowed agg.

    State per key: (open_bucket_epoch, open_cnt, prev_closed_cnt) — three
    scalars, O(distinct keys); -1 encodes "no bucket yet" (state columns
    are non-nullable by schema).  A bucket closes when a later-bucket event
    for the same key arrives (event-time order enforced per batch by the
    throttle sort discipline), and the flag rule is the SAME
    cross-multiplied integer comparison as the batch operator
    (cnt·1000 > ratio·prev) — so a replayed stream and a batch run over the
    same events flag the same (key, bucket) pairs for every bucket that has
    a successor; the still-open final bucket flushes on the next event,
    exactly Vector's interval-flush semantics.  Events older than the open
    bucket count into it (documented: out-of-order beyond one bucket needs
    an upstream watermark sort).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField(key_field, T.StringType()),
            T.StructField("bucket_epoch", T.LongType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("prev_cnt", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("open_epoch", T.LongType()),
            T.StructField("open_cnt", T.LongType()),
            T.StructField("prev_cnt", T.LongType()),
        ]
    )

    def spike_fn(key, pdf_iter, state: GroupState):
        open_epoch, open_cnt, prev_cnt = state.get if state.exists else (-1, 0, -1)
        flagged = []
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(ts_col)
            epochs = (pdf[ts_col].astype("int64").to_numpy() // 10**9) // bucket_s * bucket_s
            for e in epochs:
                e = int(e)
                if open_epoch == -1:
                    open_epoch, open_cnt = e, 0
                elif e > open_epoch:
                    # close the open bucket: flag it against its predecessor
                    if prev_cnt != -1 and open_cnt * 1000 > ratio_milli * prev_cnt:
                        flagged.append((*key, open_epoch, open_cnt, prev_cnt))
                    prev_cnt, open_epoch, open_cnt = open_cnt, e, 0
                open_cnt += 1
        if flagged:
            yield pd.DataFrame(
                flagged, columns=[key_field, "bucket_epoch", "cnt", "prev_cnt"]
            )
        state.update((int(open_epoch), int(open_cnt), int(prev_cnt)))

    return stream.groupBy(F.col(key_field)).applyInPandasWithState(
        spike_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_tail_sample(
    stream: DataFrame,
    *,
    trace_col: str = "trace_id",
    keep_fraction: float = 0.1,
    status_col: str | None = "status_code",
    error_code: int = 2,
    ts_col: str = "start_timestamp",
    end_col: str | None = "end_timestamp",
    gap_s: float = 30.0,
    watermark: str = "1 minute",
    seed: str = "",
) -> DataFrame:
    """Streaming twin of :func:`vector_spark.operators.traces.tail_sample`
    — the OTel collector's ``tailsampling`` buffer-then-decide loop:
    spans buffer in per-trace state until the trace is COMPLETE (no new
    span for ``gap_s`` of EVENT time, judged by the watermark — the same
    completion heuristic the collector's ``decision_wait`` implements),
    then the whole trace is kept or dropped atomically under the same
    three policies as the batch operator (error > slow-by-wall > per-trace
    per-trace md5 hash — the latency policy is intentionally NOT repeated
    here: wall duration is known only at decision time, so callers filter
    the emitted spans on their own threshold downstream, keeping this
    operator's state machine to the two policies that must be decided
    before anything can be emitted).  The hash decision is always the md5
    micro-bucket (Python-side; batch ``method="md5"`` is its exact twin).

    Mechanics: ``applyInPandasWithState`` with **EventTimeTimeout** — each
    batch appends its spans to the trace's buffered state (pickled rows +
    running error flag + max end-ts) and re-arms the timeout at
    ``max(end) + gap_s``; when the WATERMARK passes that point Spark fires
    the timed-out group with no new rows, the decision is made, and the
    kept spans are emitted with a ``sample_decision`` column.  State is
    O(buffered spans of open traces) — exactly the memory the collector's
    decision buffer pays; the watermark bounds how long a trace can stay
    open.  Traces still open when input ends remain in state (the
    streaming_reduce_sessions convention): they emit on a later batch once
    the watermark passes, or never if the stream stops — refusal-shape,
    not silent sampling of an incomplete trace.
    """
    import pickle

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if not (0.0 <= keep_fraction <= 1.0):
        raise ValueError(f"keep_fraction must be in [0, 1], got {keep_fraction}")
    if gap_s <= 0:
        raise ValueError(f"gap_s must be > 0, got {gap_s}")
    cols = stream.columns
    out_schema = T.StructType(
        [*stream.schema.fields, T.StructField("sample_decision", T.StringType())]
    )
    state_schema = T.StructType(
        [
            T.StructField("blob", T.BinaryType()),
            T.StructField("err", T.IntegerType()),
            T.StructField("max_end", T.DoubleType()),
        ]
    )
    keep_micro = int(round(keep_fraction * 1_000_000))
    end_field = end_col or ts_col

    def decide(key) -> str | None:
        # the md5 micro-bucket convention from the batch operator — the
        # decision runs Python-side here, where stdlib has no xxhash64, so
        # the streaming twin always uses the md5 form; a batch
        # tail_sample(method="md5", seed=...) run over the same spans makes
        # identical per-trace decisions, which is what the parity test pins
        import hashlib

        tid = key[0]
        if tid is None:
            return None
        h = int(
            hashlib.md5(f"{tid}{seed}".encode()).hexdigest()[:7], 16
        ) % 1_000_000
        return "probabilistic" if h < keep_micro else None

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            blob, err, _max_end = state.get
            state.remove()
            spans = pickle.loads(blob) if blob else []
            if spans:
                decision = "error" if err == 1 else decide(key)
                if decision is not None:
                    out = pd.DataFrame(spans, columns=cols)
                    out["sample_decision"] = decision
                    yield out
            return
        blob, err, max_end = state.get if state.exists else (None, 0, None)
        spans = pickle.loads(blob) if blob else []
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            if status_col is not None:
                if (pdf[status_col] == error_code).any():
                    err = 1
            ends = pd.to_datetime(pdf[end_field]).astype("int64").to_numpy() / 1e9
            m = float(ends.max())
            max_end = m if max_end is None else max(max_end, m)
            spans.extend([tuple(r) for r in pdf[cols].itertuples(index=False)])
        state.update((pickle.dumps(spans), int(err), float(max_end or 0.0)))
        # complete when the WATERMARK passes last-span-end + gap.  A late
        # straggler can arrive with the watermark already past that point —
        # Spark rejects a timeout at/behind the watermark, so floor it one
        # second ahead (the trace then decides at the next watermark bump,
        # late spans included rather than crashed on).
        to = int((float(max_end or 0.0) + gap_s) * 1000)
        state.setTimeoutTimestamp(max(to, state.getCurrentWatermarkMs() + 1000))

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(trace_col))
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
