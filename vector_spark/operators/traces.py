"""Span → trace assembly over OTLP trace rows.

The rows produced by :func:`vector_spark.sources.otlp.otlp_traces_parse`
are one-per-span; every trace-level question an APM backend answers
(latency, error rate, span fan-out, which services participated) is a
grouped aggregate over ``trace_id``.  Reference scope: Vector routes trace
events (the ``is_trace`` filter condition, config_panel.rs:1461-1467) but
leaves assembly to the backend — this operator IS that backend step,
Spark-first.

Plan: ONE hash aggregate on ``trace_id`` with map-side partial
aggregation; no self-joins, no windows.  Trace cardinality is huge
(good key distribution) and spans-per-trace is bounded (hundreds), so
there is no hot-key risk at 10^12 spans.  Parent→child DEPTH is
deliberately not computed here — that is an iterative join
(connected-components shape, see functions/graph.py) and rarely worth
it next to these O(1)-per-span stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trace_rollup(
    spans: DataFrame,
    *,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_span_id",
    name_col: str = "name",
    status_col: str = "status_code",
    start_col: str = "start_timestamp",
    end_col: str = "end_timestamp",
    service_expr=None,
    error_code: int = 2,
) -> DataFrame:
    """One row per trace: span/error counts, wall duration, root span name,
    and (optionally) the sorted set of participating services.

    * ``duration_us`` is max(end) − min(start) — the trace's wall clock,
      not the sum of span durations (spans overlap).
    * ``root_name`` is the name of the root span (``parent_col`` NULL,
      which is how the OTLP decoder marks proto3's absent parent).  If a
      trace has several roots (clock-skewed or partial ingest), the one
      with the smallest ``span_col`` wins — deterministic under any
      partitioning.  Traces with no root (orphaned subtrees) get NULL.
    * ``service_expr`` — any Column (e.g. ``F.col("resource")["service.name"]``);
      adds ``services``, the sorted distinct values, as an array column.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(
            F.when(F.col(status_col) == error_code, 1).otherwise(0)
        ).alias("n_errors"),
        F.min(start_col).alias("trace_start"),
        F.max(end_col).alias("trace_end"),
        (
            F.unix_micros(F.max(end_col).cast("timestamp"))
            - F.unix_micros(F.min(start_col).cast("timestamp"))
        ).alias("duration_us"),
        F.min_by(
            F.col(name_col),
            F.when(F.col(parent_col).isNull(), F.col(span_col)),
        ).alias("root_name"),
    ]
    if service_expr is not None:
        aggs.append(F.array_sort(F.collect_set(service_expr)).alias("services"))
    return spans.groupBy(trace_col).agg(*aggs)


def service_graph(
    spans: DataFrame,
    *,
    service_col: str = "service",
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_span_id",
    status_col: str | None = "status_code",
    error_code: int = 2,
) -> DataFrame:
    """Service dependency map: one row per (parent_service, child_service)
    edge with call and error counts — the APM "service map" aggregate.

    An edge exists for every span whose parent lives in the SAME trace:
    child spans join their parent on ``(trace_id, parent_span_id =
    span_id)``.  Root spans (NULL parent) and orphans (parent id not
    ingested) contribute no edge — a dangling parent pointer is dropped by
    the inner join rather than invented.  ``n_errors`` counts edges whose
    CHILD span errored (the convention service maps use: the callee
    failed).

    Plan: one equi-join shuffled on ``(trace_col, span/parent id)`` — a
    high-cardinality, uniformly-distributed key (no hot keys: fan-in per
    span is bounded) — then one hash aggregate on the tiny
    (parent_service, child_service) space.  Self-loops (a service calling
    itself) are kept; filter ``parent_service != child_service`` downstream
    if unwanted.
    """
    child = spans.where(F.col(parent_col).isNotNull()).select(
        F.col(trace_col).alias("_t"),
        F.col(parent_col).alias("_pid"),
        F.col(service_col).alias("child_service"),
        (
            # NULL status (proto3 omits STATUS_CODE_UNSET, so decoded spans
            # commonly carry NULL) is "not an error", never a NULL sum
            F.when(F.col(status_col) == error_code, 1).otherwise(0)
            if status_col is not None
            else F.lit(0)
        ).alias("_err"),
    )
    parents = spans.select(
        F.col(trace_col).alias("_t"),
        F.col(span_col).alias("_pid"),
        F.col(service_col).alias("parent_service"),
    )
    edges = child.join(parents, on=["_t", "_pid"], how="inner")
    return edges.groupBy("parent_service", "child_service").agg(
        F.count(F.lit(1)).alias("n_calls"),
        F.sum("_err").alias("n_errors"),
    )


def tail_sample(
    spans: DataFrame,
    *,
    trace_col: str = "trace_id",
    keep_fraction: float = 0.1,
    status_col: str | None = "status_code",
    error_code: int = 2,
    start_col: str = "start_timestamp",
    end_col: str = "end_timestamp",
    slow_threshold_us: int | None = None,
    seed: str = "",
    method: str = "xxhash64",
    with_decision: bool = False,
    keep_untraced: bool = False,
) -> DataFrame:
    """Tail-based trace sampling (the OTel ``tailsampling`` processor
    analog — the decision is made per COMPLETE trace, after all its spans
    are seen, which is exactly what a batch/window over ingested spans
    gives you):

    * **error policy** — any span with ``status_col == error_code`` keeps
      the whole trace;
    * **latency policy** — trace wall duration (max end − min start) ≥
      ``slow_threshold_us`` keeps it (only when a threshold is given);
    * **probabilistic policy** — otherwise keep iff
      ``hash(trace_id) < keep_fraction``: a deterministic per-TRACE hash
      (``functions/sampling.py`` bucket convention — ``xxhash64``
      throughput path, ``md5`` SQL-recomputable twin), so two runs, a
      retried stage, or the two halves of a split window agree trace-for-
      trace, and a trace is always kept or dropped WHOLE.

    Output: the surviving spans, unchanged (every span of a kept trace);
    ``with_decision=True`` adds ``sample_decision``
    ('error' > 'slow' > 'probabilistic' priority).  Spans with a NULL
    ``trace_col`` have no trace to decide — they are DROPPED by default
    (they would otherwise pool into one false mega-trace); pass
    ``keep_untraced=True`` to retain them all (decision 'untraced').

    Plan: ONE hash aggregate on ``trace_col`` (map-side partials; the same
    bounded spans-per-trace argument as :func:`trace_rollup` — no hot
    keys) folds all three policies, then ONE equi-join of spans against
    the per-trace decisions on the same high-cardinality key.  The
    decision table is one row per kept trace — AQE broadcasts it when the
    sample is small, shuffles on ``trace_col`` when it is not.  Never a
    driver-side collect.
    """
    if not (0.0 <= keep_fraction <= 1.0):
        raise ValueError(f"keep_fraction must be in [0, 1], got {keep_fraction}")
    if slow_threshold_us is not None and slow_threshold_us < 0:
        raise ValueError(f"slow_threshold_us must be >= 0, got {slow_threshold_us}")
    if method not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash method {method!r} (expected xxhash64|md5)")
    missing = [
        c
        for c in [trace_col]
        + ([status_col] if status_col is not None else [])
        + ([start_col, end_col] if slow_threshold_us is not None else [])
        if c not in spans.columns
    ]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    traced = spans.where(F.col(trace_col).isNotNull())
    aggs = [
        (
            F.max(F.when(F.col(status_col) == error_code, 1).otherwise(0))
            if status_col is not None
            else F.lit(0)
        ).alias("_err"),
    ]
    if slow_threshold_us is not None:
        aggs.append(
            (
                F.unix_micros(F.max(end_col).cast("timestamp"))
                - F.unix_micros(F.min(start_col).cast("timestamp"))
            ).alias("_wall_us")
        )
    per_trace = traced.groupBy(F.col(trace_col).alias("_tid")).agg(*aggs)

    # sampling.py's micro-bucket convention: [0, 1e6) from the salted key
    salted = F.concat(F.col("_tid").cast("string"), F.lit(seed))
    if method == "xxhash64":
        bucket = F.pmod(F.xxhash64(salted), F.lit(1_000_000))
    else:
        bucket = (
            F.conv(F.substring(F.md5(salted), 1, 7), 16, 10).cast("long")
            % 1_000_000
        )
    keep_micro = int(round(keep_fraction * 1_000_000))
    decision = F.when(F.col("_err") == 1, F.lit("error"))
    if slow_threshold_us is not None:
        decision = decision.when(
            F.col("_wall_us") >= int(slow_threshold_us), F.lit("slow")
        )
    decision = decision.when(bucket < keep_micro, F.lit("probabilistic"))
    kept = (
        per_trace.withColumn("_decision", decision)
        .where(F.col("_decision").isNotNull())
        .select("_tid", "_decision")
    )

    cols = spans.columns
    out = traced.join(kept, traced[trace_col] == kept["_tid"], "inner")
    if with_decision:
        out = out.select(*cols, F.col("_decision").alias("sample_decision"))
    else:
        out = out.select(*cols)
    if keep_untraced:
        untraced = spans.where(F.col(trace_col).isNull())
        if with_decision:
            untraced = untraced.select(
                *cols, F.lit("untraced").alias("sample_decision")
            )
        out = out.unionByName(untraced)
    return out


def span_metrics(
    spans: DataFrame,
    *,
    service_col: str = "service",
    name_col: str = "name",
    ts_col: str = "start_timestamp",
    window_s: float = 60.0,
    duration_col: str = "duration_us",
    bounds: tuple[float, ...] = (1_000.0, 10_000.0, 100_000.0, 1_000_000.0),
    status_col: str | None = "status_code",
    error_code: int = 2,
    exemplar_col: str | None = None,
) -> DataFrame:
    """RED metrics from spans — the OTel ``spanmetrics`` connector analog:
    per ``(service, span name, tumbling window)``, request count, error
    count, and an OTLP explicit-bounds duration histogram whose output
    shape (``bucket_counts``/``explicit_bounds``) feeds
    :func:`histogram_quantile` directly — spans in, dashboards'
    p50/p95/p99 out, no metrics backend in between.

    Bucket semantics are OTLP's (non-cumulative, upper-inclusive): bucket
    0 counts ``duration <= bounds[0]``, bucket i counts ``bounds[i-1] <
    duration <= bounds[i]``, the last bucket ``> bounds[-1]``.  Spans with
    a NULL duration count toward ``n_calls``/``n_errors`` but no bucket
    (their latency is unknown — inventing a bucket would skew quantiles);
    ``duration_sum`` likewise skips them.

    ``exemplar_col`` (e.g. ``"span_id"`` or ``"trace_id"``) adds
    ``exemplars`` — per bucket, the MINIMUM exemplar value among that
    bucket's spans (OTel exemplars: "click the p99 spike, open a real
    trace").  The min pick is deterministic under any partitioning and
    ANSI-replayable; a bucket with no spans holds NULL.

    Plan: ONE hash aggregate on ``(service, name, window)`` — every bucket
    is a conditional sum (and optionally a conditional min) riding the
    same aggregate (map-side partials), so a 10^12-span scan shuffles one
    row per (service, operation, window), the cardinality of the
    DASHBOARD, not of the traffic.  Pure JVM expressions end to end.
    """
    if window_s <= 0:
        raise ValueError(f"window_s must be > 0, got {window_s}")
    if not bounds or list(bounds) != sorted(bounds) or len(set(bounds)) != len(bounds):
        raise ValueError(f"bounds must be non-empty and strictly increasing, got {bounds}")
    missing = [
        c
        for c in [service_col, name_col, ts_col, duration_col]
        + ([status_col] if status_col is not None else [])
        + ([exemplar_col] if exemplar_col is not None else [])
        if c not in spans.columns
    ]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    width = float(window_s)
    w = F.floor(
        F.col(ts_col).cast("timestamp").cast("double") / F.lit(width)
    ).cast("long")
    dur = F.col(duration_col).cast("double")
    conds = []
    for i in range(len(bounds)):
        c = dur <= F.lit(float(bounds[i]))
        if i > 0:
            c = c & (dur > F.lit(float(bounds[i - 1])))
        conds.append(c)
    conds.append(dur > F.lit(float(bounds[-1])))
    bucket_aggs = [
        F.sum(F.when(c, 1).otherwise(0)).alias(f"_b{i}") for i, c in enumerate(conds)
    ]
    if exemplar_col is not None:
        bucket_aggs += [
            F.min(F.when(c, F.col(exemplar_col))).alias(f"_x{i}")
            for i, c in enumerate(conds)
        ]
    err = (
        F.sum(F.when(F.col(status_col) == error_code, 1).otherwise(0))
        if status_col is not None
        else F.lit(0).cast("long")
    )
    agg = (
        spans.groupBy(
            F.col(service_col).alias("service"),
            F.col(name_col).alias("name"),
            w.alias("_w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            err.alias("n_errors"),
            F.sum(dur).alias("duration_sum"),
            *bucket_aggs,
        )
    )
    return agg.select(
        "service",
        "name",
        (F.col("_w") * width).cast("timestamp").alias("window_start"),
        "n_calls",
        "n_errors",
        "duration_sum",
        F.array(*[F.col(f"_b{i}") for i in range(len(conds))]).alias("bucket_counts"),
        F.array(*[F.lit(float(b)) for b in bounds]).alias("explicit_bounds"),
        *(
            [F.array(*[F.col(f"_x{i}") for i in range(len(conds))]).alias("exemplars")]
            if exemplar_col is not None
            else []
        ),
    )
