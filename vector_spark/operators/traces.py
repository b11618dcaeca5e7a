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
