"""`aggregate` — metric aggregation over time buckets (T8) and the per-sink
groupBy aggregates of the north rule.

Reference: config_panel.rs:1831-1861 — `interval_ms` (default 10000) and
`mode ∈ {auto, sum, mean}`; Vector folds metrics within each interval.

Spark design: `groupBy(window(ts, interval), keys)` → hash aggregate with
map-side partial combine; exactly one shuffle keyed on (bucket, keys).  The
bucket is computed with `F.window` (or date_trunc for calendar buckets), so
partition pruning on a ts-partitioned table still applies upstream.

`sink_aggregate` is the north-rule shape: event counts + byte totals per
(lang, host, warc_ts bucket) — SURVEY §2.1 T8, FIXTURES §4 `agg_<route>`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate(
    df: DataFrame,
    ts_col: str,
    interval: str = "10 seconds",
    group_by: list[str] | None = None,
    mode: str = "auto",
    value_col: str = "value",
) -> DataFrame:
    """Fold values into (window, keys) buckets.

    mode: sum → F.sum, mean → F.avg, auto → sum for counters (Vector's auto
    folds incremental metrics by sum, absolute by last — batch approximation:
    sum) plus an event count either way.
    """
    keys = group_by or []
    agg_fn = F.avg if mode == "mean" else F.sum
    return (
        df.groupBy(F.window(ts_col, interval).alias("bucket"), *keys)
        .agg(
            agg_fn(value_col).alias(f"{mode}_{value_col}" if mode != "auto" else f"sum_{value_col}"),
            F.count(F.lit(1)).alias("event_count"),
        )
        .withColumn("bucket_start", F.col("bucket.start"))
        .withColumn("bucket_end", F.col("bucket.end"))
        .drop("bucket")
    )


def sink_aggregate(
    df: DataFrame,
    ts_col: str = "warc_ts",
    interval: str = "1 hour",
    keys: tuple[str, ...] = ("lang", "host"),
    bytes_col: str = "content_bytes",
) -> DataFrame:
    """Per-sink aggregate table: event counts + byte totals per
    (lang, host, ts-bucket) — the north-rule per-sink aggregate counts."""
    return (
        df.groupBy(F.window(ts_col, interval).alias("bucket"), *keys)
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(bytes_col).alias("byte_total"),
        )
        .select(
            *keys,
            F.col("bucket.start").alias("bucket"),
            "event_count",
            "byte_total",
        )
    )
