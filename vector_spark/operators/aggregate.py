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


#: mergeable aggregate palette: (base_fn, merge_fn) — merge re-aggregates a
#: finer level's OUTPUT, so only algebraic aggregates qualify (avg is derived
#: as sum/count at read time, never stored).  ``distinct`` is the one
#: warehouse aggregate that is NOT algebraic over raw values — two windows'
#: distinct counts don't add — so it rolls up as a Datasketches HLL sketch
#: (`hll_sketch_agg`, JVM-side): the stored column is the mergeable binary
#: state, coarser grains fold with `hll_union_agg`, and
#: :func:`estimate_distinct` renders counts at read time (relative standard
#: error ≈ 1.04/√2^lgK ≈ 1.6 % at the default lgConfigK=12, constant bytes
#: per group regardless of cardinality).
_MERGEABLE = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "distinct": (lambda c: F.hll_sketch_agg(c), F.hll_union_agg),
    # merge-only kind emitted by rollup_merge_aggs for already-sketched
    # columns (a fine level read back from a sink)
    "distinct_merge": (F.hll_union_agg, F.hll_union_agg),
    # power sum Σx² — with count+sum it makes avg/variance/stddev
    # algebraic (avg = Σx/n, var = Σx²/n − (Σx/n)²): store the three
    # sums, derive moments at read time via derive_stats().  The same
    # trick does NOT extend to medians — use the distinct/HLL pattern's
    # sketch philosophy there (percentile_approx at read over raw rows).
    "sumsq": (lambda c: F.sum(F.col(c) * F.col(c)), F.sum),
}

_UNIT_S = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}


def _grain_seconds(g: str) -> int:
    parts = g.split()
    if len(parts) != 2:
        raise ValueError(f"granularity {g!r} must look like '10 minutes'")
    n, unit = int(parts[0]), parts[1].rstrip("s")
    if unit not in _UNIT_S:
        raise ValueError(f"unknown unit in granularity {g!r}")
    return n * _UNIT_S[unit]


def rollup_hypertable(
    df: DataFrame,
    ts_col: str,
    aggs: dict[str, tuple[str, str | None]],
    granularities: tuple[str, ...] = ("1 minute", "1 hour", "1 day"),
    group_by: list[str] | None = None,
) -> dict[str, DataFrame]:
    """TimescaleDB-style continuous-aggregate stack: one rollup per
    granularity, each COARSER level re-aggregated from the previous level's
    output instead of rescanning the base table.

    ``aggs`` maps output column name → ("count"|"sum"|"min"|"max", col)
    (col ignored for count).  Granularities must ascend and nest (each a
    multiple of the previous) so merge-aggregation is exact: count merges by
    sum, sum by sum, min/max by themselves — the algebraic-aggregate rule
    every rollup system relies on (Vector's `aggregate` T8 is the
    single-level special case, config_panel.rs:1831-1861).

    Scale shape: the base table is scanned ONCE (the finest level); every
    coarser level aggregates the much smaller previous rollup — at 10^12
    rows the 1-minute level is ~10^7 rows per key-day and the 1-hour/1-day
    levels are nearly free.  In production each level is a sink table
    (write level k, read it back for k+1); returned here as a lazy dict so
    the caller picks materialization.  Buckets are epoch-aligned tumbling
    windows (`F.window`), so the shuffle key is (bucket, keys) with map-side
    partial combine at every level.
    """
    keys = list(group_by or [])
    secs = [_grain_seconds(g) for g in granularities]
    if sorted(secs) != secs or len(set(secs)) != len(secs):
        raise ValueError(f"granularities must strictly ascend: {granularities}")
    for fine, coarse in zip(secs, secs[1:]):
        if coarse % fine:
            raise ValueError(
                f"granularities must nest (each a multiple of the previous); "
                f"{coarse}s is not a multiple of {fine}s"
            )
    for name, (how, _col) in aggs.items():
        if how not in _MERGEABLE:
            raise ValueError(
                f"aggregate {how!r} for {name!r} is not mergeable "
                f"(supported: {sorted(_MERGEABLE)}); derive avg as sum/count"
            )

    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for g in granularities:
        if prev is None:
            exprs = [
                _MERGEABLE[how][0](col).alias(name)
                for name, (how, col) in aggs.items()
            ]
            level = (
                df.groupBy(F.window(ts_col, g).alias("_w"), *keys)
                .agg(*exprs)
            )
        else:
            exprs = [
                _MERGEABLE[how][1](name).alias(name)
                for name, (how, _col) in aggs.items()
            ]
            level = (
                prev.groupBy(F.window("bucket_start", g).alias("_w"), *keys)
                .agg(*exprs)
            )
        level = (
            level.withColumn("bucket_start", F.col("_w.start"))
            .drop("_w")
            .select("bucket_start", *keys, *aggs.keys())
        )
        out[g] = level
        prev = level
    return out


def rollup_merge_aggs(aggs: dict[str, tuple[str, str | None]]) -> dict[str, tuple[str, str]]:
    """Rewrite an ``aggs`` spec to re-aggregate a ROLLUP's output instead of
    raw rows: count folds by summing the stored counts; sum/min/max fold by
    themselves over their own output column.  Feed the result back into
    ``rollup_hypertable(fine_level, "bucket_start", ...)`` to derive coarser
    grains from an already-materialized fine grain — the refresh step of a
    continuous aggregate (streaming keeps the fine level current; coarser
    levels are cheap batch views over it)."""
    out: dict[str, tuple[str, str]] = {}
    for name, (how, _col) in aggs.items():
        if how not in _MERGEABLE:
            raise ValueError(f"aggregate {how!r} for {name!r} is not mergeable")
        if how in ("count", "sumsq"):
            # stored outputs fold by PLAIN sum — re-applying the base fn
            # would re-count rows / re-square the stored power sums
            out[name] = ("sum", name)
        elif how in ("distinct", "distinct_merge"):
            out[name] = ("distinct_merge", name)
        else:
            out[name] = (how, name)
    return out


def derive_stats(
    df: DataFrame,
    n_col: str,
    sum_col: str,
    sumsq_col: str,
    *,
    prefix: str = "",
) -> DataFrame:
    """Read-time moments from stored power sums: adds ``{prefix}avg``,
    ``{prefix}var`` (population) and ``{prefix}std`` columns derived from
    a rollup's count/sum/sumsq outputs.  Because the three inputs are all
    plain sums, the SAME derivation is exact at every grain and after any
    merge — the algebraic route to mean/variance that percentile-style
    order statistics can't take."""
    n = F.col(n_col).cast("double")
    mean = F.col(sum_col) / n
    var = F.greatest(F.col(sumsq_col) / n - mean * mean, F.lit(0.0))
    return (
        df.withColumn(f"{prefix}avg", mean)
        .withColumn(f"{prefix}var", var)
        .withColumn(f"{prefix}std", F.sqrt(var))
    )


def estimate_distinct(df: DataFrame, sketch_cols: list[str]) -> DataFrame:
    """Render stored HLL sketch columns as approximate distinct counts —
    the read-time half of ``aggs={name: ("distinct", col)}``.  Keeps every
    other column; the sketch columns are REPLACED by their bigint
    estimates (don't ship sketch bytes to a dashboard)."""
    out = df
    for c in sketch_cols:
        out = out.withColumn(c, F.hll_sketch_estimate(F.col(c)))
    return out


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
