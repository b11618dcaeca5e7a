"""`log_to_metric` (T9) and `metric_to_log` (T10) — event-kind conversions.

Reference: log_to_metric form config_panel.rs:1799-1827 — options
{type ∈ counter|gauge|histogram|set, field, name, increment_by_value}
(:1812-1822); metric_to_log is palette-only (palette.rs:143).

Spark design: both are reshapes into/out of the METRIC_EVENT_SCHEMA.
log_to_metric with `increment_by_value=false` counts events per tag-set;
with true it sums the field — a hash aggregate (one shuffle on tags).
metric_to_log is a pure projection (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def log_to_metric(
    df: DataFrame,
    metric_name: str,
    field: str,
    metric_type: str = "counter",
    increment_by_value: bool = False,
    tags: list[str] | None = None,
    ts_col: str | None = None,
    namespace: str | None = None,
    approx_set: bool = False,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Derive a metrics-shaped DataFrame from log rows.

    ``approx_set=True`` switches the `set` metric from exact countDistinct
    (per-group distinct state — fine for bounded tag-sets) to
    `approx_count_distinct` (HyperLogLog++, fixed sketch per group, relative
    error ``approx_rsd``) — the 100 TB path, same trade as the summary/
    distribution sketch options."""
    tag_cols = tags or []
    if metric_type == "counter":
        value = F.sum(field) if increment_by_value else F.count(field)
        kind = "incremental"
    elif metric_type == "gauge":
        # Vector's gauge keeps the LATEST value (config_panel.rs:1812-1822) —
        # latest by arrival in a stream, latest by EVENT TIME here.  F.last
        # would return whatever row a partition scan happened to see last;
        # max_by over (ts, value) is deterministic under any partitioning
        # (value itself breaks ts collisions).  The null-guarded ordering
        # makes max_by skip null readings, mirroring last(ignorenulls=True).
        if ts_col is None:
            raise ValueError(
                "gauge needs ts_col: 'latest value' is an ordering statement "
                "and Spark batch has no arrival order"
            )
        value = F.max_by(
            field,
            F.when(F.col(field).isNotNull(), F.struct(F.col(ts_col), F.col(field))),
        )
        kind = "absolute"
    elif metric_type == "set":
        value = (
            F.approx_count_distinct(field, rsd=approx_rsd)
            if approx_set
            else F.countDistinct(field)
        )
        kind = "absolute"
    elif metric_type == "histogram":
        value = F.sum(field)
        kind = "incremental"
    else:
        raise ValueError(f"unknown metric type {metric_type!r}")

    agg = df.groupBy(*tag_cols).agg(
        value.cast("double").alias("value"),
        (F.max(ts_col) if ts_col else F.lit(None).cast("timestamp")).alias("timestamp"),
    )
    return agg.select(
        F.lit(metric_name).alias("name"),
        F.lit(namespace).cast("string").alias("namespace"),
        F.lit(kind).alias("kind"),
        "value",
        F.create_map(
            *[x for t in tag_cols for x in (F.lit(t), F.col(t).cast("string"))]
        ).alias("tags"),
        "timestamp",
    )


def log_to_metric_summary(
    df: DataFrame,
    metric_name: str,
    field: str,
    tags: list[str] | None = None,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    sketch: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """MetricValue::Summary (shared/src/messages.rs:145-183): count, sum, and
    quantile points per tag-set.

    Default: exact percentiles via F.percentile (buffers each group's values
    — fine for bounded tag-sets / audits).  ``sketch=True`` switches to
    `percentile_approx` (Greenwald-Khanna mergeable sketch, O(accuracy)
    state per group, rank error ≤ 1/accuracy) — the 100 TB default, same as
    the distribution metric's sketch sibling.  count/sum stay exact either
    way and the plan shape is identical (one map-side-combined hash agg)."""
    tag_cols = tags or []
    if sketch:
        qcols = [
            F.round(
                F.percentile_approx(F.col(field).cast("double"), F.lit(q), F.lit(accuracy)), 6
            ).alias(f"q{str(q).replace('0.', '')}")
            for q in quantiles
        ]
    else:
        qcols = [
            F.round(F.percentile(field, F.lit(q)), 6).alias(f"q{str(q).replace('0.', '')}")
            for q in quantiles
        ]
    out = df.groupBy(*tag_cols).agg(
        F.count(field).alias("count"),
        F.round(F.sum(field), 6).alias("sum"),
        *qcols,
    )
    return out.withColumn("name", F.lit(metric_name)).withColumn("kind", F.lit("absolute"))


def log_to_metric_histogram(
    df: DataFrame,
    metric_name: str,
    field: str,
    buckets: list[float],
    tags: list[str] | None = None,
) -> DataFrame:
    """MetricValue::Histogram: counts per fixed bucket boundary.  width via
    explicit CASE (codegen) rather than width_bucket so boundaries match
    Vector's upper-bound-inclusive buckets; one hash agg, map-side combined."""
    tag_cols = tags or []
    # NULL field values would fall through every `<=` condition into le_inf,
    # inflating the top bucket while log_to_metric_summary's count(field)
    # excludes them — filter up front so histogram and summary agree on the
    # same event population.
    df = df.where(F.col(field).isNotNull())
    b = sorted(buckets)
    bucket_expr = F.when(F.col(field) <= b[0], F.lit(f"le_{b[0]}"))
    for lo, hi in zip(b, b[1:]):
        bucket_expr = bucket_expr.when(F.col(field) <= hi, F.lit(f"le_{hi}"))
    bucket_expr = bucket_expr.otherwise(F.lit("le_inf"))
    out = (
        df.withColumn("bucket", bucket_expr)
        .groupBy(*tag_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return out.withColumn("name", F.lit(metric_name)).withColumn("kind", F.lit("incremental"))


def log_to_metric_distribution(
    df: DataFrame,
    metric_name: str,
    field: str,
    tags: list[str] | None = None,
    max_samples: int | None = None,
) -> DataFrame:
    """MetricValue::Distribution (shared/src/messages.rs:145-183): the raw
    sample set per tag-set (count, sum, sorted samples).  ``sort_array`` on
    the collected list makes the output deterministic — collect_list order
    is not — which also makes it oracle-checkable (DuckDB list(x ORDER BY x)).

    ``max_samples`` bounds per-group state for scale: `count`/`sum` stay
    exact over every row, but `samples` keeps only the ``max_samples`` rows
    with the smallest xxhash64(value) per tag-set — a deterministic uniform
    subsample (hash order is value order-independent, and hash ties imply
    equal values, so the kept multiset is reproducible).  The cap runs as a
    window row_number — a spillable per-group sort, never an unbounded
    collect_list buffer.  For quantiles-only use at 100 TB, prefer
    :func:`log_to_metric_distribution_sketch` (mergeable fixed-size sketch,
    no sample list at all)."""
    tag_cols = tags or []
    df = df.where(F.col(field).isNotNull())
    if max_samples is None:
        out = df.groupBy(*tag_cols).agg(
            F.count(field).alias("count"),
            F.round(F.sum(field), 6).alias("sum"),
            F.sort_array(F.collect_list(F.col(field).cast("double"))).alias("samples"),
        )
    else:
        part_cols = [F.col(c) for c in tag_cols] or [F.lit(1)]
        w = Window.partitionBy(*part_cols).orderBy(
            F.xxhash64(F.col(field).cast("double")), F.col(field)
        )
        capped = (
            df.withColumn("_rn", F.row_number().over(w))
            .withColumn(
                "_kept",
                F.when(F.col("_rn") <= max_samples, F.col(field).cast("double")),
            )
        )
        out = capped.groupBy(*tag_cols).agg(
            F.count(field).alias("count"),
            F.round(F.sum(field), 6).alias("sum"),
            F.sort_array(F.collect_list("_kept")).alias("samples"),
        )
    return out.withColumn("name", F.lit(metric_name)).withColumn("kind", F.lit("incremental"))


def log_to_metric_distribution_sketch(
    df: DataFrame,
    metric_name: str,
    field: str,
    tags: list[str] | None = None,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch variant of the distribution metric: constant per-group state.

    Instead of the raw sample list, emits `percentile_approx` points (Spark's
    Greenwald-Khanna mergeable quantile sketch — map-side partial sketches
    merge in one shuffle, state O(accuracy) per group regardless of rows).
    Contract vs the exact operator: quantile error ≤ 1/accuracy of rank,
    `count`/`sum` remain exact.  This is the 100 TB default; the exact
    operator is for bounded tag-sets or audits."""
    tag_cols = tags or []
    df = df.where(F.col(field).isNotNull())
    out = df.groupBy(*tag_cols).agg(
        F.count(field).alias("count"),
        F.round(F.sum(field), 6).alias("sum"),
        *[
            F.round(
                F.percentile_approx(F.col(field).cast("double"), F.lit(q), F.lit(accuracy)), 6
            ).alias(f"q{str(q).replace('0.', '')}")
            for q in quantiles
        ],
    )
    return out.withColumn("name", F.lit(metric_name)).withColumn("kind", F.lit("absolute"))


def metric_to_log(df: DataFrame) -> DataFrame:
    """Metric rows → log-shaped rows: tags flatten into a message, the metric
    value/kind become fields (pure projection)."""
    return df.select(
        F.col("timestamp"),
        F.concat_ws(
            " ",
            F.lit("metric"),
            F.col("name"),
            F.col("kind"),
            F.col("value").cast("string"),
        ).alias("message"),
        F.lit("info").alias("level"),
        F.col("name").alias("metric_name"),
        F.col("kind").alias("metric_kind"),
        F.col("value"),
        F.col("tags").alias("fields"),
    )
