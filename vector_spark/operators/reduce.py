"""`reduce` — collapse multiple events into one per group (T7).

Reference: config_panel.rs:1756-1794 — `group_by` comma-list, `ends_when`
VRL condition (closes the window), and a merge-strategies hook
(`update_merge` var, :1766).  Vector merges events of a group into one;
default strategies: first value for scalars, concat for strings is
configurable.

Spark design:
  * plain reduce  = groupBy(keys).agg(strategy per column) — hash aggregate,
    partial (map-side) combine for free, one shuffle on the keys.
  * ends_when     = sessionization: a row matching the condition CLOSES the
    current group, so the next row starts a new one.  Batch implementation:
    flag = condition, session_id = running sum of flag over
    Window.partitionBy(keys).orderBy(ts) shifted so the closing row belongs
    to the session it closes; then groupBy(keys, session_id).

Merge strategies supported (named after Vector's reduce merge strategies):
  first/last/sum/max/min/avg/count/concat/concat_newline/array/
  shortest_array/longest_array/flat_unique/discard/retain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.vrl import compile_condition


def _strategy(col: str, how: str) -> Column:
    if how == "first":
        return F.first(col, ignorenulls=True).alias(col)
    if how == "last":
        return F.last(col, ignorenulls=True).alias(col)
    if how == "sum":
        return F.sum(col).alias(col)
    if how == "max":
        return F.max(col).alias(col)
    if how == "min":
        return F.min(col).alias(col)
    if how == "avg":
        return F.avg(col).alias(col)
    if how == "count":
        return F.count(col).alias(col)
    if how == "concat":
        return F.concat_ws(" ", F.collect_list(col)).alias(col)
    if how == "concat_newline":
        return F.concat_ws("\n", F.collect_list(col)).alias(col)
    if how == "array":
        return F.collect_list(col).alias(col)
    if how == "shortest_array":
        return F.min_by(col, F.size(col)).alias(col)
    if how == "longest_array":
        return F.max_by(col, F.size(col)).alias(col)
    if how == "flat_unique":
        return F.array_distinct(F.flatten(F.collect_list(col))).alias(col)
    if how == "discard":
        # Vector: "discard all but the first value found" (nulls included —
        # unlike `first`, which skips nulls to mirror scalar merge defaults).
        return F.first(col, ignorenulls=False).alias(col)
    if how == "retain":
        # Vector: "discard all but the last value found" (works on nulls).
        return F.last(col, ignorenulls=False).alias(col)
    raise ValueError(f"unknown merge strategy {how!r}")


def reduce_events(
    df: DataFrame,
    group_by: list[str],
    merge: dict[str, str],
    ends_when: str | Column | None = None,
    ts_col: str | None = None,
    count_col: str = "events_merged",
) -> DataFrame:
    """Collapse each group (or each ends_when-delimited session) to one row."""
    keys = list(group_by)
    if ends_when is not None:
        if ts_col is None:
            raise ValueError("ends_when requires ts_col for ordering")
        cond = ends_when if isinstance(ends_when, Column) else compile_condition(ends_when)
        w = Window.partitionBy(*keys).orderBy(ts_col)
        # closing row belongs to the session it closes → cumsum of flags on
        # PRECEDING rows (lag the flag by one before summing)
        flag = F.when(cond, F.lit(1)).otherwise(F.lit(0))
        df = df.withColumn("_flag", flag)
        df = df.withColumn(
            "_session",
            F.coalesce(
                F.sum("_flag").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        ).drop("_flag")
        keys = keys + ["_session"]

    aggs = [_strategy(c, how) for c, how in merge.items()]
    aggs.append(F.count(F.lit(1)).alias(count_col))
    out = df.groupBy(*keys).agg(*aggs)
    if ends_when is not None:
        out = out.drop("_session")
    return out
