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

Determinism: Vector's first/last/concat are defined by ARRIVAL order — a
single-process stream has one.  A Spark batch job has no arrival order:
partition layout decides what `F.first`/`collect_list` see, so the same
input repartitioned differently would give different answers.  This repo's
batch delta is EVENT-TIME ordering (the same rule t4 sample, t6 dedupe and
t5 throttle already follow), so every order-sensitive strategy orders by
``(ts_col, tiebreaker)`` via ``min_by``/``max_by``/sorted-struct collect
and **requires** ``ts_col`` — calling one without it raises rather than
returning partition-dependent output.  When no ``tiebreaker`` is given the
merged value itself breaks (ts) ties, keeping the result total-ordered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.vrl import compile_condition

#: strategies whose result depends on event order (Vector: arrival order;
#: here: event time) — these REQUIRE ts_col.
ORDER_SENSITIVE = frozenset(
    {"first", "last", "discard", "retain", "concat", "concat_newline", "array", "flat_unique"}
)


def _strategy(col: str, how: str, ord_fields) -> Column:
    """ord_fields(value_col) -> list of alias'd Columns that totally order the
    group's events in event time (or None when no ts_col was supplied)."""
    if how in ORDER_SENSITIVE and ord_fields is None:
        raise ValueError(
            f"merge strategy {how!r} on {col!r} is order-sensitive and needs "
            "ts_col: Spark batch has no arrival order, so without an event-time "
            "ordering the result would depend on partition layout"
        )
    c = F.col(col)

    def _ord() -> Column:
        return F.struct(*ord_fields(col))

    def _sorted_values() -> Column:
        # nulls are excluded BEFORE collecting (collect_list drops the null
        # structs the `when` produces) — same null behavior as the old
        # collect_list(col), but the sort_array makes the order event-time
        # deterministic instead of partition-dependent.
        collected = F.sort_array(
            F.collect_list(
                F.when(c.isNotNull(), F.struct(*ord_fields(col), c.alias("_v")))
            )
        )
        return F.transform(collected, lambda s: s["_v"])

    if how == "first":
        return F.min_by(col, F.when(c.isNotNull(), _ord())).alias(col)
    if how == "last":
        return F.max_by(col, F.when(c.isNotNull(), _ord())).alias(col)
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
        return F.concat_ws(" ", _sorted_values()).alias(col)
    if how == "concat_newline":
        return F.concat_ws("\n", _sorted_values()).alias(col)
    if how == "array":
        return _sorted_values().alias(col)
    if how == "shortest_array":
        # size is the primary key; (ts, tiebreaker) breaks size ties so the
        # pick is stable under repartitioning
        return F.min_by(
            col, F.struct(F.size(col).alias("_sz"), *(ord_fields(col) if ord_fields else []))
        ).alias(col)
    if how == "longest_array":
        return F.max_by(
            col, F.struct(F.size(col).alias("_sz"), *(ord_fields(col) if ord_fields else []))
        ).alias(col)
    if how == "flat_unique":
        # first occurrence in EVENT-TIME order (array_distinct keeps the
        # first hit), not in partition-scan order
        return F.array_distinct(F.flatten(_sorted_values())).alias(col)
    if how == "discard":
        # Vector: "discard all but the first value found" (nulls included —
        # unlike `first`, which skips nulls to mirror scalar merge defaults).
        return F.min_by(col, _ord()).alias(col)
    if how == "retain":
        # Vector: "discard all but the last value found" (works on nulls).
        return F.max_by(col, _ord()).alias(col)
    raise ValueError(f"unknown merge strategy {how!r}")


def reduce_events(
    df: DataFrame,
    group_by: list[str],
    merge: dict[str, str],
    ends_when: str | Column | None = None,
    ts_col: str | None = None,
    count_col: str = "events_merged",
    tiebreaker: str | None = None,
) -> DataFrame:
    """Collapse each group (or each ends_when-delimited session) to one row.

    ``ts_col`` orders events inside a group (required by the order-sensitive
    strategies and by ``ends_when``); ``tiebreaker`` (e.g. a unique event id)
    makes that order total when timestamps can collide — without one, the
    merged column's own value is the final tie-break key (which keeps the
    output deterministic but requires the column to be an orderable type).
    """
    keys = list(group_by)

    if ts_col is None:
        ord_fields = None
    else:
        def ord_fields(value_col: str):  # noqa: E306 — tiny local factory
            fields = [F.col(ts_col).alias("_o0")]
            if tiebreaker is not None:
                fields.append(F.col(tiebreaker).alias("_o1"))
            elif value_col != ts_col:
                fields.append(F.col(value_col).alias("_o1"))
            return fields

    if ends_when is not None:
        if ts_col is None:
            raise ValueError("ends_when requires ts_col for ordering")
        cond = ends_when if isinstance(ends_when, Column) else compile_condition(ends_when)
        order_cols = [ts_col] if tiebreaker is None else [ts_col, tiebreaker]
        w = Window.partitionBy(*keys).orderBy(*order_cols)
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

    aggs = [_strategy(c, how, ord_fields) for c, how in merge.items()]
    aggs.append(F.count(F.lit(1)).alias(count_col))
    out = df.groupBy(*keys).agg(*aggs)
    if ends_when is not None:
        out = out.drop("_session")
    return out
