"""`filter` — keep events matching a condition, drop the rest (T2).

Reference: config_panel.rs:1449-1614 — condition syntaxes vrl /
datadog_search / is_log / is_metric / is_trace (:1461-1467); example
conditions `.level == "error"`, `.status_code >= 400`, `exists(.user_id)`,
`contains(string!(.message), "error")`, `match(.message, r'ERROR|FATAL')`
(:1544-1581); live usage `contains(string!(.message), ">")`
(config/demo.toml:15-21) and the two-statement
`status = to_int(.status) ?? 200; status >= 400`
(dev/configs/production/vector.toml:32-39).

Spark design: conditions compile to Columns (vector_spark.vrl), so the
filter is a Catalyst `Filter` node — pushed into the parquet scan whenever
the columns allow.  ``with_dropped`` gives the functional-test bookkeeping
(`dropped_count = inputs − outputs`, functional_test.rs:170-174) without a
second scan when the input is cached.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.vrl import compile_condition


def _to_column(
    condition: str | Column,
    event_kind: str = "log",
    condition_type: str = "vrl",
    columns: set[str] | None = None,
) -> Column:
    if isinstance(condition, Column):
        return condition
    if condition_type == "datadog_search":
        from vector_spark.datadog_search import compile_datadog_search

        return compile_datadog_search(condition, columns=columns)
    if condition_type in ("is_log", "is_metric", "is_trace"):
        # Kind-check condition types carry NO source text (the form's
        # vrl|datadog_search|is_log|is_metric|is_trace enum): the filter is
        # the event-kind predicate itself, schema-constant in our typed build.
        return F.lit(condition_type == f"is_{event_kind}")
    if condition_type == "vrl":
        # passing the schema gives Vector's schemaless semantics: a path the
        # event doesn't carry is NULL, not an analysis error
        return compile_condition(condition, event_kind=event_kind, columns=columns)
    raise ValueError(f"unknown condition_type {condition_type!r}")


def filter_events(
    df: DataFrame,
    condition: str | Column,
    event_kind: str = "log",
    condition_type: str = "vrl",
) -> DataFrame:
    """Keep rows where the condition is TRUE (three-valued: NULL drops)."""
    return df.filter(_to_column(condition, event_kind, condition_type, set(df.columns)))


def filter_with_dropped(
    df: DataFrame,
    condition: str | Column,
    event_kind: str = "log",
    condition_type: str = "vrl",
) -> tuple[DataFrame, DataFrame]:
    """Returns (kept, dropped) — dropped includes NULL-condition rows,
    mirroring VRL abort-on-error accounting."""
    cond = _to_column(condition, event_kind, condition_type, set(df.columns))
    kept = df.filter(cond)
    dropped = df.filter(~F.coalesce(cond, F.lit(False)))
    return kept, dropped
