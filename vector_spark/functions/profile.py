"""Exact corpus profiling: per-column cardinality, nulls, range, byte mass,
and mode — the data-quality gate a 100 TB curation pipeline runs before and
after every stage (the Deequ/"data unit tests" role, exact-arithmetic only).

One output row per profiled column:

``(col_name, n_rows, n_null, n_distinct, min_val, max_val, total_bytes,
top_value, top_count)``

* ``n_distinct`` is the EXACT distinct count (nulls excluded, both engines'
  ``count(distinct)`` convention).
* ``min_val`` / ``max_val`` / ``top_value`` are rendered through a
  native-type min/max then a string cast truncated to ``trunc`` chars —
  integer and string columns render identically in Spark and DuckDB
  (floating columns do not; profile them at your own risk, or cast first).
* ``total_bytes`` = sum of UTF-8 octet lengths of the string-cast values —
  the "mass if serialized as text" signal that catches a stage silently
  emptying a column even when counts hold.
* ``top_value`` / ``top_count`` = the modal value, ties broken by ascending
  value — a TakeOrderedAndProject over the per-column value histogram.

Shape: per column, ONE hash aggregate for the scalars (count-distinct plans
through Spark's two-phase partial_count(distinct) expand) plus ONE
histogram groupBy for the mode; rows for all columns union into a single
tiny result.  At 100 TB the mode histogram is the expensive half — it
shuffles one row per distinct value; run the profiler on the columns you
govern, not SELECT *.  An ``approx`` variant trades the exact distinct/mode
for ``approx_count_distinct`` and drops the mode scan entirely — the scale
path when ±2 % is fine (not oracle-comparable, so the contract row pins the
exact path).

Reference scope: the reference surfaces per-component event/byte counters
(`shared/src/messages.rs:104-122`); this generalizes that observability to
column-level corpus accounting.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _profile_one(df: DataFrame, col: str, trunc: int, approx: bool) -> DataFrame:
    c = F.col(col)
    cs = c.cast("string")
    distinct = (
        F.approx_count_distinct(col) if approx else F.count_distinct(col)
    ).alias("n_distinct")
    base = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
        distinct,
        F.substring(F.min(c).cast("string"), 1, trunc).alias("min_val"),
        F.substring(F.max(c).cast("string"), 1, trunc).alias("max_val"),
        F.coalesce(F.sum(F.octet_length(cs)), F.lit(0)).cast("long").alias("total_bytes"),
    )
    if approx:
        top = None
    else:
        hist = (
            df.filter(c.isNotNull())
            .groupBy(cs.alias("v"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # limit(1) then a global agg so an all-null column still yields one
        # (null, null) row instead of annihilating the cross join
        top = (
            hist.orderBy(F.col("cnt").desc(), F.col("v").asc())
            .limit(1)
            .agg(
                F.substring(F.first("v"), 1, trunc).alias("top_value"),
                F.first("cnt").alias("top_count"),
            )
        )
    out = base.withColumn("col_name", F.lit(col))
    if top is not None:
        out = out.crossJoin(F.broadcast(top))
    else:
        out = out.withColumn("top_value", F.lit(None).cast("string")).withColumn(
            "top_count", F.lit(None).cast("long")
        )
    return out.select(
        "col_name", "n_rows", "n_null", "n_distinct",
        "min_val", "max_val", "total_bytes", "top_value", "top_count",
    )


def profile_corpus(
    df: DataFrame,
    columns: list[str] | None = None,
    trunc: int = 40,
    approx: bool = False,
) -> DataFrame:
    """Exact (or ``approx``) per-column profile; one row per column."""
    if trunc < 1:
        raise ValueError(f"trunc must be >= 1, got {trunc}")
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    parts = [_profile_one(df, c, trunc, approx) for c in cols]
    return reduce(DataFrame.unionByName, parts)
