"""`dedupe` — drop duplicate events by field list (T6).

Reference: config_panel.rs:1713-1751 — `fields.match` comma-list (default
timestamp/host/message) and an LRU `cache.num_events` (default 5000).  The
cache bounds streaming state; in batch the whole input is the window.

Spark design: `dropDuplicates(fields)` keeps an ARBITRARY row per key —
nondeterministic across partitionings, which breaks the N vs 4N equality
requirement.  We keep the FIRST row by an explicit order (Vector's semantics:
first occurrence passes, later duplicates drop) via row_number, or
min-aggregation when only the key columns are needed.

Scale: one shuffle on the match fields.  For the streaming variant, see
vector_spark.streaming (dropDuplicates + watermark; cache size ≙ state TTL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe(
    df: DataFrame,
    match_fields: list[str],
    order_by: str | list[str] | None = None,
) -> DataFrame:
    """First occurrence per match-field tuple.

    ``order_by`` defines "first" (e.g. event id or timestamp); it must be a
    total order within key for determinism.  When None, falls back to
    dropDuplicates (documented as partitioning-dependent).
    """
    if order_by is None:
        return df.dropDuplicates(match_fields)
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(*match_fields).orderBy(*[F.col(c) for c in order])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
