"""`throttle` — rate-limit to `threshold` events per `window_secs`,
optionally per `key_field` (T5).

Reference: config_panel.rs:1671-1709 — options threshold (default 10),
window_secs (default 1.0), key_field (optional; "" = global).

Spark batch semantics (documented delta from the reference's arrival-order
streaming): events are bucketed by EVENT time (floor(ts / window_secs)), and
within each (key, bucket) the first `threshold` rows by (ts, tiebreaker) are
kept.  Deterministic under any partitioning — required for N vs 4N equality.

Scale note: one shuffle on (key, bucket) via the window; with a key_field the
shuffle is well-spread.  The global (no-key) variant funnels every row of a
bucket through one task — correct but deliberately discouraged at 100 TB, as
in Vector where a global throttle is single-threaded by nature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def throttle(
    df: DataFrame,
    ts_col: str,
    threshold: int = 10,
    window_secs: float = 1.0,
    key_field: str | list[str] | None = None,
    tiebreaker: str | None = None,
) -> DataFrame:
    """Keep at most `threshold` rows per key per window bucket."""
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(int(window_secs)))
    keys = []
    if key_field:
        keys = [key_field] if isinstance(key_field, str) else list(key_field)
    order = [F.col(ts_col)]
    if tiebreaker:
        order.append(F.col(tiebreaker))
    w = Window.partitionBy(*[F.col(k) for k in keys], bucket).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= threshold)
        .drop("_rn")
    )
