"""Telemetry anomaly detection: rolling-mean bursts and bucketed rate
spikes, in exact integer arithmetic.

The log-pipeline companion to the metrics family (`operators/metrics_conv`):
where Vector's `throttle`/`aggregate` transforms shape event volume, these
detect when volume or magnitude *misbehaves* — the alerting half of an
observability pipeline.  Both detectors are deliberately integer-exact
(milli-quantized values, cross-multiplied comparisons — the repo's micro/
milli doctrine) so their output hash-compares across engines and survives
any partitioning.

* :func:`detect_bursts` — per key, a ROWS window over the PREVIOUS ``window``
  events (ordered by ``(ts, id)`` — the id tiebreak makes frame contents
  deterministic under timestamp ties): flag a row when its value exceeds
  ``k_milli/1000 ×`` the rolling mean, compared as
  ``|v·cnt − sum| · 1000 > k_milli · sum`` — no division anywhere.
  Rows with fewer than ``min_prev`` predecessors never flag (cold start).
* :func:`rate_spikes` — bucket events per key into ``bucket_s``-second
  tumbling windows (one hash aggregate), then flag buckets whose count
  exceeds ``ratio_milli/1000 ×`` the previous bucket's via ``lag`` —
  ``cnt · 1000 > ratio_milli · prev_cnt``.  Missing previous bucket (gap
  or first) never flags.

Scale notes (100 TB): detect_bursts is one shuffle keyed on ``key_cols``
(the window partition); hot keys are bounded by the per-key event rate, and
a runaway key degrades to a single-task sort — salt upstream if one key is
>1 % of the corpus.  rate_spikes is a hash aggregate (map-side combined)
plus a per-key lag window over the BUCKETED table — cardinality
keys × time-buckets, orders of magnitude smaller than the input.  Both
plans are pure JVM codegen; neither touches Python.

Positive-value assumption: the burst comparison flags only when the rolling
sum is positive (telemetry rates/latencies/sizes); zero or negative rolling
sums never flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MILLI = 1_000


def detect_bursts(
    df: DataFrame,
    *,
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
    key_cols: list[str] | None = None,
    window: int = 20,
    k_milli: int = 3_000,
    min_prev: int = 5,
) -> DataFrame:
    """Rows whose milli-value exceeds k× the rolling mean of the previous
    ``window`` same-key events.  Returns
    ``(*key_cols, id_col, ts_col, value_milli, prev_cnt, prev_sum_milli)``.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if min_prev < 1:
        raise ValueError(f"min_prev must be >= 1, got {min_prev}")
    if k_milli < 1:
        raise ValueError(f"k_milli must be >= 1, got {k_milli}")
    keys = key_cols if key_cols is not None else ["event_type"]
    v = F.round(F.col(value_col) * MILLI, 0).cast("long")
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-window, -1)
    )
    out = (
        df.withColumn("value_milli", v)
        .withColumn("prev_cnt", F.count("value_milli").over(w))
        .withColumn(
            "prev_sum_milli",
            F.coalesce(F.sum("value_milli").over(w), F.lit(0)).cast("long"),
        )
    )
    flag = (
        (F.col("prev_cnt") >= min_prev)
        & (F.col("prev_sum_milli") > 0)
        & (
            (F.col("value_milli") * F.col("prev_cnt") - F.col("prev_sum_milli"))
            * MILLI
            > F.lit(k_milli) * F.col("prev_sum_milli")
        )
    )
    return out.filter(flag).select(
        *keys, id_col, ts_col, "value_milli", "prev_cnt", "prev_sum_milli"
    )


def rate_spikes(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    bucket_s: int = 600,
    ratio_milli: int = 2_000,
) -> DataFrame:
    """Tumbling-window event counts per key, flagged where a bucket's count
    exceeds ratio× the previous bucket's.  Returns
    ``(*key_cols, bucket_start: timestamp, cnt, prev_cnt)`` for flagged
    buckets only.
    """
    if bucket_s < 1:
        raise ValueError(f"bucket_s must be >= 1, got {bucket_s}")
    if ratio_milli < 1:
        raise ValueError(f"ratio_milli must be >= 1, got {ratio_milli}")
    keys = key_cols if key_cols is not None else ["event_type"]
    epoch = F.unix_timestamp(F.col(ts_col))
    bucket = F.timestamp_seconds((epoch - F.pmod(epoch, bucket_s)).cast("long"))
    counted = (
        df.withColumn("bucket_start", bucket)
        .groupBy(*keys, "bucket_start")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(*keys).orderBy(F.col("bucket_start").asc())
    out = counted.withColumn("prev_cnt", F.lag("cnt", 1).over(w))
    # a gap (empty bucket between two occupied ones) breaks the comparison
    # chain honestly: lag is the previous OCCUPIED bucket; callers wanting
    # strict adjacency should densify upstream.
    flag = F.col("prev_cnt").isNotNull() & (
        F.col("cnt") * MILLI > F.lit(ratio_milli) * F.col("prev_cnt")
    )
    return out.filter(flag).select(*keys, "bucket_start", "cnt", "prev_cnt")
