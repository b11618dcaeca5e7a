"""Multi-window SLO burn-rate alerting over raw request/event rows.

Reference semantics: Vector ships per-component error/throughput counters to
a downstream alerting TSDB (shared/src/messages.rs throughput counters;
config_panel.rs observability family) and leaves the alert math to it.  This
operator closes that loop with the standard the industry converged on — the
Google SRE-workbook multi-window multi-burn-rate alert (ch. 5): with an SLO
of ``slo_target``, the error budget is ``1 - slo_target`` and a window's
BURN RATE is ``error_ratio / budget`` (burn 1 = exactly spending the budget;
burn 14.4 on a 99.9 % SLO = the monthly budget gone in 2 days).  An alert
fires for a short window only when BOTH its own burn rate and its containing
long window's burn rate exceed ``threshold``: the long window proves the
errors are sustained (no page on a blip), the short window makes the alert
reset quickly once the incident ends.

Spark design: the raw event scan is touched ONCE — the short-window
aggregate (count + error count per (series, short bucket)) is the only pass
over the data, and the long-window aggregate RE-AGGREGATES those partials
(``long_s`` must be a multiple of ``short_s`` so short buckets nest exactly
inside long ones).  The closing equi-join joins two already-tiny aggregate
tables on (series, long bucket).  At 10^12 events this is one full shuffle
on (series, short bucket) and then metadata-sized work; burn-rate division
uses the same int-count → double shape on both engines, so results are
IEEE-identical and SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def slo_burn_alerts(
    df: DataFrame,
    series_cols: list[str],
    *,
    ts_col: str = "timestamp",
    error_col: str = "is_error",
    slo_target: float = 0.999,
    short_s: int = 300,
    long_s: int = 3600,
    threshold: float = 14.4,
    keep_all: bool = False,
) -> DataFrame:
    """One row per (series, short window) that is FIRING: both the short
    window's and its containing long window's burn rate exceed ``threshold``.

    ``error_col`` is a boolean (or 0/1) per event.  Output columns:
    ``window_start`` (the short window), ``n_events``/``n_errors`` (short
    window), ``burn_short``, ``burn_long``.  Windows with zero events do not
    exist (no rows → no alert — absence-of-traffic alerting is a different
    concern).  ``keep_all=True`` returns every (series, short window) with a
    boolean ``firing`` instead of filtering — the dashboard/backtest form.
    """
    if not series_cols:
        raise ValueError("slo_burn_alerts needs at least one series column")
    if not (0.0 < slo_target < 1.0):
        raise ValueError(f"slo_target must be in (0, 1), got {slo_target}")
    if short_s <= 0 or long_s % short_s != 0:
        raise ValueError(
            f"long_s must be a positive multiple of short_s for exact window "
            f"nesting, got short_s={short_s} long_s={long_s}"
        )
    budget = 1.0 - float(slo_target)
    secs = F.unix_micros(F.col(ts_col).cast("timestamp"))
    sb = F.floor(secs / F.lit(int(short_s) * 1_000_000)).cast("long")
    err = F.col(error_col).cast("int")

    short_agg = (
        df.select(*series_cols, sb.alias("_sb"), err.alias("_e"))
        .groupBy(*series_cols, "_sb")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("_e").cast("long").alias("n_errors"))
    )
    ratio_s = F.col("n_errors").cast("double") / F.col("n_events").cast("double")
    short_agg = short_agg.withColumn("_burn_s", ratio_s / F.lit(budget))

    k = long_s // short_s
    long_agg = (
        short_agg.groupBy(*series_cols, F.floor(F.col("_sb") / k).alias("_lb"))
        .agg(F.sum("n_events").alias("_ne_l"), F.sum("n_errors").alias("_nr_l"))
        .withColumn(
            "_burn_l",
            (F.col("_nr_l").cast("double") / F.col("_ne_l").cast("double")) / F.lit(budget),
        )
        .select(*[F.col(c).alias(f"_r_{c}") for c in series_cols], "_lb", "_burn_l")
    )
    # eqNullSafe: a NULL series value (label missing on the event) is a real
    # group in both aggregates — a plain == join would silently drop it, and
    # a sustained 100 %-error NULL-keyed series would never alert
    cond = [F.col(c).eqNullSafe(F.col(f"_r_{c}")) for c in series_cols] + [
        F.floor(F.col("_sb") / k) == F.col("_lb")
    ]
    joined = short_agg.join(long_agg, on=cond, how="inner")
    firing = (F.col("_burn_s") > threshold) & (F.col("_burn_l") > threshold)
    out = joined.select(
        *series_cols,
        (F.col("_sb") * int(short_s)).cast("timestamp").alias("window_start"),
        "n_events",
        "n_errors",
        F.col("_burn_s").alias("burn_short"),
        F.col("_burn_l").alias("burn_long"),
        firing.alias("firing"),
    )
    if keep_all:
        return out
    return out.where(F.col("firing")).drop("firing")
