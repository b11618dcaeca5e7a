"""End-to-end telemetry analytics — the observability stack this repo
provides on top of the pipeline transforms, run in the order an SRE
workflow would:

    raw log lines → multiline assembly → VRL parse_logfmt →
    windowed counters → counter_rate (Prometheus resets) →
    over_time gauge rollup (p90 latency) →
    absent_windows dead-man check → SLO multi-window burn alerts →
    continuous-aggregate rollup with HLL distinct users →
    emerging-template detection

Every stage is one library operator; this file just sequences them, so it
doubles as the "switching user" walkthrough for the telemetry surface —
each comment names the operator and its contract.

Run: python examples/telemetry_walkthrough.py [n_events]   (defaults 5000)
Used by tests/test_examples.py to keep the walkthrough executable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def run(spark: SparkSession, n_events: int = 5000) -> dict[str, DataFrame]:
    from vector_spark.functions import emerging_templates
    from vector_spark.operators import (
        absent_windows,
        assemble_multiline,
        counter_rate,
        estimate_distinct,
        over_time,
        rollup_hypertable,
        slo_burn_alerts,
    )
    from vector_spark.vrl import compile_condition

    # --- 0. synthesize raw lines: every 5th event is a stack trace whose
    # frames arrive as separate lines (what a file tailer actually emits)
    eid = F.col("id")
    base_ts = 1_699_920_000  # day-aligned
    ev = spark.range(n_events).select(
        eid.alias("eid"),
        F.explode(
            F.when(eid % 5 == 0, F.array(F.lit(0), F.lit(1), F.lit(2)))
            .otherwise(F.array(F.lit(0)))
        ).alias("j"),
    )
    lines = ev.select(
        (F.col("eid") * 10 + F.col("j")).alias("line_no"),
        F.concat(F.lit("h"), (F.col("eid") % 20).cast("string")).alias("host"),
        F.when(
            F.col("j") == 0,
            F.concat(
                F.lit("2024-01-01 "),
                F.when(F.col("eid") % 7 == 0, F.lit("ERROR boom"))
                .otherwise(F.lit("INFO ok")),
                F.lit(" user="), (F.col("eid") % 97).cast("string"),
                F.lit(" dur="), (F.col("eid") % 400).cast("string"), F.lit("ms"),
            ),
        ).otherwise(F.concat(F.lit("  at frame."), F.col("j").cast("string")))
        .alias("message"),
    )

    # --- 1. multiline assembly: stack frames fold into their head line
    events = assemble_multiline(
        lines, r"^\d{4}-", stream_by=["host"], order_by="line_no"
    )

    # --- 2. VRL parse: logfmt-ish fields out of the assembled message
    head = F.split(F.col("message"), "\n").getItem(0)
    m = compile_condition(
        'parse_logfmt(.head)', columns=["head"]
    )
    parsed = events.select(
        "host", "first_line", "message",
        head.alias("head"),
    ).select(
        "host", "first_line",
        F.when(F.col("head").contains("ERROR"), F.lit("error"))
        .otherwise(F.lit("info")).alias("level"),
        F.element_at(m, "user").cast("long").alias("user_id"),
        F.replace(F.element_at(m, "dur"), F.lit("ms"), F.lit(""))
        .cast("double").alias("dur_ms"),
        F.timestamp_seconds(F.lit(base_ts) + F.col("first_line") / 10).alias("ts"),
    )

    # --- 3. counters per (host, level) → Prometheus-style rates
    counts = parsed.groupBy("host", "level", F.window("ts", "10 minutes")).count()
    cum = counts.select(
        "host", "level", F.col("window.start").alias("ts"),
        F.sum("count").over(
            Window.partitionBy("host", "level").orderBy(F.col("window.start"))
        ).alias("value"),
    )
    rates = counter_rate(cum, ["host", "level"], ts_col="ts", value_col="value")

    # --- 4. gauge rollup: latency avg/p90 per host per aligned hour
    latency = over_time(
        parsed.filter(F.col("dur_ms").isNotNull()),
        ["host"], 3600, ts_col="ts", value_col="dur_ms",
        quantiles=(0.9,), tiebreaker="first_line",
    )

    # --- 5. dead-man: hosts that stopped reporting in some window
    absent = absent_windows(parsed, ["host"], 600, ts_col="ts")

    # --- 6. SLO burn: error ratio vs a 1% budget, 5m/1h windows
    slo = slo_burn_alerts(
        parsed.select(
            "ts", "host", (F.col("level") == "error").cast("int").alias("is_error")
        ),
        ["host"], ts_col="ts", error_col="is_error",
        slo_target=0.875, short_s=600, long_s=3600, threshold=1.0,
        keep_all=True,
    )

    # --- 7. continuous aggregate with HLL distinct users per hour/day
    rollup = rollup_hypertable(
        parsed, "ts",
        {"users": ("distinct", "user_id"), "n": ("count", None)},
        ("1 hour", "1 day"), group_by=["host"],
    )
    daily = estimate_distinct(rollup["1 day"], ["users"])

    # --- 8. emerging templates: what NEW log shape appeared vs baseline
    half = parsed.filter(F.col("first_line") < n_events * 5)
    later = parsed.filter(F.col("first_line") >= n_events * 5)
    emerging = emerging_templates(
        later.select(F.concat(F.lit("lvl="), F.col("level")).alias("message")),
        half.select(F.concat(F.lit("lvl="), F.col("level")).alias("message")),
    )

    return {
        "events": events, "parsed": parsed, "rates": rates,
        "latency": latency, "absent": absent, "slo": slo,
        "daily_users": daily, "emerging": emerging,
    }


def main() -> None:
    from vector_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    out = run(get_spark("telemetry_walkthrough"), n)
    for name, df in out.items():
        print(f"{name}: {df.count()} rows")


if __name__ == "__main__":
    main()
