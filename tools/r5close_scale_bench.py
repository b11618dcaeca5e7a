#!/usr/bin/env python
"""Scale measurements for the round-5-close operators, each on synthesized
inputs big enough to exercise the shuffle paths (not the sf0.1 fixtures):

* ``assemble_multiline`` — 10M log lines over 100k streams (exactly 5
  lines per event: head + 4 stack frames), the gaps-and-islands Window +
  fold.
* ``over_time`` — 50M gauge samples over 100k series × 50 windows, the
  one-shuffle aligned rollup incl. two exact quantiles.
* ``absent_windows`` — same 50M-sample table with a residue class of
  (series, window) cells removed: grid anti-join recovering the planted
  dark cells, verified by count before timing is reported.

Writes bench_results/r5close_scale.json and prints it.  Timings are
end-to-end (noop write) on local[32]; run on an otherwise idle machine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_spark.operators import absent_windows, assemble_multiline, over_time
from vector_spark.session import get_spark

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "r5close_scale.json")

N_LINES = int(os.environ.get("R5_BENCH_LINES", 10_000_000))
N_SAMPLES = int(os.environ.get("R5_BENCH_SAMPLES", 50_000_000))
N_SERIES = 100_000
N_STREAMS = 100_000


def _force(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    spark = get_spark("r5close_scale")
    results: dict[str, object] = {"n_lines": N_LINES, "n_samples": N_SAMPLES}

    # --- multiline: every event is head + 4 frames; line_no globally ordered
    eid = (F.col("id") / 5).cast("long")
    j = F.col("id") % 5
    lines = (
        spark.range(N_LINES)
        .select(
            F.concat(F.lit("s"), (eid % N_STREAMS).cast("string")).alias("host"),
            F.col("id").alias("line_no"),
            F.when(
                j == 0,
                F.concat(F.lit("2024-01-01 ERROR boom "), eid.cast("string")),
            ).otherwise(F.concat(F.lit("  at frame."), j.cast("string"))).alias("message"),
        )
    )
    out = assemble_multiline(lines, r"^\d{4}-", stream_by=["host"])
    results["multiline_events"] = out.count()
    results["multiline_sec"] = _force(
        assemble_multiline(lines, r"^\d{4}-", stream_by=["host"])
    )

    # --- over_time: 100k series × ~50 ten-second windows
    samples = spark.range(N_SAMPLES).select(
        (F.col("id") % N_SERIES).alias("series"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") / N_SERIES).cast("long")
        ).alias("ts"),
        (F.col("id") % 997).cast("double").alias("value"),
        F.col("id").alias("i"),
    )
    results["over_time_sec"] = _force(
        over_time(samples, ["series"], 10, ts_col="ts", quantiles=(0.5, 0.9),
                  tiebreaker="i")
    )

    # --- absent: remove every (series + window) % 23 == 0 cell
    wb = F.floor(F.unix_micros(F.col("ts")) / F.lit(10_000_000)).cast("long")
    dark = samples.filter((F.col("series") + wb) % 23 != 0).select("series", "ts")
    found = absent_windows(dark, ["series"], 10, ts_col="ts")
    results["absent_rows"] = found.count()
    results["absent_sec"] = _force(
        absent_windows(dark, ["series"], 10, ts_col="ts")
    )

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
