#!/usr/bin/env python
"""AQE skew-join: the claimed backstop, demonstrated and measured.

PLANS.md names AQE's skew-join as the fallback when a hot key survives
into a shuffled join (salting is the planned path, AQE the runtime one).
This tool builds the adversarial case — a fact⋈fact join where ONE key
owns ~30% of the left side (the hot-host shape of web logs) — and runs it
twice with identical data: `spark.sql.adaptive.skewJoin.enabled` off and
on.  It asserts the final adaptive plan actually marks the join
`skew=true` when enabled (the partition was split at runtime), and
records both wall times.  Writes bench_results/skew_join.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_spark.session import get_spark

N = int(os.environ.get("SKEW_BENCH_ROWS", 20_000_000))
KEYS = 2_000_000
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "skew_join.json")


def _build(spark):
    # left: ~30% of rows land on key 0, rest uniform — written to parquet so
    # both runs read identical bytes and sizes are realistic for AQE stats
    left = spark.range(N).select(
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .otherwise(F.col("id") % KEYS)
        .alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    right = spark.range(KEYS).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string").cast("binary"), 256).alias("pad"),
    )
    left.write.mode("overwrite").parquet("/tmp/vs_skew_left")
    right.write.mode("overwrite").parquet("/tmp/vs_skew_right")


def _run(spark, skew_enabled: bool) -> tuple[float, str]:
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower())
    # production defaults require the hot partition to exceed 256 MB AND
    # 5x the median — sized for real clusters.  The synthetic hot partition
    # here is ~100 MB, so scale the byte bars down proportionally (both
    # runs get the same values; only `enabled` differs).  At 100 TB any
    # real hot host crosses the stock 256 MB bar on its own.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    # force the shuffled path: the right side (5M+ rows of digests) is over
    # any broadcast bar, but pin it anyway so the comparison is pure SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    left = spark.read.parquet("/tmp/vs_skew_left")
    right = spark.read.parquet("/tmp/vs_skew_right")
    j = left.join(right, "k").select(
        F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n")
    )
    t0 = time.time()
    j.collect()
    sec = round(time.time() - t0, 3)
    plan = j._jdf.queryExecution().executedPlan().toString()
    return sec, plan


def main() -> None:
    spark = get_spark("skew_join_bench")
    _build(spark)
    sec_off, plan_off = _run(spark, False)
    sec_on, plan_on = _run(spark, True)
    assert "skew=true" in plan_on, "AQE did not split the hot partition"
    assert "skew=true" not in plan_off
    res = {
        "rows": N,
        "distinct_keys": KEYS,
        "hot_key_share": 0.3,
        "skewjoin_off_sec": sec_off,
        "skewjoin_on_sec": sec_on,
        "plan_marks_skew": True,
    }
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
