#!/usr/bin/env python
"""Co-located (bucketed) joins: the 100 TB fact⋈fact strategy, measured.

Broadcast covers dim joins; salting covers skew — but a fact-to-fact join
(events ⋈ user profiles derived from events, sessionization backfills,
cross-day self-joins) shuffles BOTH sides on every query unless the tables
are stored pre-partitioned on the join key.  Spark's bucketed tables
(`bucketBy(n, key).sortBy(key).saveAsTable`) are the parquet analog of
Iceberg's bucket partition transform: each side's files are already hash
partitioned, so the join plans ZERO exchanges — the shuffle is paid once
at write time and amortized over every subsequent join.

This benchmark writes the SAME 10M-row pair of tables plain and bucketed,
runs the same user_id equi-join + aggregate over both, asserts the plan
property (plain: 2 shuffle exchanges; bucketed: 0), and records wall
times.  Writes bench_results/bucket_join.json and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_spark.session import get_spark

N = int(os.environ.get("BUCKET_BENCH_ROWS", 10_000_000))
BUCKETS = 64
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "bucket_join.json")
WAREHOUSE = "/tmp/vector_spark_bucket_wh"


def _exchanges(df) -> int:
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.count("Exchange") - p.count("BroadcastExchange") - p.count("ReusedExchange")


def _bare_join(spark, a: str, b: str):
    return spark.table(a).join(spark.table(b), "user_id")


def _join(spark, a: str, b: str):
    # join + a downstream aggregate on a NON-join key: the agg's own
    # exchange exists in both variants, so the measured delta is purely
    # the two join-input shuffles the bucketed layout avoids
    return _bare_join(spark, a, b).groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")
    )


def _force(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    shutil.rmtree(WAREHOUSE, ignore_errors=True)
    os.makedirs(WAREHOUSE, exist_ok=True)
    # spark.sql.warehouse.dir is STATIC (can't be set through get_spark's
    # post-creation extra_conf); the default resolves to $PWD/spark-warehouse,
    # so chdir into the scratch root before the session exists.
    os.chdir(WAREHOUSE)
    spark = get_spark("bucket_join_bench")
    # AQE rewrites the bucketed plan's empty-relation checks oddly in noop
    # runs on some versions; keep it on (the production default) — the
    # exchange-count assertion below is the property that matters.
    # both sides FACT-sized: the profile side carries a 64-char digest so
    # its on-disk size sits far over any broadcast threshold — this is the
    # fact⋈fact shape (join keyed on user_id, 5M distinct) where broadcast
    # cannot save the plain layout and bucketing is the only shuffle-free
    # plan
    events = spark.range(N).select(
        (F.col("id") % 5_000_000).alias("user_id"),
        (F.col("id") % 997).cast("double").alias("value"),
    )
    profiles = spark.range(5_000_000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 37).alias("seg"),
        F.sha2(F.col("id").cast("string").cast("binary"), 256).alias("profile_digest"),
    )
    for name, df in (("ev", events), ("prof", profiles)):
        df.write.mode("overwrite").saveAsTable(f"plain_{name}")
        (
            df.write.mode("overwrite")
            .bucketBy(BUCKETS, "user_id")
            .sortBy("user_id")
            .saveAsTable(f"bucketed_{name}")
        )

    ex_plain = _exchanges(_bare_join(spark, "plain_ev", "plain_prof"))
    ex_bucketed = _exchanges(_bare_join(spark, "bucketed_ev", "bucketed_prof"))
    assert ex_bucketed == 0, f"bucketed join still shuffles: {ex_bucketed}"
    assert ex_plain >= 2, f"plain join should shuffle both sides: {ex_plain}"

    # warm both paths once, then measure
    _force(_join(spark, "plain_ev", "plain_prof"))
    _force(_join(spark, "bucketed_ev", "bucketed_prof"))
    res = {
        "rows": N,
        "buckets": BUCKETS,
        "exchanges_plain": ex_plain,
        "exchanges_bucketed": ex_bucketed,
        "plain_join_sec": _force(_join(spark, "plain_ev", "plain_prof")),
        "bucketed_join_sec": _force(_join(spark, "bucketed_ev", "bucketed_prof")),
    }
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
