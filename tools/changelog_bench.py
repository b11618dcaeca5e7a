#!/usr/bin/env python
"""Measure incremental (changelog) reads at 1M rows: after a small CDC
batch lands, a downstream consumer either re-reads the whole table
(O(table)) or reads the window's changelog (O(delta)).  The gap is the
point — at 10^12 rows a full re-read per refresh is not a thing, the
changelog is the only plan that survives.

Writes bench_results/changelog.json and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_spark.plans import checkpoint as CP
from vector_spark.plans import table_format as TF
from vector_spark.session import get_spark

N_ROWS = int(os.environ.get("CHANGELOG_ROWS", 1_000_000))
BATCH = int(os.environ.get("CHANGELOG_BATCH", 5_000))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "changelog.json")


def main() -> None:
    spark = get_spark("changelog_bench")
    spark.range(1000).selectExpr("sum(id)").collect()

    base = "/tmp/changelog_bench_tbl"
    shutil.rmtree(base, ignore_errors=True)
    rows = spark.range(N_ROWS).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("url"),
        F.sha2(F.col("id").cast("string"), 256).alias("text"),
        F.col("id").alias("v"),
    )
    t0 = time.perf_counter()
    TF.write_multi_sink(
        {"t": CP.with_part_key(rows, n_parts=32, key_cols=["url"])}, base
    )
    build_sec = time.perf_counter() - t0
    v1 = TF.CommitLog(base).current_version()

    batch = CP.with_part_key(
        spark.range(N_ROWS - BATCH // 2, N_ROWS + BATCH // 2).select(
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("url"),
            F.sha2(F.concat(F.col("id").cast("string"), F.lit("u")), 256).alias("text"),
            (F.col("id") * 7).alias("v"),
        ),
        n_parts=32, key_cols=["url"],
    ).localCheckpoint()
    t0 = time.perf_counter()
    TF.upsert_keys(spark, base, "t", batch, ["url"], run_id="cdc-1")
    upsert_sec = time.perf_counter() - t0
    v2 = TF.CommitLog(base).current_version()

    # downstream refresh, plan A: full re-read + re-aggregate
    t0 = time.perf_counter()
    full = (
        TF.read_table(spark, base, "t")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()[0]
    )
    full_sec = time.perf_counter() - t0

    # plan B: changelog-only delta aggregate (consumer folds it into state)
    t0 = time.perf_counter()
    ch = TF.read_table_changes(spark, base, "t", v1, to_version=v2)
    delta = (
        ch.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    )
    delta_sec = time.perf_counter() - t0

    result = {
        "rows": N_ROWS,
        "batch": BATCH,
        "build_sec": round(build_sec, 3),
        "cdc_upsert_sec": round(upsert_sec, 3),
        "full_refresh_sec": round(full_sec, 3),
        "changelog_refresh_sec": round(delta_sec, 3),
        "speedup": round(full_sec / delta_sec, 1),
        "table_rows_read": int(full["n"]),
        "changelog_rows_read": int(sum(r["n"] for r in delta)),
    }
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
