#!/usr/bin/env python
"""Measure Z-order file skipping at 1M rows: files scanned + scan wall time
for a 2-D query window under three layouts of the SAME 64-file table —
unclustered, linear sort (cluster_by="x"), and Z-order
(cluster_by=["x", "y"]).

The query is the canonical log-table shape a linear sort cannot serve:
``WHERE x BETWEEN .. AND y BETWEEN ..`` (think warc_ts window × host
range).  A time-sorted table answers the time half and scans everything
for the host half; the Morton layout keeps min/max narrow on BOTH columns,
so the conjunction prunes multiplicatively.  At 100 TB the "files scanned"
column IS the query cost — every surviving file is a ranged GET.

Writes bench_results/zorder.json and prints it.
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

N_ROWS = int(os.environ.get("ZORDER_BENCH_ROWS", 1_000_000))
N_FILES = 64
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "zorder.json")
WIN = [("x", 0, 100_000), ("y", 0, 100_000)]  # 10% × 10% of each dim


def _pred():
    return (F.col("x").between(0, 100_000)) & (F.col("y").between(0, 100_000))


def build(spark, base: str, cluster_by) -> float:
    shutil.rmtree(base, ignore_errors=True)
    dims = spark.range(N_ROWS).select(
        F.col("id"),
        (F.xxhash64(F.col("id"), F.lit("x")) % 1_000_000).alias("x"),
        (F.xxhash64(F.col("id"), F.lit("y")) % 1_000_000).alias("y"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    keyed = CP.with_part_key(dims, n_parts=1, key_cols=["id"]).repartition(N_FILES)
    TF.write_multi_sink({"t": keyed}, base)
    t0 = time.perf_counter()
    if cluster_by is not None:
        TF.compact_table(spark, base, "t", max_files=1, target_files=N_FILES,
                         cluster_by=cluster_by)
    TF.collect_file_stats(spark, base, "t", ["x", "y"])
    return round(time.perf_counter() - t0, 3)


def measure(spark, base: str) -> dict:
    out = {}
    for tag, kw in (
        ("full_scan", {}),
        ("window_2d", {"prune": WIN}),
        ("window_x", {"prune": WIN[0]}),
        ("window_y", {"prune": WIN[1]}),
    ):
        df = TF.read_table(spark, base, "t", **kw).filter(_pred())
        t0 = time.perf_counter()
        rows = df.count()
        out[tag] = {
            "files": len(TF.read_table(spark, base, "t", **kw).inputFiles()),
            "sec": round(time.perf_counter() - t0, 3),
            "rows": rows,
        }
    return out


def main() -> None:
    spark = get_spark("zorder_bench")
    spark.range(1000).selectExpr("sum(id)").collect()  # JIT warm-up
    result = {"rows": N_ROWS, "n_files": N_FILES,
              "window": "x in [0,100k] AND y in [0,100k] of 1M-value dims"}
    for tag, cluster in (
        ("unclustered", None),
        ("linear_x", "x"),
        ("zorder_xy", ["x", "y"]),
    ):
        base = f"/tmp/zorder_bench_{tag}"
        rewrite_sec = build(spark, base, cluster)
        result[tag] = {"rewrite_sec": rewrite_sec, **measure(spark, base)}
        shutil.rmtree(base, ignore_errors=True)
    counts = {t: result[t]["window_2d"]["rows"]
              for t in ("unclustered", "linear_x", "zorder_xy")}
    assert len(set(counts.values())) == 1, f"layouts disagree: {counts}"
    result["row_counts_equal"] = True
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
