#!/usr/bin/env python
"""Measure hidden partitioning at 1M rows: partitions/files scanned + wall
time for the two canonical log-table lookups — a one-day time window and a
single-url point read — against the SAME data in two layouts:

  * flat      — one lineage-keyed table (the pre-spec shim default);
  * spec      — ``write_multi_sink(spec=[("day", ts), ("bucket", url, 16)])``,
                Iceberg's classic web-log layout.

The point of hidden partitioning is that the READER names only data columns
(``prune=("warc_ts", lo, hi)`` / ``prune_eq=("url", u)``) and the recorded
spec turns that into manifest-level partition pruning — no file stats needed,
no layout knowledge in the query.  At 10^12 rows the "partitions scanned"
column is the query cost: a day window over a year-long table touches
1/365th of the manifest, a url lookup 1/16th, before a single footer is read.

Writes bench_results/hidden_part.json and prints it.
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

N_ROWS = int(os.environ.get("HIDDEN_PART_ROWS", 1_000_000))
N_DAYS = 32
N_BUCKETS = 16
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "hidden_part.json")


def make_input(spark):
    """Common-Crawl-shaped rows spread over N_DAYS days x many hosts."""
    return spark.range(N_ROWS).select(
        F.concat(
            F.lit("https://host-"),
            F.pmod(F.xxhash64("id"), F.lit(1000)).cast("string"),
            F.lit("/p/"),
            F.col("id").cast("string"),
        ).alias("url"),
        F.expr(
            f"timestampadd(SECOND, cast(id % 86400 as int), "
            f"timestampadd(DAY, pmod(xxhash64(id, 7), {N_DAYS}), "
            f"timestamp'2026-01-01 00:00:00'))"
        ).alias("warc_ts"),
        F.sha2(F.col("id").cast("string"), 256).alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(4)) + 1).cast("int"),
        ).alias("lang"),
    )


def scan(spark, base, tag, **kw):
    df = TF.read_table(spark, base, "pages", **kw)
    dirs = {os.path.dirname(p) for p in df.inputFiles()}
    t0 = time.perf_counter()
    n = df.count()
    return {
        "partitions": len(dirs),
        "files": len(df.inputFiles()),
        "sec": round(time.perf_counter() - t0, 3),
        "rows": n,
    }


def main() -> None:
    spark = get_spark("hidden_part_bench")
    spark.range(1000).selectExpr("sum(id)").collect()
    docs = make_input(spark)
    day_lo = "2026-01-10 00:00:00"
    day_hi = "2026-01-10 23:59:59.999999"
    probe_url = docs.select("url").first()["url"]
    win_f = F.col("warc_ts").between(day_lo, day_hi)

    result = {"rows": N_ROWS, "days": N_DAYS, "buckets": N_BUCKETS}

    flat_base = "/tmp/hidden_part_flat"
    shutil.rmtree(flat_base, ignore_errors=True)
    keyed = CP.with_part_key(docs, n_parts=32, key_cols=["url"])
    t0 = time.perf_counter()
    TF.write_multi_sink({"pages": keyed}, flat_base)
    result["flat"] = {
        "write_sec": round(time.perf_counter() - t0, 3),
        "day_window": scan(spark, flat_base, "flat",
                           prune=("warc_ts", day_lo, day_hi)),
        "url_lookup": scan(spark, flat_base, "flat", prune_eq=("url", probe_url)),
    }
    result["flat"]["day_window"]["rows_match"] = (
        TF.read_table(spark, flat_base, "pages",
                      prune=("warc_ts", day_lo, day_hi)).filter(win_f).count()
    )

    spec_base = "/tmp/hidden_part_spec"
    shutil.rmtree(spec_base, ignore_errors=True)
    t0 = time.perf_counter()
    TF.write_multi_sink(
        {"pages": docs}, spec_base,
        spec=[("day", "warc_ts"), ("bucket", "url", N_BUCKETS)],
    )
    result["spec"] = {
        "write_sec": round(time.perf_counter() - t0, 3),
        "day_window": scan(spark, spec_base, "spec",
                           prune=("warc_ts", day_lo, day_hi)),
        "url_lookup": scan(spark, spec_base, "spec", prune_eq=("url", probe_url)),
    }
    spec_day = TF.read_table(spark, spec_base, "pages",
                             prune=("warc_ts", day_lo, day_hi)).filter(win_f).count()
    result["spec"]["day_window"]["rows_match"] = spec_day

    # superset guarantee across layouts: identical filtered results
    assert spec_day == result["flat"]["day_window"]["rows_match"], result
    flat_u = TF.read_table(spark, flat_base, "pages",
                           prune_eq=("url", probe_url))
    spec_u = TF.read_table(spark, spec_base, "pages",
                           prune_eq=("url", probe_url))
    assert (flat_u.filter(F.col("url") == probe_url).count()
            == spec_u.filter(F.col("url") == probe_url).count() == 1)
    result["layouts_agree"] = True

    shutil.rmtree(flat_base, ignore_errors=True)
    shutil.rmtree(spec_base, ignore_errors=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
