#!/usr/bin/env python
"""Measure COUNT(*) pushdown (count_rows) vs a real scan-count at 1M rows.

Builds a 1M-doc table under spec ``identity(lang) x hour(warc_ts)`` (warc_ts
spread over 48 hours so the layout has real time partitions), collects
per-file stats, then times four counts THREE ways each — count_rows
(metadata ladder), read_table + filter + count (scan), and raw
spark.read.parquet + filter + count (what a user without the manifest pays):

  * all         — no predicate: one commit-log fold vs a full scan;
  * aligned     — a 12-hour hour-aligned window: partition-token proofs;
  * misaligned  — a window with half-hour edges: metadata interior + a
                  residual scan of only the two edge partitions' files;
  * lang_eq     — equality on the identity-partitioned column.

Writes bench_results/count_pushdown.json and prints it.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_spark import synth
from vector_spark.plans import table_format as TF
from vector_spark.session import get_spark

N_ROWS = int(os.environ.get("COUNT_BENCH_ROWS", 1_000_000))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "count_pushdown.json")


def main() -> None:
    spark = get_spark()
    base = tempfile.mkdtemp(prefix="vs_count_bench_")
    result: dict = {"rows": N_ROWS}
    try:
        docs = synth.documents(spark, N_ROWS).drop("html").withColumn(
            "warc_ts",
            F.expr(
                "warc_ts + make_interval(0,0,0,0,0, cast(pmod(xxhash64(url), 2880) as int), 0)"
            ),
        )
        t0 = time.monotonic()
        TF.write_multi_sink(
            {"logs": docs}, base,
            spec=[("identity", "lang"), ("hour", "warc_ts")], run_id="bench",
        )
        result["build_sec"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        TF.collect_file_stats(spark, base, "logs", ["warc_ts"])
        result["stats_sec"] = round(time.monotonic() - t0, 3)
        man = TF.CommitLog(base).manifest()["logs"]
        result["partitions"] = len(man)
        result["files"] = sum(len(i["files"] or ()) for i in man.values())

        lo = dt.datetime(2026, 1, 1, 6)
        cases = {
            "all": (None, None),
            "aligned_12h": (
                ("warc_ts", lo, lo + dt.timedelta(hours=12, microseconds=-1)), None),
            "misaligned": (
                ("warc_ts", lo + dt.timedelta(minutes=30),
                 lo + dt.timedelta(hours=12, minutes=30)), None),
            "lang_eq": (None, ("lang", "en")),
        }
        for name, (prune, prune_eq) in cases.items():
            cond = F.lit(True)
            if prune:
                cond = F.col(prune[0]).between(F.lit(prune[1]), F.lit(prune[2]))
            if prune_eq:
                cond = cond & (F.col(prune_eq[0]) == F.lit(prune_eq[1]))

            audit: dict = {}
            t0 = time.monotonic()
            n_meta = TF.count_rows(
                spark, base, "logs", prune=prune, prune_eq=prune_eq, audit=audit)
            meta_sec = time.monotonic() - t0

            t0 = time.monotonic()
            n_scan = (
                TF.read_table(spark, base, "logs", prune=prune, prune_eq=prune_eq)
                .where(cond).count()
            )
            scan_sec = time.monotonic() - t0

            t0 = time.monotonic()
            n_raw = (
                spark.read.parquet(os.path.join(base, "logs")).where(cond).count()
            )
            raw_sec = time.monotonic() - t0

            assert n_meta == n_scan == n_raw, (name, n_meta, n_scan, n_raw)
            result[name] = {
                "count": n_meta,
                "count_rows_sec": round(meta_sec, 3),
                "pruned_read_count_sec": round(scan_sec, 3),
                "raw_scan_count_sec": round(raw_sec, 3),
                "scanned_files": audit["scanned_files"],
                "scanned_dirs": audit["scanned_dirs"],
                "meta_rows": audit["meta_rows"],
                "stats_rows": audit["stats_rows"],
            }
            print(name, json.dumps(result[name]))
    finally:
        shutil.rmtree(base, ignore_errors=True)
    with open(OUT, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
