#!/usr/bin/env python
"""Measure the copy-on-write row ops at 1M rows: how much of the table a
clustered DELETE and a Bloom-probed trickle MERGE actually touch.

Builds a 1M-doc table (8 partitions), compacts it into 8 files per
partition clustered by warc_ts, collects min/max stats (warc_ts) + Bloom
filters (url), then times:

  * delete of a ~5% warc_ts window WITH vs WITHOUT the min/max prune;
  * a 1000-key url upsert WITH vs WITHOUT Bloom candidate narrowing;
  * a SCATTERED-predicate delete (~14% of rows, every file dirty — COW's
    worst case) in copy-on-write vs merge-on-read mode, plus MOR's two
    deferred costs: the per-read anti-join amplification and the one-off
    materialize_deletes rewrite.

Writes bench_results/row_ops.json and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_spark import synth
from vector_spark.plans import checkpoint as CP
from vector_spark.plans import table_format as TF
from vector_spark.session import get_spark

N_ROWS = int(os.environ.get("ROW_OPS_BENCH_ROWS", 1_000_000))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "row_ops.json")


def build_table(spark, base: str) -> None:
    docs = CP.with_part_key(synth.documents(spark, N_ROWS), n_parts=8, key_cols=["url"])
    TF.write_multi_sink({"logs": docs.drop("html")}, base, run_id="bench")
    TF.compact_table(spark, base, "logs", max_files=1, target_files=8,
                     cluster_by="warc_ts")
    TF.collect_file_stats(spark, base, "logs", ["warc_ts"])
    # Multi-key probing (merge_upsert) needs per-key FP ≪ 1/(keys × files):
    # the default 16 KB / k=2 filter (~2% FP at 16k rows) false-positives on
    # SOME of 1000 keys for every file.  m=2^20, k=4 → ~1e-5 per key.
    TF.collect_file_blooms(spark, base, "logs", "url", bits=1 << 20, hashes=4)


def ts_window(spark, base):
    lo, hi = (
        TF.read_table(spark, base, "logs")
        .agg(F.min("warc_ts"), F.max("warc_ts"))
        .collect()[0]
    )
    span = hi - lo
    w_lo = lo + span * 0.50
    w_hi = lo + span * 0.55
    return w_lo, w_hi


def main() -> None:
    spark = get_spark("row_ops_bench")
    spark.range(1000).selectExpr("sum(id)").collect()
    result = {"rows": N_ROWS}

    for mode in ("pruned", "unpruned"):
        base = tempfile.mkdtemp(prefix=f"row_ops_{mode}_")
        try:
            build_table(spark, base)
            w_lo, w_hi = ts_window(spark, base)
            pred = (F.col("warc_ts") >= F.lit(w_lo)) & (F.col("warc_ts") <= F.lit(w_hi))
            t0 = time.perf_counter()
            res = TF.delete_where(
                spark, base, "logs", pred,
                prune=("warc_ts", w_lo, w_hi) if mode == "pruned" else None,
            )
            res["sec"] = round(time.perf_counter() - t0, 3)
            result[f"delete_{mode}"] = res
        finally:
            shutil.rmtree(base, ignore_errors=True)

    for mode in ("nobloom", "bloom"):
        base = tempfile.mkdtemp(prefix=f"row_ops_{mode}_")
        try:
            build_table(spark, base)
            # Trickle-merge shape: the update keys come from ONE data file (a
            # re-crawled segment), not uniformly from the whole table — the
            # case Bloom narrowing exists for.  Uniform keys would make every
            # file genuinely dirty and there would be nothing to skip.
            manifest = TF.CommitLog(base).manifest()["logs"]
            part0 = sorted(manifest)[0]
            seg = os.path.join(base, "logs", f"{CP.PART_COL}={part0}",
                               manifest[part0]["files"][0])
            upd = (
                spark.read.option("basePath", os.path.join(base, "logs"))
                .parquet(seg)
                .limit(1000)
                .withColumn("text", F.concat(F.col("text"), F.lit(" [v2]")))
                .localCheckpoint()
            )
            n_upd = upd.count()
            # Counts from run 1 (clean table); wall = best of 2 (run 1 pays
            # plan codegen; run 2 re-merges the same keys — same work shape).
            secs = []
            first = None
            for _ in range(2):
                t0 = time.perf_counter()
                res = TF.merge_upsert(
                    spark, base, "logs", upd, key_cols=["url"],
                    probe_bloom=(mode == "bloom"),
                )
                secs.append(round(time.perf_counter() - t0, 3))
                first = first or res
            first["sec"] = min(secs)
            first["update_rows"] = n_upd
            result[f"merge_{mode}"] = first
        finally:
            shutil.rmtree(base, ignore_errors=True)

    # COW vs MOR on a scattered predicate: lang is uniform across files, so
    # deleting one lang dirties EVERY file — copy-on-write rewrites the whole
    # table, merge-on-read writes only the matched positions.
    for mode in ("copy-on-write", "merge-on-read"):
        base = tempfile.mkdtemp(prefix="row_ops_mor_")
        try:
            build_table(spark, base)
            t0 = time.perf_counter()
            res = TF.delete_where(spark, base, "logs", "lang = 'de'", mode=mode)
            res["sec"] = round(time.perf_counter() - t0, 3)
            secs = []
            for _ in range(2):  # read-side cost (best of 2: run 1 pays codegen)
                t0 = time.perf_counter()
                res["read_rows"] = TF.read_table(spark, base, "logs").count()
                secs.append(round(time.perf_counter() - t0, 3))
            res["read_sec"] = min(secs)
            if mode == "merge-on-read":
                t0 = time.perf_counter()
                res["materialize"] = TF.materialize_deletes(spark, base, "logs")
                res["materialize"]["sec"] = round(time.perf_counter() - t0, 3)
            result[f"delete_scattered_{mode.replace('-', '_')}"] = res
        finally:
            shutil.rmtree(base, ignore_errors=True)

    # CDC upsert: 20 micro-batches of 1000 keys each via upsert_keys (ONE
    # atomic snapshot per batch, NO table scan) — the per-batch latency is
    # the number that must stay O(batch) for streaming upserts into a
    # 100 TB table.  Compare merge_upsert's per-batch cost above (which
    # scans candidate files every call).
    base = tempfile.mkdtemp(prefix="row_ops_cdc_")
    try:
        build_table(spark, base)
        tbl = TF.read_table(spark, base, "logs")
        batch = tbl.limit(1000).localCheckpoint()
        secs = []
        for i in range(20):
            b = batch.withColumn("text", F.concat(F.col("text"), F.lit(f" [g{i}]")))
            t0 = time.perf_counter()
            TF.upsert_keys(spark, base, "logs", b, ["url"], run_id=f"bench-{i}")
            secs.append(round(time.perf_counter() - t0, 3))
        res = {
            "batches": 20,
            "batch_rows": 1000,
            "sec_first": secs[0],
            "sec_median": sorted(secs)[len(secs) // 2],
            "sec_total": round(sum(secs), 3),
        }
        t0 = time.perf_counter()
        res["read_rows_20_pending"] = TF.read_table(spark, base, "logs").count()
        res["read_sec_20_pending"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        res["materialize"] = TF.materialize_deletes(spark, base, "logs")
        res["materialize"]["sec"] = round(time.perf_counter() - t0, 3)
        result["cdc_upsert_stream"] = res
    finally:
        shutil.rmtree(base, ignore_errors=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
