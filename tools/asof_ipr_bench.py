"""As-of join + IP-range enrichment at 10M-row scale (round-4 seventh pass).

Three measured questions:

1. **As-of, uniform keys.**  10M facts / 200k dim rows over 50k keys: the
   union+window plan (one shuffle, no join) vs the bucketed equi-join plan —
   same output (asserted via full-column checksum), what's the cost of each?
2. **As-of, hot key.**  Same data but 20% of the facts collapse onto ONE key
   (the hot-host pathology the north rule names).  The union plan must sort
   the 2M-row key inside one task; the bucketed plan spreads it over
   time-buckets.  Measure both — this is the number that decides which
   method a 10^12-row pipeline uses.
3. **IP-range enrich.**  10M events against a 4096-range table (GeoIP-scale
   density sample) through the /16-prefix broadcast hash join; rate and
   match fraction.

Writes bench_results/asof_ipr_r4.json and prints it.

Usage: python tools/asof_ipr_bench.py [N_facts] [N_dim]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_spark.operators import asof_join, ip_range_enrich  # noqa: E402
from vector_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "asof_ipr_r4.json")

T0 = 1_700_000_000  # epoch base for closed-form timestamps


def build_asof(spark, n_facts: int, n_dim: int, n_keys: int, hot_frac_pct: int):
    """Closed-form facts/dim: key from xxhash64(id), ts spread over ~46 days
    (n_facts·0.4s of traffic).  hot_frac_pct% of facts remap to key 0."""
    key = (F.pmod(F.xxhash64(F.col("id")), F.lit(n_keys))).alias("k")
    if hot_frac_pct:
        key = F.when(
            F.pmod(F.xxhash64(F.col("id"), F.lit("hot")), F.lit(100)) < hot_frac_pct,
            F.lit(0),
        ).otherwise(key).alias("k")
    facts = spark.range(n_facts).select(
        F.col("id").alias("fact_id"),
        key,
        F.timestamp_seconds(
            F.lit(T0) + F.pmod(F.xxhash64(F.col("id"), F.lit("t")), F.lit(int(n_facts * 0.4)))
        ).alias("ts"),
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("state_id"),
        F.pmod(F.xxhash64(F.col("id"), F.lit("dk")), F.lit(n_keys)).alias("k"),
        F.timestamp_seconds(
            F.lit(T0) + F.pmod(F.xxhash64(F.col("id"), F.lit("dt")), F.lit(int(n_facts * 0.4)))
        ).alias("ts"),
    ).groupBy("k", "ts").agg(F.max("state_id").alias("state_id"))
    return facts, dim


def checksum(df):
    """Order-free full-output checksum: sum of row hashes + match count."""
    r = df.agg(
        # mod a prime before summing: 10M × 1e9 stays far below BIGINT max
        # (a raw xxhash64 sum overflows under ANSI mode)
        F.sum(F.pmod(F.xxhash64("fact_id", "k", "state_id"), F.lit(1_000_000_007))).alias("h"),
        F.count("state_id").alias("matched"),
        F.count(F.lit(1)).alias("rows"),
    ).collect()[0]
    return {"h": int(r["h"]), "matched": int(r["matched"]), "rows": int(r["rows"])}


def run_asof(spark, n_facts: int, n_dim: int, n_keys: int, hot_frac_pct: int, tol: float):
    facts, dim = build_asof(spark, n_facts, n_dim, n_keys, hot_frac_pct)
    facts = facts.localCheckpoint()  # materialize inputs once so both
    dim = dim.localCheckpoint()      # methods time pure join work
    out = {}
    for method in ("union", "bucketed"):
        t = time.time()
        res = asof_join(
            facts, dim, on="k", ts_col="ts",
            tolerance_s=tol, method=method,
            bucket_s=tol if method == "bucketed" else None,
        ).select("fact_id", "k", "state_id")
        out[method] = checksum(res)
        out[method]["sec"] = round(time.time() - t, 2)
        out[method]["rows_per_sec"] = round(n_facts / out[method]["sec"])
    assert out["union"]["h"] == out["bucketed"]["h"], "methods disagree!"
    assert out["union"]["rows"] == n_facts
    return out


def run_ipr(spark, n_events: int, n_ranges: int):
    ev = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.pmod(F.col("id") * F.lit(2654435761), F.lit(4294967296)).alias("ip"),
    ).localCheckpoint()
    # n_ranges non-overlapping ranges tiling ~60% of the space
    stride = (2**32) // n_ranges
    i = F.col("id")
    ranges = spark.range(n_ranges).select(
        (i * stride).alias("start_ip"),
        (i * stride + int(stride * 0.6)).alias("end_ip"),
        F.concat(F.lit("r"), i.cast("string")).alias("label"),
    )
    t = time.time()
    res = ip_range_enrich(ev, ranges, "ip")
    r = res.agg(
        F.count(F.lit(1)).alias("rows"), F.count("label").alias("matched")
    ).collect()[0]
    sec = round(time.time() - t, 2)
    assert int(r["rows"]) == n_events, "range overlap duplicated rows"
    return {
        "sec": sec,
        "rows_per_sec": round(n_events / sec),
        "matched_frac": round(int(r["matched"]) / n_events, 4),
        "n_ranges": n_ranges,
    }


def main():
    n_facts = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark(app_name="asof_ipr_bench", cores=32)
    tol = float(n_facts)  # effectively unbounded; both methods fully match

    results = {
        "n_facts": n_facts,
        "n_dim": n_dim,
        "uniform_50k_keys": run_asof(spark, n_facts, n_dim, 50_000, 0, 86_400.0),
        "hot_key_20pct": run_asof(spark, n_facts, n_dim, 50_000, 20, 86_400.0),
        "ip_range_10m_x_4096": run_ipr(spark, n_facts, 4096),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
