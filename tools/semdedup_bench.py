"""SemDeDup at the 1M-vector scale (round-4, fourth pass).

Corpus: 1M synthetic 32-dim vectors generated CLOSED-FORM (the
incremental_bench discipline — no RNG state): vector j of doc id is
sin(31·(id % n_blobs) + j) + jitter, where jitter is a hash-derived
uniform in ±0.3.  That yields n_blobs=2048 well-separated blobs (the
cluster structure spherical k-means is supposed to find) whose
INTRA-blob cosine ≈ 0.96 — below τ — while 10k planted copies
(ids 2M+i, the vector of id i·97 mod 1M plus a 0.005·sin perturbation)
sit at cosine ≈ 1.0.  So the prune must drop (almost exactly) the
planted set: every extra drop is a real τ-crossing, counted and
reported, not hidden.

Measures: k-means training (nlist=2048, 3 iters), the semdedup prune
(route + within-cell dominance join + anti join), and planted recall.

Writes bench_results/semdedup_r4.json and prints it.

Usage: python tools/semdedup_bench.py [N_docs] [nlist] [nprobe]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_spark.functions import semdedup, train_centroids  # noqa: E402
from vector_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NLIST = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
NPROBE = int(sys.argv[3]) if len(sys.argv) > 3 else 1
DIM = 32
N_BLOBS = 2048
N_PLANTED = N // 100
TAU = 0.99


def corpus(spark):
    """(vec_id, embedding) — blobs + planted near-copies, all closed-form JVM."""
    dims = F.sequence(F.lit(0), F.lit(DIM - 1))

    def vec(id_col):
        blob = id_col % N_BLOBS
        return F.transform(
            dims,
            lambda j: F.sin(F.lit(31.0) * blob + j)
            + 0.3 * ((F.xxhash64(id_col, j) % 10000) / F.lit(5000.0) - 1.0),
        )

    base = spark.range(N).select(
        F.col("id").alias("vec_id"), vec(F.col("id")).alias("embedding")
    )
    parent = (F.col("id") * 97) % N
    planted = spark.range(N_PLANTED).select(
        (F.col("id") + 2 * N).alias("vec_id"),
        F.transform(
            vec(parent), lambda x, j: x + 0.005 * F.sin(parent + j)
        ).alias("embedding"),
    )
    return base.unionByName(planted).repartition(64, "vec_id")


def main():
    spark = get_spark(app_name="semdedup_bench")
    df = corpus(spark).localCheckpoint()  # measure the op, not the generator
    n_total = df.count()

    t0 = time.time()
    cents = train_centroids(df, NLIST, "vec_id", "embedding", iters=3)
    t_train = time.time() - t0

    t0 = time.time()
    flagged = semdedup(
        df, "vec_id", threshold=TAU, centroids=cents, keep="min_id", mode="flag", nprobe=NPROBE
    )
    agg = flagged.agg(
        F.sum(F.col("semdedup_drop").cast("long")).alias("dropped"),
        F.sum(
            ((F.col("vec_id") >= 2 * N) & F.col("semdedup_drop")).cast("long")
        ).alias("planted_dropped"),
    ).first()
    t_prune = time.time() - t0

    recall = agg["planted_dropped"] / N_PLANTED
    collateral = int(agg["dropped"]) - int(agg["planted_dropped"])
    out = {
        "n_vectors": n_total,
        "dim": DIM,
        "nlist": NLIST,
        "nprobe": NPROBE,
        "tau": TAU,
        "planted": N_PLANTED,
        "train_sec": round(t_train, 2),
        "prune_sec": round(t_prune, 2),
        "vectors_per_sec_prune": round(n_total / t_prune, 1),
        "planted_recall": round(recall, 4),
        "collateral_drops": collateral,
    }
    os.makedirs("bench_results", exist_ok=True)
    with open("bench_results/semdedup_r4.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
