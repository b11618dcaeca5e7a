"""Skewed-corpus LSH measurement + star-CC timing (VERDICT r3 items 2 & 3).

Two questions, measured rather than argued:

1. **Hot-bucket cap.**  A template family of F near-identical docs floods
   every MinHash band bucket: the band self-join emits ~bands·F²/2 candidate
   rows before the pair-distinct.  `max_bucket` drops the flooded buckets up
   front.  This tool builds a corpus of N random-text docs + an F-doc
   template family (near-identical, NOT byte-equal — exact dedup cannot
   remove them) and times candidate generation uncapped vs capped, recording
   candidate-pair counts and the per-band-bucket maximum (the max-task-input
   proxy: the largest single bucket is what one join task must hold).

2. **Star CC.**  large-star/small-star on (a) a 1M-node easy graph (200k
   5-cliques — the dedup shape) vs plain label propagation, and (b) a graph
   containing a 10k-node PATH (diameter 10k): label propagation would need
   10k rounds (hopeless), star converges in O(log n) alternations.

Writes bench_results/skew_cc_r4.json and prints it.

Usage: python tools/skew_bench.py [N_corpus] [F_family]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_spark.functions import connected_components, minhash_lsh_pairs  # noqa: E402
from vector_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "skew_cc_r4.json")


def build_corpus(spark, n_corpus: int, n_family: int):
    """Random 30-word docs (selective shingles) + an n_family template family
    differing only in one trailing slot word — J ≈ 0.93 pairwise, so the
    family is a real near-dup clique, invisible to exact dedup."""
    vocab = 5000
    base = spark.range(n_corpus).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit("w"), (F.xxhash64(F.col("id"), F.lit(i)) % vocab).cast("string"))
                for i in range(30)
            ],
        ).alias("text"),
    )
    template = " ".join(f"tmpl{i}" for i in range(30))
    family = spark.range(n_family).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(F.lit(template + " slot"), (F.col("id") % 7).cast("string")).alias("text"),
    )
    return base.unionByName(family)


def time_pairs(docs, max_bucket):
    t0 = time.time()
    pairs = minhash_lsh_pairs(
        docs, "doc_id", n=3, k=64, bands=16, threshold=None, unit="word",
        max_bucket=max_bucket,
    )
    n = pairs.count()
    return round(time.time() - t0, 2), n


def max_band_bucket(docs):
    """Largest (band, bucket) group — the input size of the hottest join task."""
    from vector_spark.functions.dedup import minhash_signatures

    sig = minhash_signatures(docs, "doc_id", n=3, k=64, unit="word").select(
        "doc_id", F.array(*[F.col(f"h{j}") for j in range(64)]).alias("sig")
    )
    r = 4
    rows = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.element_at("sig", b * r + i + 1) for i in range(r)])
                    for b in range(16)
                ]
            )
        ).alias("band", "bucket"),
    )
    return rows.groupBy("band", "bucket").count().agg(F.max("count")).first()[0]


def cc_graphs(spark):
    """(easy 1M-node clique graph, 10k-diameter path graph)."""
    # 200k 5-cliques: ids 5g..5g+4, edges all pairs within a clique
    cliques = spark.range(200_000).select(F.col("id").alias("g")).select(
        F.explode(
            F.expr(
                "transform(flatten(transform(sequence(0,3), a -> "
                "transform(sequence(a+1,4), b -> struct(a, b)))), "
                "p -> struct(g*5 + p.a as id_a, g*5 + p.b as id_b))"
            )
        ).alias("e")
    ).select("e.id_a", "e.id_b")
    path = spark.range(10_000 - 1).select(
        (F.col("id") + 20_000_000).alias("id_a"), (F.col("id") + 20_000_001).alias("id_b")
    )
    return cliques, path


def main() -> None:
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_family = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    spark = get_spark()
    result: dict = {"n_corpus": n_corpus, "n_family": n_family}

    docs = build_corpus(spark, n_corpus, n_family).localCheckpoint(eager=True)
    result["max_band_bucket_rows"] = int(max_band_bucket(docs))

    sec_capped, n_capped = time_pairs(docs, max_bucket=64)
    sec_uncapped, n_uncapped = time_pairs(docs, max_bucket=None)
    result["uncapped"] = {"sec": sec_uncapped, "candidate_pairs": n_uncapped}
    result["capped_64"] = {"sec": sec_capped, "candidate_pairs": n_capped}
    # the family contributes C(F,2) pairs uncapped; capped removes them all
    result["family_pairs_theoretical"] = n_family * (n_family - 1) // 2

    cliques, path = cc_graphs(spark)
    t0 = time.time()
    n_label = connected_components(cliques, max_iters=10, method="label").select(
        "component"
    ).distinct().count()
    result["cc_label_1m_cliques"] = {"sec": round(time.time() - t0, 2), "components": n_label}
    t0 = time.time()
    n_star = connected_components(cliques, method="star").select("component").distinct().count()
    result["cc_star_1m_cliques"] = {"sec": round(time.time() - t0, 2), "components": n_star}
    t0 = time.time()
    n_path = connected_components(path, method="star").select("component").distinct().count()
    result["cc_star_10k_path"] = {"sec": round(time.time() - t0, 2), "components": n_path}
    assert n_label == n_star == 200_000 and n_path == 1

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
