"""1M-vector similarity profile for the round-3 IVF build/search split.

Clustered corpus (the case IVF exists for): 64 Gaussian clusters, dim 64,
1M vectors.  Measures index build (train + assign + partitionBy("cell")
write), partition-pruned search from the on-disk index, recall vs the
exact numpy brute force, and the fraction of the corpus the search scans.

Run: python tools/profile_similarity_r3.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N, DIM, NCLUSTERS = 1_000_000, 64, 64
NLIST, NPROBE, K, NQUERIES = 64, 8, 10, 8
INDEX = "/tmp/vector_spark_ivf_profile_r3"


def main() -> None:
    from pyspark.sql import functions as F

    from vector_spark.functions import (
        brute_force_topk_numpy,
        ivf_search,
        load_ivf_index,
    )
    from vector_spark.functions.similarity import build_ivf_index
    from vector_spark.session import get_spark

    spark = get_spark("sim_profile_r3")

    # deterministic clustered corpus, generated distributed (no driver array)
    centers = np.random.default_rng(1).standard_normal((NCLUSTERS, DIM)) * 4.0
    bc = spark.sparkContext.broadcast(centers)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(ids[0] if len(ids) else 0)
            c = bc.value[ids % NCLUSTERS]
            vecs = c + rng.standard_normal((len(ids), DIM)) * 0.4
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs.astype(np.float64))})

    corpus = (
        spark.range(N, numPartitions=64)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
    )
    corpus.write.mode("overwrite").parquet("/tmp/sim_profile_corpus")
    corpus = spark.read.parquet("/tmp/sim_profile_corpus")

    queries = {
        int(r.vec_id): list(r.embedding)
        for r in corpus.filter(F.col("vec_id") < NQUERIES).collect()
    }

    shutil.rmtree(INDEX, ignore_errors=True)
    t0 = time.perf_counter()
    build_ivf_index(corpus, INDEX, nlist=NLIST, iters=3)
    build_sec = time.perf_counter() - t0

    # warm + timed search from the on-disk index (partition-pruned scan)
    ivf_search(spark, INDEX, queries, k=K, nprobe=NPROBE).collect()
    t0 = time.perf_counter()
    approx = ivf_search(spark, INDEX, queries, k=K, nprobe=NPROBE).collect()
    search_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    exact = brute_force_topk_numpy(corpus, queries, k=K).collect()
    brute_sec = time.perf_counter() - t0

    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)

    # scanned fractions: union across the batch, and mean per query (the
    # per-query number is what partition pruning buys a single probe)
    idx_df, cents = load_ivf_index(spark, INDEX)
    qmat = np.array([queries[q] for q in sorted(queries)])
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    probes = np.argsort(-(qmat @ cents.T), axis=1)[:, :NPROBE]
    cell_sizes = {
        r.cell: r.n for r in idx_df.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    union_cells = sorted({int(c) for row in probes for c in row})
    union_scanned = sum(cell_sizes.get(c, 0) for c in union_cells)
    per_query = [sum(cell_sizes.get(int(c), 0) for c in row) for row in probes]

    # the single-probe case: one query against the on-disk index
    one_q = {min(queries): queries[min(queries)]}
    ivf_search(spark, INDEX, one_q, k=K, nprobe=NPROBE).collect()
    t0 = time.perf_counter()
    ivf_search(spark, INDEX, one_q, k=K, nprobe=NPROBE).collect()
    one_sec = time.perf_counter() - t0

    print(json.dumps({
        "n": N, "dim": DIM, "nlist": NLIST, "nprobe": NPROBE, "queries": NQUERIES,
        "build_sec": round(build_sec, 2),
        "search_sec_8q": round(search_sec, 2),
        "search_sec_1q": round(one_sec, 2),
        "brute_numpy_sec_8q": round(brute_sec, 2),
        "recall_at_10": round(recall, 3),
        "scanned_fraction_union_8q": round(union_scanned / N, 4),
        "scanned_fraction_per_query": round(sum(per_query) / len(per_query) / N, 4),
    }))


if __name__ == "__main__":
    main()
