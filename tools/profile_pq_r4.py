"""1M-vector PQ profile (round-4): compression, ADC scan speed, recall.

Same clustered corpus as the r3 IVF profile (64 Gaussian clusters, dim 64,
1M vectors).  Measures: codebook train (sampled), encode + persist of the
codes table, the on-disk size of codes vs floats (the compression that
matters at 100 TB), ADC shortlist search from the persisted codes, the
refined (exact re-rank) search, and recall@10 of both against a numpy
brute force over the same corpus.

Run: python tools/profile_pq_r4.py  (prints one JSON line, writes
bench_results/pq_profile_r4.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# 50k clusters × 20 points: every query has ~19 true near neighbors and a
# million far ones — the shape ANN benchmarks actually have.  (A first run
# with 64 clusters × 15,625 points measured recall 0.0125 and taught the
# obvious-in-hindsight lesson: within a 15k-point near-tie ball the true
# top-10 differ from their neighbors by less than the quantization error,
# so NO code-based method can rank them — that corpus is degenerate for
# the metric, not hard.)
N, DIM, NCLUSTERS = 1_000_000, 64, 50_000
M, KSUB, K, SHORTLIST, NQUERIES = 8, 256, 10, 100, 8
CORPUS = "/tmp/pq_profile_corpus_r4"
CODES = "/tmp/vector_spark_pq_codes_r4"
OUT = os.path.join(_REPO, "bench_results", "pq_profile_r4.json")


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from vector_spark.functions import (
        brute_force_topk_numpy,
        pq_encode,
        pq_search,
        train_pq_codebooks,
    )
    from vector_spark.session import get_spark

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

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

    if not os.path.exists(CORPUS):
        (
            spark.range(N, numPartitions=64)
            .mapInPandas(gen, "vec_id long, embedding array<double>")
            .write.mode("overwrite")
            .parquet(CORPUS)
        )
    corpus = spark.read.parquet(CORPUS)

    t0 = time.time()
    books = train_pq_codebooks(corpus, m=M, ksub=KSUB, sample=8192, iters=10)
    t_train = round(time.time() - t0, 2)

    t0 = time.time()
    pq_encode(corpus, books).select("vec_id", "codes").write.mode("overwrite").parquet(CODES)
    t_encode = round(time.time() - t0, 2)
    enc = spark.read.parquet(CODES)

    qrows = corpus.filter(F.col("vec_id") < NQUERIES).collect()
    queries = {r.vec_id: list(r.embedding) for r in qrows}

    t0 = time.time()
    exact = brute_force_topk_numpy(corpus, queries, k=K).collect()
    t_brute = round(time.time() - t0, 2)
    exact_set = {(r.query_id, r.vec_id) for r in exact}

    t0 = time.time()
    adc = pq_search(enc, books, queries, k=SHORTLIST).collect()
    t_adc = round(time.time() - t0, 2)
    short_set = {(r.query_id, r.vec_id) for r in adc}

    t0 = time.time()
    refined = pq_search(
        enc, books, queries, k=K, refine_with=corpus, shortlist=SHORTLIST
    ).collect()
    t_refined = round(time.time() - t0, 2)
    refined_set = {(r.query_id, r.vec_id) for r in refined}

    res = {
        "n_vectors": N, "dim": DIM, "m": M, "ksub": KSUB,
        "codes_bytes_on_disk": _dir_bytes(CODES),
        "floats_bytes_on_disk": _dir_bytes(CORPUS),
        "logical_compression": f"{DIM * 8}B -> {M}B = {DIM * 8 // M}x",
        "train_sec": t_train, "encode_sec": t_encode,
        "brute_force_sec": t_brute,
        "adc_shortlist_sec": t_adc,
        "refined_topk_sec": t_refined,
        "shortlist_recall_at_100": round(len(exact_set & short_set) / len(exact_set), 4),
        "refined_recall_at_10": round(len(exact_set & refined_set) / len(exact_set), 4),
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
