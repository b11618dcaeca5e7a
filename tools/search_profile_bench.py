"""BM25 + trained-BPE + profiler at the 1M-doc scale (round-4).

Corpus: 1M synthetic docs, 40 words each, closed-form from xxhash64(id,
slot) (the lm_bench discipline — no RNG state, no files).  Docs with
id % 1000 == 0 form a planted stratum drawing from a disjoint "s<k>"
vocabulary, which makes the BM25 timing non-vacuous: a query of s-words
must rank ONLY stratum docs.

Measured:
  * bm25_build  — postings build (explode + map-side-combined hash agg)
  * bm25_search — 3 queries, k=10, against prebuilt postings (the
    build-once/search-many split, the IVF discipline)
  * bpe_train   — distributed histogram + driver merge loop (200 merges)
  * bpe_encode  — Arrow-batched encode of all 1M docs (memoized per batch)
  * profile     — exact profiler over (doc_id, text, lang)

Writes bench_results/search_bpe_profile_r4.json and prints it.

Usage: python tools/search_profile_bench.py [N_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_spark.functions import (  # noqa: E402
    bm25_postings,
    bm25_topk,
    bpe_token_count_trained,
    bpe_word_counts,
    profile_corpus,
    train_bpe,
)
from vector_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "search_bpe_profile_r4.json")

WORDS = 40
VOCAB = 5000
STRATUM_VOCAB = 50


def _docs(spark, n: int):
    idc = F.col("id")
    planted = idc % 1000 == 0
    words = [
        F.when(
            planted,
            F.concat(F.lit("s"), F.pmod(F.xxhash64(F.lit(13), idc, F.lit(s)),
                                        F.lit(STRATUM_VOCAB))),
        ).otherwise(
            F.concat(F.lit("w"), F.pmod(F.xxhash64(F.lit(11), idc, F.lit(s)),
                                        F.lit(VOCAB)))
        )
        for s in range(WORDS)
    ]
    return spark.range(n).select(
        idc.alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
        F.when(idc % 7 == 0, "en").when(idc % 7 == 1, "de").otherwise("zh").alias("lang"),
    )


def main(n: int = 1_000_000) -> dict:
    spark = get_spark(app_name="search_profile_bench", cores=32)
    docs = _docs(spark, n).repartition(64).persist()
    docs.count()
    res: dict = {"n_docs": n}

    # --- BM25: build once, search many -----------------------------------
    t0 = time.perf_counter()
    postings = bm25_postings(docs).persist()
    res["bm25_postings_rows"] = postings.count()
    res["bm25_build_sec"] = round(time.perf_counter() - t0, 3)

    qdf = spark.createDataFrame(
        [("q1", "s1 s2 s3"), ("q2", "w17 w2042"), ("q3", "s7 w99 w1234")],
        ["query_id", "query"],
    )
    t0 = time.perf_counter()
    hits = bm25_topk(docs, qdf, k=10, postings=postings).collect()
    res["bm25_search_sec"] = round(time.perf_counter() - t0, 3)
    q1_docs = [r.doc_id for r in hits if r.query_id == "q1"]
    assert q1_docs and all(d % 1000 == 0 for d in q1_docs), q1_docs[:5]
    res["bm25_hits"] = len(hits)

    # --- trained BPE -------------------------------------------------------
    t0 = time.perf_counter()
    wc = bpe_word_counts(docs, max_words=200_000)
    merges = train_bpe(wc, num_merges=200)
    res["bpe_histogram_words"] = len(wc)
    res["bpe_merges"] = len(merges)
    res["bpe_train_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    tok = bpe_token_count_trained(docs, merges).agg(
        F.sum("n_bpe").alias("total"), F.count(F.lit(1)).alias("docs")
    ).collect()[0]
    res["bpe_encode_sec"] = round(time.perf_counter() - t0, 3)
    res["bpe_total_tokens"] = tok["total"]
    res["bpe_encode_docs_per_sec"] = round(n / res["bpe_encode_sec"], 1)
    assert tok["docs"] == n
    # merges compress: fewer subwords than raw chars+end-markers
    assert tok["total"] < n * WORDS * 4

    # --- profiler ----------------------------------------------------------
    t0 = time.perf_counter()
    prof = {r.col_name: r for r in
            profile_corpus(docs, ["doc_id", "text", "lang"]).collect()}
    res["profile_sec"] = round(time.perf_counter() - t0, 3)
    assert prof["doc_id"].n_rows == n and prof["doc_id"].n_distinct == n
    assert prof["lang"].n_distinct == 3
    res["profile_lang_top"] = (prof["lang"].top_value, prof["lang"].top_count)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
