"""Stupid Backoff LM at the 1M-doc scale (round-4).

Corpus: 1M synthetic docs, 40 words each, generated closed-form from
xxhash64(id, slot) (the spans_dsir_bench discipline — no RNG state, no data
files).  Docs with id%10==0 are the "clean" stratum and draw words from the
LOWER HALF of a 5000-word vocab; the LM trains on that stratum
(ngram_counts, persisted once — the build-once discipline) and scores all
1M docs (stupid_backoff_score: explode → count-table joins → hash agg).

Assert (makes the timing non-vacuous): the clean stratum's mean perplexity
is lower than the rest's — in-domain docs use only grams the LM has seen,
out-of-domain docs back off on ~half their tokens.

Writes bench_results/lm_r4.json and prints it.

Usage: python tools/lm_bench.py [N_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_spark.functions import ngram_counts, stupid_backoff_score  # noqa: E402
from vector_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "lm_r4.json")

WORDS = 40
VOCAB = 5000


def _docs(spark, n: int):
    idc = F.col("id")
    vocab_mod = F.when(idc % 10 == 0, F.lit(VOCAB // 2)).otherwise(F.lit(VOCAB))
    words = [
        F.concat(F.lit("w"), F.pmod(F.xxhash64(F.lit(11), idc, F.lit(s)), vocab_mod))
        for s in range(WORDS)
    ]
    return spark.range(n).select(
        idc.alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
        (idc % 10 == 0).alias("clean"),
    )


def main(n: int = 1_000_000) -> dict:
    spark = get_spark(app_name="lm_bench", cores=32)
    docs = _docs(spark, n).repartition(64).persist()
    docs.count()

    t0 = time.perf_counter()
    counts = ngram_counts(docs.filter("clean"), order=2).persist()
    n_grams = counts.count()
    train_s = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    scored = stupid_backoff_score(docs, counts, order=2)
    agg = scored.join(docs.select("doc_id", "clean"), "doc_id").groupBy("clean").agg(
        F.count(F.lit(1)).alias("docs"), F.avg("ppl").alias("mean_ppl")
    ).collect()
    score_s = round(time.perf_counter() - t0, 3)

    by = {bool(r["clean"]): r for r in agg}
    res = {
        "n_docs": n,
        "count_rows": n_grams,
        "train_sec": train_s,
        "score_sec": score_s,
        "score_docs_per_sec": round(n / score_s, 1),
        "mean_ppl_clean": round(by[True]["mean_ppl"], 2),
        "mean_ppl_rest": round(by[False]["mean_ppl"], 2),
    }
    assert by[True]["mean_ppl"] < by[False]["mean_ppl"], res
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
