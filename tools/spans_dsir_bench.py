"""Duplicate-span dedup + DSIR scoring at the 1M-doc scale (round-4, third pass).

Corpus: 1M synthetic docs, 40 words each from a 5000-word vocab, generated
closed-form from xxhash64(id, slot) (the incremental_bench discipline — no
RNG state, no data files).  Two planted structures make the asserts real:

  * span dedup — 5% of docs ("template family") carry a shared 10-word
    boilerplate span after their 15th word.  With window=8, the 3 windows
    fully inside the span are hot in 50k docs; boundary-straddling windows
    are unique per doc (the neighbors differ), so the op must remove
    EXACTLY the 10 boilerplate tokens from every family doc and nothing
    from anyone else.  Random 8-word windows over a 5000-word vocab do not
    collide at this scale (33M windows vs 5000^8 space).

  * DSIR — docs with id%10==0 draw words from the LOWER HALF of the vocab
    (a distinguishable "target domain"); the target histogram comes from
    those docs, and their mean importance weight must exceed the rest.

Writes bench_results/spans_dsir_r4.json and prints it.

Usage: python tools/spans_dsir_bench.py [N_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_spark.functions import (  # noqa: E402
    dsir_bucket_counts,
    dsir_logratio_micro,
    dsir_score,
    duplicate_span_dedup,
)
from vector_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_results", "spans_dsir_r4.json")

WORDS = 40
VOCAB = 5000
BOILER = " ".join(f"boiler{i}" for i in range(10))


def _docs(spark, n: int):
    idc = F.col("id")
    # target-domain docs (id%10==0) use the lower vocab half
    vocab_mod = F.when(idc % 10 == 0, F.lit(VOCAB // 2)).otherwise(F.lit(VOCAB))
    words = [
        F.concat(F.lit("w"), F.pmod(F.xxhash64(F.lit(7), idc, F.lit(s)), vocab_mod))
        for s in range(WORDS)
    ]
    # the span's neighbor tokens are doc-UNIQUE so boundary-straddling
    # windows cannot repeat across docs (with shared vocab neighbors they
    # legitimately would, by pigeonhole over 50k family docs — the op
    # found that in an earlier draft of this bench)
    body = F.concat_ws(" ", *words[:14], F.concat(F.lit("u"), idc, F.lit("a")))
    tail = F.concat_ws(" ", F.concat(F.lit("u"), idc, F.lit("b")), *words[16:])
    text = F.when(
        idc % 20 == 0,  # 5% template family
        F.concat_ws(" ", body, F.lit(BOILER), tail),
    ).otherwise(F.concat_ws(" ", body, tail))
    return spark.range(n).select(
        idc.alias("doc_id"),
        text.alias("text"),
        (idc % 10 == 0).alias("is_target"),
        (idc % 20 == 0).alias("is_family"),
    )


def main(n: int = 1_000_000) -> dict:
    spark = get_spark(app_name="spans_dsir_bench", cores=32)
    docs = _docs(spark, n).localCheckpoint(eager=True)  # price generation once
    res: dict = {"n_docs": n, "cores": 32}

    # ---- duplicate-span dedup -------------------------------------------
    t0 = time.perf_counter()
    out = duplicate_span_dedup(docs, "doc_id", window=8)
    agg = out.join(docs.select("doc_id", "is_family"), "doc_id").groupBy("is_family").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_tokens_kept").alias("min_kept"),
        F.max("n_tokens_kept").alias("max_kept"),
        F.min("n_tokens").alias("min_tok"),
        F.max("n_tokens").alias("max_tok"),
    ).collect()
    res["span_dedup_sec"] = round(time.perf_counter() - t0, 2)
    stats = {r["is_family"]: r.asDict() for r in agg}
    # family docs: 50 tokens -> exactly the 10 boilerplate tokens removed
    assert stats[True]["min_kept"] == stats[True]["max_kept"] == WORDS, stats
    assert stats[True]["min_tok"] == WORDS + 10, stats
    # everyone else untouched
    assert stats[False]["min_kept"] == stats[False]["max_kept"] == WORDS, stats
    res["span_stats"] = stats

    # ---- DSIR ------------------------------------------------------------
    t0 = time.perf_counter()
    kw = dict(buckets=4096, seed="bench", method="xxhash64")
    raw = dsir_bucket_counts(docs, **kw)
    tgt = dsir_bucket_counts(docs.filter("is_target"), **kw)
    res["dsir_hist_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    lr = dsir_logratio_micro(raw, tgt)
    scored = dsir_score(docs, lr, seed="bench", method="xxhash64")
    means = {
        r["is_target"]: r["m"]
        for r in scored.groupBy("is_target").agg(F.avg("logw").alias("m")).collect()
    }
    res["dsir_score_sec"] = round(time.perf_counter() - t0, 2)
    assert means[True] > means[False], means
    res["dsir_mean_logw"] = {("target" if k else "rest"): round(v, 3) for k, v in means.items()}

    spark.stop()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    return res


if __name__ == "__main__":
    print(json.dumps(main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)))
