"""End-to-end web-corpus curation — the full training-data pipeline this
repo provides, run in the order a production curation job would:

    ingest (WARC) → URL canonicalization → domain blocklist →
    C4 line cleaning → Gopher quality rules → PII redaction →
    exact dedup → paragraph dedup → duplicate-span dedup →
    MinHash-LSH near-dup (connected-components keep-canonical) →
    benchmark decontamination → language-stratified sampling →
    DSIR importance scores → trained quality classifier →
    per-language token budgets → sequence packing →
    quality/repetition feature columns → training-shard write

Every stage is one of the library operators; this file just sequences
them, so it doubles as the "switching user" walkthrough: each comment
names the operator and its contract.

Run: python examples/webcorpus_curation.py [n_docs]   (defaults 2000)
Used by tests/test_examples.py to keep the walkthrough executable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def curate(spark: SparkSession, n_docs: int = 2000) -> dict[str, DataFrame]:
    from vector_spark import synth
    from vector_spark.functions import (
        alpha_mix_sample,
        blocklist_filter,
        c4_line_filter,
        canonical_url_dedup,
        connected_components,
        decontaminate,
        dsir_bucket_counts,
        dsir_logratio_micro,
        dsir_score,
        duplicate_span_dedup,
        exact_dedup,
        gopher_quality_filter,
        jaccard_for_pairs,
        lang_id,
        minhash_lsh_pairs,
        pack_offsets,
        paragraph_dedup,
        quality_features,
        redact_pii,
        repetition_features,
        score_quality,
        stratified_sample,
        token_budget_select,
        train_quality_classifier,
    )

    stages: dict[str, DataFrame] = {}

    # 0. The crawl table (url, warc_ts, html, text, lang) — in production
    #    this is `warc_source(...) |> http_response_parts(...)` over the
    #    segment files plus the html→text extract stage.
    docs = synth.documents(spark, n_docs).withColumn(
        "doc_id", F.xxhash64("url")
    ).select("doc_id", "url", "warc_ts", "text", "lang")

    # 1. URL canonicalization: one map-only projection + one hash-agg —
    #    removes recrawl duplicates before any content work.
    canon = canonical_url_dedup(docs)
    docs = docs.join(canon.select("doc_id"), "doc_id", "left_semi")
    stages["url_canonical"] = docs

    # 1b. Domain blocklist (UT1/RefinedWeb-style suffix matching): drop
    #    the two hottest Zipf hosts — in production this is the spam/adult
    #    domain list, broadcast once.
    docs = blocklist_filter(docs, ["host-0000", "host-0001"])
    stages["blocklisted"] = docs

    # 2-3. C4 line cleaning then Gopher document rules (auditable per-rule
    #    booleans; filter on the conjunction).  The synthetic corpus is
    #    punctuation-free word soup, so shape it into 8-word '.'-terminated
    #    lines first — real crawl text arrives already sentence-shaped.
    docs = docs.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace("text", r"((?:\S+ ){7}\S+) ", "$1.\n"),
            r"([^.\n])$", "$1.",
        ),
    )
    docs = c4_line_filter(docs)
    docs = gopher_quality_filter(docs, min_words=10, min_stop_hits=0)
    stages["quality_filtered"] = docs = docs.filter("gopher_keep").select(
        "doc_id", "url", "warc_ts", "text", "lang"
    )

    # 4. PII scrub — fixed regexp_replace chain, order is part of the
    #    semantics (SSN before phone on 3-2-4 digit runs).
    docs = redact_pii(docs)

    # The content ops below return (doc_id, text, …); carry the crawl
    # metadata aside and join it back at the end (one broadcast-eligible
    # join on the surviving ids).
    meta = docs.select("doc_id", "url", "warc_ts", "lang")

    # 5. Exact dedup (normalized): ONE hash-agg shuffle. Run before any
    #    LSH so byte-duplicates never reach the quadratic-risk stage.
    docs = exact_dedup(docs.select("doc_id", "text"), "doc_id")

    # 6. Paragraph-level dedup (CCNet-style boilerplate removal).
    docs = paragraph_dedup(docs, "doc_id").drop("n_paras_kept")

    # 6b. Duplicate-span dedup (ExactSubstr, windowed): removes repeated
    #    sub-paragraph spans that paragraph dedup can't see.
    docs = duplicate_span_dedup(docs, "doc_id", window=8).select("doc_id", "text")

    #    Materialize the cleaned corpus before the near-dup stage: LSH +
    #    verify reference `docs` on BOTH sides of a self-join, and without
    #    a cut the full cleanup lineage is inlined twice into one plan —
    #    Catalyst re-optimization of that tree dominated wall time (73 s
    #    of driver time at 400 docs; ~3 s once cut).  A production job
    #    writes the cleaned corpus as a table here for the same reason.
    docs = docs.localCheckpoint()

    # 7. Near-dup removal: LSH candidates → exact-Jaccard verify →
    #    connected components → keep the component minimum.
    cand = minhash_lsh_pairs(docs, "doc_id", n=3, unit="word", threshold=None)
    pairs = jaccard_for_pairs(docs, cand, "doc_id", n=3, unit="word", threshold=0.9)
    comp = connected_components(pairs)
    drops = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    docs = docs.join(drops, "doc_id", "left_anti")
    #    Materialize the dedup survivors ONCE: everything below (the two
    #    DSIR corpus scans, budgets, feature columns, the shard write)
    #    re-reads this frame, and without a checkpoint each action would
    #    re-run the whole LSH→verify→CC lineage.  A production job writes
    #    an intermediate table here; localCheckpoint is the in-process
    #    equivalent.
    docs = docs.localCheckpoint()
    stages["deduped"] = docs

    # 8. Benchmark decontamination: 8-gram overlap against the eval set
    #    (broadcast semi-join; the corpus never shuffles).
    bench = spark.createDataFrame(
        [("the quick benchmark probe sentence that must not leak into training data",)],
        "text string",
    )
    docs = decontaminate(docs, bench, "doc_id", n=8, unit="word").filter(
        ~F.col("contaminated")
    ).select("doc_id", "text")
    docs = docs.join(meta, "doc_id")

    # 9. Language-stratified sampling for the data mix (deterministic,
    #    monotone in the rate).
    docs = stratified_sample(
        docs, "lang", {"en": 1.0, "de": 0.5, "fr": 0.5}, "doc_id",
        default_fraction=0.25, seed="mix-example",
    )

    # 9b. Temperature (alpha-mix) sampling — the mC4/XLM-R rule that DERIVES
    #    the per-language rates from counts (p ∝ c^alpha): shown on a branch
    #    so both mixing styles stay executable; production picks one.
    stages["alpha_mixed"] = alpha_mix_sample(
        docs, "lang", "doc_id", alpha=0.3,
        budget=max(n_docs // 4, 50), seed="mix-example",
    )

    # 10. DSIR importance scores toward an "en-like" target (the same
    #    machinery doubles as a hashed naive-Bayes quality classifier when
    #    the target is a curated seed set) — map-only exact-integer logw.
    kw = dict(buckets=1024, seed="mix-example")
    lr = dsir_logratio_micro(
        dsir_bucket_counts(docs, **kw),
        dsir_bucket_counts(docs.filter("lang = 'en'"), **kw),
    )
    docs = dsir_score(docs, lr, seed="mix-example")

    # 10b. Trained quality classifier (fastText/GPT-3 style): the en docs
    #    stand in for the curated seed corpus (production: wiki/books);
    #    every doc gets P(curated | text) from the frozen model — train
    #    once per corpus version, score many.
    model = train_quality_classifier(
        docs.filter("lang = 'en'"), docs.filter("lang != 'en'"),
        n_features=1 << 14, max_iter=10,
    )
    docs = score_quality(docs, model)

    # 11. Per-language TOKEN budgets (the unit mixes are specified in):
    #    deterministic hash-order prefix per stratum.
    docs = docs.withColumn(
        "n_tok", F.size(F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " "))
    )
    docs = token_budget_select(
        docs, {"en": 20_000, "de": 6_000, "fr": 6_000}, token_col="n_tok",
        strata_col="lang", key_col="doc_id", default_budget=4_000,
        seed="mix-example",
    )

    # 12. Sequence packing: every doc's exclusive token offset in the
    #    concat-and-chunk training stream (distributed two-phase prefix
    #    sum — ONE shuffle, no global sort).
    docs = pack_offsets(docs, "n_tok", "doc_id", seq_len=512, n_shards=8,
                        seed="mix-example")

    # 13. Feature columns for downstream mixing/analysis.
    docs = quality_features(docs)
    docs = repetition_features(docs)
    docs = lang_id(docs)
    stages["final"] = docs
    return stages


def main() -> None:
    from vector_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark(cores=8)
    stages = curate(spark, n)
    for name in ("url_canonical", "blocklisted", "quality_filtered", "deduped", "final"):
        print(f"{name:18s} {stages[name].count():7d} docs")
    stages["final"].select(
        "doc_id", "url", "lang_pred", "logw", "n_tokens", "dup_line_frac"
    ).show(5, truncate=False)

    # 14. The last step of a real job: write the survivors as globally
    #    shuffled, byte-deterministic training shards.
    import tempfile

    from vector_spark.plans.sinks import write_training_shards

    out = tempfile.mkdtemp(prefix="train_shards_")
    write_training_shards(stages["final"], out, 4, "doc_id", mode="overwrite")
    back = spark.read.parquet(out)
    print(f"shards written to {out}: "
          f"{back.select('shard').distinct().count()} shards, {back.count()} rows")


if __name__ == "__main__":
    main()
