"""Distributed n-gram language model: Stupid Backoff training + CCNet-style
perplexity scoring/filtering.

The two canonical web-scale papers, composed:

* **Brants et al. 2007, "Large Language Models in Machine Translation"** —
  Stupid Backoff: at corpus scale you do NOT normalize or discount; the
  score is ``S(w | context) = count(context·w) / count(context)`` when the
  n-gram was seen, else ``alpha · S(w | shorter context)``, bottoming out at
  the unigram relative frequency.  The whole point of the scheme is that it
  trains and scores as *counts + joins* — no iterative EM, no held-out
  tuning — which is why it was the first LM trained on 2T tokens in
  MapReduce.  This module is that shape in Spark: training is ONE explode +
  ONE hash-agg (map-side combined); scoring is one explode + one left join
  per n-gram order against the (distributed, never collected) count tables.
* **Wenzek et al. 2020, "CCNet"** — filter Common-Crawl documents by the
  perplexity of a clean-corpus LM: train on the "clean" stratum, score every
  raw document, keep the low-perplexity head.  :func:`perplexity_filter`
  is that gate.

Contrast with DSIR (`sampling.py`): DSIR collapses the model to a
``buckets``-sized driver literal (map-only scoring, zero shuffle) — the
right trade when a hashed histogram is enough.  An n-gram LM keys on the
*exact* grams, so its count table is corpus-sized and must stay distributed;
scoring joins are the honest shape (Brants et al.'s exact argument for
serving from distributed shards).

Determinism discipline (the DSIR doctrine): each token's log-score is
quantized to an integer MICRO-unit (×1e6, half-away rounding = SQL
``round``) *before* any summation, so a document's score is an exact BIGINT
sum — bit-identical across partitionings, retries, join orders, and engines.
The only floating op is ``ln`` of a double that both engines derive from the
same integer counts by one IEEE division; a last-ulp ``ln`` divergence would
have to land within ~1e-10 of a rounding boundary to flip a micro-unit.

Scale notes (100 TB):
  * training = explode → hash-agg with map-side partial combine: one shuffle
    whose keys are the grams themselves; ``min_count`` pruning (Brants §4.2's
    count cutoff) shrinks the table BEFORE it is ever joined.
  * scoring joins are sort-merge on the gram string; stopword grams are hot
    keys on the *probe* side only (the count table has one row per gram), so
    AQE skew-join splitting handles them — no salting needed because the
    build side is unique-keyed.
  * the only driver-side values are three scalars (total tokens, distinct
    unigrams, and the caller's alpha) — never the count table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.functions.sampling import word_tokens

MICRO = 1_000_000


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    order: int = 2,
    min_count: int = 1,
) -> DataFrame:
    """Count all n-grams of orders 1..``order`` in one scan.

    Returns a DataFrame ``(n: int, gram: string, cnt: bigint)`` — the LM.
    Each row's grams for every order are built IN-ROW (one array of
    (n, gram) structs per document), so the plan is a single explode
    feeding a single map-side-combined hash aggregate: one shuffle keyed on
    (n, gram), no per-order rescans.

    ``min_count`` drops grams seen fewer times (Brants et al. §4.2's count
    cutoff — at web scale the singleton tail IS most of the table).  Orders
    are pruned independently; unigram totals used for normalization are
    computed by :func:`stupid_backoff_score` from the *unpruned* token
    stream, so pruning never changes the denominator semantics.
    """
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    # materialize the token array ONCE per row before any higher-order
    # function touches it: HOF lambdas run interpreted and re-evaluate
    # closed-over expression trees per ELEMENT, so an inline tokenizer
    # (regexp + split) here is O(tokens × text_length) per row — measured
    # ~20× slower.  An attribute reference inside the lambda is O(1).
    df = df.select(word_tokens(text_col).alias("_tk"))
    tk = F.col("_tk")

    # NOTE: the inner lambda must take exactly ONE parameter — F.transform
    # treats a second parameter as the element INDEX, so binding n via a
    # default arg (`lambda i, _n=n`) would silently receive the index.
    def _gram_builder(n: int):
        return lambda i: F.struct(
            F.lit(n).alias("n"),
            F.concat_ws(" ", F.slice(tk, i + 1, n)).alias("gram"),
        )

    per_order = []
    for n in range(1, order + 1):
        grams = F.when(
            F.size(tk) >= n,
            F.transform(F.sequence(F.lit(0), F.size(tk) - n), _gram_builder(n)),
        ).otherwise(F.array().cast("array<struct<n:int,gram:string>>"))
        per_order.append(grams)
    all_grams = F.flatten(F.array(*per_order))
    out = (
        df.select(F.explode(all_grams).alias("g"))
        .groupBy(F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count > 1:
        out = out.filter(F.col("cnt") >= min_count)
    return out


def _micro_log(x: Column) -> Column:
    """ln(x) quantized to integer micro-units, half-away rounding (= SQL
    ``round``; Spark's ``F.round`` is HALF_UP on positives and negatives
    alike, i.e. half away from zero — the same as DuckDB's)."""
    return F.round(F.log(x) * MICRO, 0).cast("long")


def stupid_backoff_score(
    df: DataFrame,
    counts: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    order: int = 2,
    alpha: float = 0.4,
    broadcast_counts: bool = False,
) -> DataFrame:
    """Per-document Stupid Backoff log-score and perplexity.

    Every token is scored:  position 1 gets the Laplace unigram
    ``S1(w) = (c(w) + 1) / (N + V)`` (add-one so OOV words score finitely —
    N = total training tokens, V = distinct training unigrams, both exact
    scalars); position i ≥ 2 gets ``S(w|v) = c(v·w) / c(v)`` when the
    bigram was seen, else ``alpha · S1(w)`` — and with ``order=3`` the
    trigram level backs off through the bigram level the same way
    (Brants et al. 2007 eq. 5, alpha = 0.4 as published).

    Output: one row per document with ≥ 1 token —
      ``(key_col, n_tokens: int, logprob_micro: bigint,
         avg_logprob: double, ppl: double)``
    where ``logprob_micro`` is the exact integer sum of per-token micro
    log-scores (the deterministic, hash-comparable column),
    ``avg_logprob = logprob_micro / 1e6 / n_tokens`` (natural log), and
    ``ppl = exp(-avg_logprob)``.  Zero-token documents produce no row
    (there is nothing to score; :func:`perplexity_filter` documents how it
    treats them).

    Plan: in-row (pos, w, v[, u]) structs → ONE explode → one left join per
    n-gram ORDER (c1 on w, c2 on v·w, c3 on u·v·w — unique-keyed build
    sides, AQE-skew-safe) → ONE shuffle on the document key that a window
    and the final hash-agg share.  The backoff DENOMINATORS need no joins
    of their own: c(v) for the token at position i is c(w) at position
    i-1, and c(u·v) is c(v·w) at i-1 — a ``lag`` over (doc, pos) inside
    the already-required doc partitioning, which cuts the token-stream
    join legs from 2·order-1 to order.

    ``broadcast_counts=True`` marks every count-table probe broadcastable —
    correct when the trained LM is known-small (min_count-pruned, bounded
    vocabulary); leave False at corpus scale, where the count table is
    itself huge and sort-merge + AQE is the honest plan (Brants et al.
    serve the LM from distributed shards for the same reason).

    ``counts`` is referenced several times (the totals scalar plus one join
    probe per level).  Spark's exchange reuse covers the in-plan references,
    but at corpus scale persist the trained model once and reuse it —
    ``counts.persist()`` for a session, or write/read parquet across jobs
    (the IVF build-once discipline; Brants et al. likewise materialize the
    count shards once and serve every scoring pass from them).
    """
    if order not in (2, 3):
        raise ValueError(f"order must be 2 or 3, got {order}")
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")

    uni = counts.filter(F.col("n") == 1)
    totals = uni.agg(
        F.sum("cnt").alias("n_tok"), F.count(F.lit(1)).alias("v")
    ).first()
    n_total, vocab = int(totals["n_tok"] or 0), int(totals["v"] or 0)
    if n_total == 0:
        raise ValueError("counts has no unigrams — train ngram_counts first")

    # the ngram_counts materialization rule: tokens become a real column
    # BEFORE the position transform, so the lambda's element_at reads an
    # attribute (O(1) per element) instead of re-running the tokenizer
    df = df.select(F.col(key_col), word_tokens(text_col).alias("_tk"))
    tk = F.col("_tk")
    fields = [
        lambda i: i.alias("pos"),
        lambda i: F.element_at(tk, i + 1).alias("w"),
        lambda i: F.when(i > 0, F.element_at(tk, i)).alias("v"),
    ]
    if order == 3:
        fields.append(lambda i: F.when(i > 1, F.element_at(tk, i - 1)).alias("u"))
    # guard size=0: Spark's sequence(0, -1) DESCENDS — empty docs must give
    # an empty struct array, not phantom positions (the word_ngrams guard)
    struct_t = "array<struct<pos:int,w:string,v:string>>" if order == 2 else (
        "array<struct<pos:int,w:string,v:string,u:string>>"
    )
    pos_structs = F.when(
        F.size(tk) >= 1,
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - 1),
            lambda i: F.struct(*[f(i) for f in fields]),
        ),
    ).otherwise(F.array().cast(struct_t))
    toks = df.select(F.col(key_col), F.explode(pos_structs).alias("t")).select(
        key_col, "t.*"
    )

    def _build(side: DataFrame) -> DataFrame:
        return F.broadcast(side) if broadcast_counts else side

    c1 = _build(uni.select(F.col("gram").alias("w"), F.col("cnt").alias("c_w")))
    c2 = _build(
        counts.filter(F.col("n") == 2).select(
            F.col("gram").alias("vw"), F.col("cnt").alias("c_vw")
        )
    )
    j = (
        toks.withColumn("vw", F.concat_ws(" ", "v", "w"))
        .join(c1, "w", "left")
        .join(c2, "vw", "left")
    )
    if order == 3:
        c3 = _build(
            counts.filter(F.col("n") == 3).select(
                F.col("gram").alias("uvw"), F.col("cnt").alias("c_uvw")
            )
        )
        j = j.withColumn("uvw", F.concat_ws(" ", "u", "v", "w")).join(c3, "uvw", "left")

    # Backoff denominators via lag inside the doc partitioning: c(v) at
    # position i ≡ c(w) at i-1; c(u·v) ≡ c(v·w) at i-1.  The window's
    # doc-key shuffle is the SAME partitioning the final groupBy needs, so
    # this adds zero extra exchanges (pinned by test_plan_shapes).
    from pyspark.sql import Window as W

    w_doc = W.partitionBy(key_col).orderBy("pos")
    j = j.withColumn("c_v", F.lag("c_w").over(w_doc))
    if order == 3:
        j = j.withColumn("c_uv", F.lag("c_vw").over(w_doc))

    s1 = (F.coalesce(F.col("c_w"), F.lit(0)) + 1) / F.lit(float(n_total + vocab))
    s2 = F.when(
        F.col("c_vw").isNotNull() & F.col("c_v").isNotNull(),
        F.col("c_vw") / F.col("c_v"),
    ).otherwise(F.lit(alpha) * s1)
    if order == 3:
        s3 = F.when(
            F.col("c_uvw").isNotNull() & F.col("c_uv").isNotNull(),
            F.col("c_uvw") / F.col("c_uv"),
        ).otherwise(F.lit(alpha) * s2)
        score = F.when(F.col("pos") == 0, s1).when(F.col("pos") == 1, s2).otherwise(s3)
    else:
        score = F.when(F.col("pos") == 0, s1).otherwise(s2)

    out = (
        j.withColumn("_m", _micro_log(score))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum("_m").alias("logprob_micro"),
        )
    )
    avg = F.col("logprob_micro") / F.lit(float(MICRO)) / F.col("n_tokens")
    return out.withColumn("avg_logprob", avg).withColumn("ppl", F.exp(-avg))


def perplexity_filter(
    df: DataFrame,
    counts: DataFrame,
    max_ppl: float,
    text_col: str = "text",
    key_col: str = "doc_id",
    order: int = 2,
    alpha: float = 0.4,
    mode: str = "remove",
) -> DataFrame:
    """CCNet's gate: keep documents whose LM perplexity is ≤ ``max_ppl``.

    ``mode="remove"`` returns the surviving documents (original columns +
    ``ppl``); ``mode="flag"`` returns every INPUT row with ``ppl`` (NULL for
    zero-token documents) and a boolean ``ppl_keep`` — the audit shape every
    filter in this repo exposes.  Zero-token documents FAIL the gate (they
    have no evidence of being language at all), matching CCNet's behavior of
    dropping empty paragraphs before scoring.
    """
    if max_ppl <= 0:
        raise ValueError(f"max_ppl must be > 0, got {max_ppl}")
    if mode not in ("remove", "flag"):
        raise ValueError(f"mode must be remove|flag, got {mode!r}")
    scored = stupid_backoff_score(df, counts, text_col, key_col, order, alpha).select(
        key_col, "ppl"
    )
    flagged = df.join(scored, key_col, "left").withColumn(
        "ppl_keep", F.coalesce(F.col("ppl") <= max_ppl, F.lit(False))
    )
    if mode == "flag":
        return flagged
    return flagged.filter(F.col("ppl_keep")).drop("ppl_keep")
