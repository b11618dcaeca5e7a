"""Deterministic sampling for data mixing.

Training-data pipelines re-weight domains/languages ("mix 50 % web, 30 %
code, 20 % academic") with per-stratum sampling rates.  `df.sampleBy` is
nondeterministic across retries and partition layouts, which breaks
reproducible dataset builds and lineage — so this module samples by HASH of
a stable key, the same reasoning that made the t4 sample operator
hash-based: a row's fate depends only on (key, seed, its stratum's rate),
never on partitioning, task retries, or row order.  Rate changes are
monotone by construction (raising a stratum's rate only ADDS rows — the
kept set at rate p is a subset of the kept set at p' > p), which is what
lets you grow a mix without resampling the world.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _bucket(key: Column, seed: str, method: str) -> Column:
    """Uniform [0, 1) bucket from a stable key.

    ``xxhash64`` — pure JVM, the throughput path.  ``md5`` — the
    SQL-recomputable twin (28-bit md5 prefix, the fingerprint_modular
    trick) so an external system (or the DuckDB oracle) can reproduce the
    exact sample membership."""
    salted = F.concat(key.cast("string"), F.lit(seed))
    if method == "xxhash64":
        h = F.pmod(F.xxhash64(salted), F.lit(_BUCKETS))
    elif method == "md5":
        h = F.conv(F.substring(F.md5(salted), 1, 7), 16, 10).cast("long") % _BUCKETS
    else:
        raise ValueError(f"unknown hash method {method!r} (expected xxhash64|md5)")
    return h / F.lit(float(_BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    seed: str = "",
    method: str = "xxhash64",
) -> DataFrame:
    """Keep each row iff bucket(key) < fraction(stratum) — a map-only
    filter, zero shuffle, pushed into the scan where the source supports
    it.  ``fractions`` maps stratum value → keep rate in [0, 1]; strata not
    listed use ``default_fraction``.  NULL strata use ``default_fraction``.

    At 100 TB this is the only sane shape: no count-first pass, no
    per-stratum state, and the sample is a pure function of the data — two
    runs (or a retried stage) agree row-for-row."""
    for k, v in fractions.items():
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"fraction for stratum {k!r} must be in [0,1], got {v}")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(f"default_fraction must be in [0,1], got {default_fraction}")
    rate = F.lit(default_fraction)
    for k, v in fractions.items():
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    return df.filter(_bucket(F.col(key_col), seed, method) < rate)


def _bucket_micro(key: Column, seed: str, method: str) -> Column:
    """Integer bucket in [0, 1e6) — the exact-comparison twin of
    :func:`_bucket` (no float division, so rate tests compare BIGINTs)."""
    salted = F.concat(key.cast("string"), F.lit(seed))
    if method == "xxhash64":
        return F.pmod(F.xxhash64(salted), F.lit(_BUCKETS))
    if method == "md5":
        return F.conv(F.substring(F.md5(salted), 1, 7), 16, 10).cast("long") % _BUCKETS
    raise ValueError(f"unknown hash method {method!r} (expected xxhash64|md5)")


def alpha_mix_rates_micro(
    counts: dict[str, int], alpha: float, budget: int
) -> dict[str, int]:
    """Per-stratum keep rates (micro-units) for temperature sampling.

    The multilingual mixing rule (mC4 / XLM-R: Xue et al. 2021 §3.1,
    Conneau et al. 2020 §3): sample stratum *l* with probability
    ``p_l ∝ c_l^alpha`` so low-resource strata are up-weighted relative to
    their natural share; ``budget`` is the target total row count, so the
    keep rate is ``min(1, budget·p_l / c_l)``.

    Exactness discipline: the only float op is ``c^alpha``, quantized to an
    integer micro-weight IMMEDIATELY (half-away rounding); everything after
    — the weight sum, ``budget·w·1e6 // (Σw·c)`` — is arbitrary-precision
    integer arithmetic (Python ints; the oracle uses HUGEINT), so rates are
    reproducible to the unit regardless of stratum iteration order.  A
    float weight SUM would be order-dependent; an integer sum cannot be.
    """
    if not counts:
        raise ValueError("counts is empty")
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    for k, c in counts.items():
        if c < 1:
            raise ValueError(f"count for stratum {k!r} must be >= 1, got {c}")
    w_micro = {
        k: _round_half_away((c ** alpha) * _BUCKETS) for k, c in counts.items()
    }
    sw = sum(w_micro.values())
    return {
        k: min(_BUCKETS, (budget * w_micro[k] * _BUCKETS) // (sw * counts[k]))
        for k in counts
    }


def alpha_mix_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    *,
    alpha: float = 0.3,
    budget: int,
    seed: str = "",
    method: str = "xxhash64",
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """Temperature-sample ``df`` so strata follow ``p ∝ count^alpha``.

    One tiny counts aggregate (rows = #strata — languages/domains, bounded
    by construction; pass ``counts`` to skip it) and then a MAP-ONLY
    integer filter ``bucket_micro(key) < rate_micro(stratum)`` — zero
    shuffle on the corpus, deterministic under retries/partitioning, and
    monotone in ``budget`` (growing the budget only adds rows).  NULL
    strata are dropped (rate 0).

    Overflow bound: rates are computed in arbitrary-precision Python ints,
    so no int64 ceiling applies to ``budget·w·1e6`` — only the final
    per-stratum rate (≤ 1e6) reaches the plan, as a literal.
    """
    if counts is None:
        rows = df.groupBy(strata_col).count().collect()
        counts = {r[strata_col]: r["count"] for r in rows if r[strata_col] is not None}
    rates = alpha_mix_rates_micro(counts, alpha, budget)
    rate = F.lit(0).cast("long")
    for k in sorted(rates):
        rate = F.when(F.col(strata_col) == k, F.lit(rates[k])).otherwise(rate)
    return df.filter(_bucket_micro(F.col(key_col), seed, method) < rate)


# ---------------------------------------------------------------------------
# DSIR — data selection with importance resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------
#
# Select raw-corpus documents that look like a target domain by importance
# weighting over HASHED word-n-gram bucket distributions: estimate the
# target and raw bucket distributions once (two hash-aggs that reduce to
# `buckets` rows each — driver-collectable by construction, the IVF-centroid
# pattern), then score every document MAP-ONLY with a literal lookup array:
# zero shuffle, no Python in the hot path, pushdown-friendly.
#
# Determinism discipline: the per-bucket log ratios are quantized to
# integer MICRO-units (1e-6) on the driver, and each document's weight is
# the exact INTEGER sum of its grams' micro-ratios — so the score is
# bit-identical across partitionings, retries, engines, and summation
# orders (floating addition is order-dependent; integer addition is not).


def word_tokens(text_col: Column | str) -> Column:
    """THE repo's standard whitespace tokenization (the duplicate_span_dedup
    convention): collapse whitespace runs, trim, split; empty/null text
    gives [].  Every operator that tokenizes words (n-grams/DSIR, the
    trained quality classifier) calls this one expression so their token
    streams can never silently diverge."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    trimmed = F.trim(F.regexp_replace(F.coalesce(c, F.lit("")), r"\s+", " "))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, " ")
    )


def word_ngrams(text_col: Column | str, n: int = 2) -> Column:
    """Array of space-joined word n-grams over :func:`word_tokens`.  Docs
    with < n words give [].

    Built as a ``zip_with`` chain (tokens ⊗ tokens-shifted-by-1 ⊗ …) rather
    than ``transform(sequence, i -> slice(tokens, i, n))``: higher-order
    functions evaluate in INTERPRETED mode, re-computing every non-lambda
    expression their lambda closes over once PER ELEMENT — with the
    tokenizer (regexp + split) closed over, that made this O(tokens ×
    text_length) per row, measured 20× slower at 50-token docs.  In the
    zip_with form the token array appears only as HOF *arguments*
    (evaluated once per row) and the lambdas touch nothing but their own
    variables, so the tokenize runs ``n`` times per ROW, never per element.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    tk = word_tokens(text_col)
    if n == 1:
        return tk
    # running[i] = tokens[i] " " tokens[i+1] ... (length stays size(tk);
    # the last k entries go NULL via concat's null-propagation and are cut
    # by the final slice)
    running = tk
    for k in range(1, n):
        running = F.zip_with(
            running,
            F.slice(word_tokens(text_col), k + 1, F.size(tk)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(
        F.size(tk) >= n,
        F.slice(running, 1, F.size(tk) - (n - 1)),
    ).otherwise(F.array().cast("array<string>"))


def _gram_bucket(gram: Column, buckets: int, seed: str, method: str) -> Column:
    """Bucket id in [0, buckets) for one n-gram string.  ``xxhash64`` is the
    throughput path; ``md5`` (28-bit prefix) is the SQL-recomputable twin."""
    salted = F.concat(gram, F.lit(seed))
    if method == "xxhash64":
        return F.pmod(F.xxhash64(salted), F.lit(buckets)).cast("int")
    if method == "md5":
        return (F.conv(F.substring(F.md5(salted), 1, 7), 16, 10).cast("long") % buckets).cast("int")
    raise ValueError(f"unknown hash method {method!r} (expected xxhash64|md5)")


def dsir_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    buckets: int = 4096,
    seed: str = "",
    method: str = "xxhash64",
) -> list[int]:
    """Hashed n-gram bucket histogram for a corpus: explode grams → ONE
    hash-agg on the (int) bucket id → collect exactly ``buckets`` rows.
    The collect is small by construction (buckets, not documents)."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    rows = (
        df.select(F.explode(word_ngrams(text_col, n)).alias("_g"))
        .select(_gram_bucket(F.col("_g"), buckets, seed, method).alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    counts = [0] * buckets
    for r in rows:
        counts[r["_b"]] = r["_c"]
    return counts


def _round_half_away(x: float) -> int:
    return int(math.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1)


def dsir_logratio_micro(
    raw_counts: list[int], target_counts: list[int], smoothing: float = 1.0
) -> list[int]:
    """Per-bucket importance log-ratio ln(p_target / p_raw) with Laplace
    smoothing, quantized to integer micro-units (×1e6, half-away rounding —
    matching SQL ``round()``, not Python's banker's rounding).  p_x[b] =
    (c_x[b] + a) / (N_x + a·B).  The quantization is what makes downstream
    document scores exact integers."""
    if len(raw_counts) != len(target_counts):
        raise ValueError("raw and target histograms must have the same bucket count")
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    b = len(raw_counts)
    n_r = sum(raw_counts)
    n_t = sum(target_counts)
    out = []
    for cr, ct in zip(raw_counts, target_counts):
        pt = (ct + smoothing) / (n_t + smoothing * b)
        pr = (cr + smoothing) / (n_r + smoothing * b)
        out.append(_round_half_away(math.log(pt / pr)))
    return out


def dsir_score(
    df: DataFrame,
    logratio_micro: list[int],
    text_col: str = "text",
    n: int = 2,
    seed: str = "",
    method: str = "xxhash64",
    out_col: str = "logw",
) -> DataFrame:
    """Score every document with its DSIR importance weight: the exact
    integer sum of its grams' micro-log-ratios, via an in-row fold over the
    gram array against a LITERAL lookup array — MAP-ONLY, zero shuffle, no
    Python workers; the literal array ships once inside the plan.  Adds
    ``{out_col}_micro`` (exact BIGINT) and ``{out_col}`` (micro / 1e6)."""
    buckets = len(logratio_micro)
    lr = F.lit([int(v) for v in logratio_micro])
    micro = F.aggregate(
        word_ngrams(text_col, n),
        F.lit(0).cast("long"),
        lambda acc, g: acc + F.element_at(lr, _gram_bucket(g, buckets, seed, method) + 1).cast("long"),
    )
    return df.withColumn(f"{out_col}_micro", micro).withColumn(
        out_col, (F.col(f"{out_col}_micro") / F.lit(1_000_000.0))
    )


def dsir_resample(
    df: DataFrame,
    logratio_micro: list[int],
    fraction: float,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 2,
    temperature: float = 1.0,
    seed: str = "",
    method: str = "xxhash64",
) -> DataFrame:
    """Gumbel-top-k importance resampling, made deterministic: draw each
    document's Gumbel noise from a HASH of its key (so the sample is a pure
    function of the data, the stratified_sample doctrine), perturb
    logw/temperature, and keep the top ``fraction`` of documents by a
    single distributed quantile cut (approx_percentile at 1e-4 error) —
    no global sort.  Ties at the threshold are broken toward keeping."""
    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    scored = dsir_score(df, logratio_micro, text_col, n, seed, method)
    u = _bucket(F.col(key_col), seed + "|gumbel", method)  # [0, 1)
    # guard u=0 (ln(0)): the bucket grid step is 1e-6, shift by half a step
    gumbel = -F.log(-F.log(u + F.lit(0.5 / _BUCKETS)))
    keyed = scored.withColumn(
        "_dsir_key", F.col("logw") / F.lit(float(temperature)) + gumbel
    )
    cut = keyed.agg(
        F.expr(f"approx_percentile(_dsir_key, {1.0 - fraction}, 10000)")
    ).first()[0]
    return keyed.filter(F.col("_dsir_key") >= cut).drop("_dsir_key")


def token_budget_select(
    df: DataFrame,
    budgets: dict[str, int] | int,
    token_col: str,
    strata_col: str | None = None,
    key_col: str = "doc_id",
    default_budget: int = 0,
    seed: str = "",
    method: str = "xxhash64",
    mode: str = "exact",
) -> DataFrame:
    """Select documents up to a TOKEN budget per stratum ("10B tokens of
    code, 2B of wiki" — the unit data mixes are actually specified in,
    where stratified_sample's per-ROW rates can't hit a token target when
    doc lengths differ across strata).  Deterministic: docs are taken in
    hash-of-key order, so the selection is a pure function of the data and
    growing a budget only ADDS documents (prefix property).

    ``mode="exact"``: per-stratum running token sum over hash order (one
    shuffle on the stratum key + an in-partition sort), keep while the
    running sum stays within budget.  Exact and oracle-able; at 100 TB a
    single giant stratum serializes into one sort partition, so use it
    when strata are reasonably balanced or budgets are per-domain.

    ``mode="rate"``: the scale path — ONE small agg collects per-stratum
    token totals (strata-many rows, driver-safe by construction), then a
    map-only hash filter keeps each doc with probability budget/total.
    Zero sort, zero skew, budget met in expectation with relative error
    ~1/sqrt(docs-per-stratum); same hash ⇒ rate mode's kept set is NOT a
    prefix of exact mode's (rates thin uniformly, exact takes a prefix).
    """
    if mode not in ("exact", "rate"):
        raise ValueError(f"mode must be exact|rate, got {mode!r}")
    if isinstance(budgets, int):
        budget_expr = F.lit(budgets)
        budget_map = None
    else:
        budget_map = dict(budgets)
        if strata_col is None:
            raise ValueError("per-stratum budgets require strata_col")
        for k, v in budget_map.items():
            if v < 0:
                raise ValueError(f"budget for stratum {k!r} must be >= 0, got {v}")
        budget_expr = F.lit(default_budget)
        for k, v in budget_map.items():
            budget_expr = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(budget_expr)

    if mode == "exact":
        from pyspark.sql import Window as W

        part = [strata_col] if strata_col else []
        order = _bucket(F.col(key_col), seed + "|budget", method)
        w = (
            W.partitionBy(*part)
            .orderBy(order.asc(), F.col(key_col).asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        return (
            df.withColumn("_cum_tok", F.sum(token_col).over(w))
            .filter(F.col("_cum_tok") <= budget_expr)
            .drop("_cum_tok")
        )

    # rate mode: totals per stratum (or global), then a hash-rate filter
    group = [strata_col] if strata_col else []
    totals = {
        (r[strata_col] if strata_col else None): r["_tot"]
        for r in df.groupBy(*group).agg(F.sum(token_col).alias("_tot")).collect()
    }
    def _rate(stratum):
        tot = totals.get(stratum, 0)
        b = (
            budget_map.get(stratum, default_budget)
            if budget_map is not None
            else budgets
        )
        return min(1.0, b / tot) if tot else 0.0

    if strata_col is None:
        rate = F.lit(_rate(None))
    else:
        # NULL strata take default_budget, like exact mode (whose budget
        # CASE falls through to default_budget on a NULL stratum) and like
        # stratified_sample's default_fraction convention — without an
        # explicit isNull branch every `col == stratum` WHEN is NULL and
        # NULL-stratum docs would silently fall to the 0.0 base rate.
        rate = F.when(F.col(strata_col).isNull(), F.lit(_rate(None))).otherwise(F.lit(0.0))
        for stratum in totals:
            if stratum is None:
                continue
            rate = F.when(F.col(strata_col) == stratum, F.lit(_rate(stratum))).otherwise(rate)
    return df.filter(_bucket(F.col(key_col), seed + "|budget", method) < rate)
