"""Stupid Backoff LM (Brants et al. 2007) + CCNet perplexity filter."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from vector_spark.functions import (
    ngram_counts,
    perplexity_filter,
    stupid_backoff_score,
)

TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "the cat ate the fish",
    "a dog ate a bone",
]


def _round_half_away(x: float) -> int:
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _sb_reference(train_texts, doc_tokens, alpha=0.4, order=2):
    """Sequential single-process reimplementation — the distributed job must
    match it integer-for-integer."""
    c1, c2, c3 = Counter(), Counter(), Counter()
    for t in train_texts:
        tk = t.split()
        c1.update(tk)
        c2.update(" ".join(p) for p in zip(tk, tk[1:]))
        c3.update(" ".join(p) for p in zip(tk, tk[1:], tk[2:]))
    n_total, vocab = sum(c1.values()), len(c1)
    total = 0
    for i, w in enumerate(doc_tokens):
        s1 = (c1.get(w, 0) + 1) / (n_total + vocab)
        if i >= 1:
            v = doc_tokens[i - 1]
            s2 = c2[f"{v} {w}"] / c1[v] if f"{v} {w}" in c2 else alpha * s1
        if order >= 3 and i >= 2:
            u = doc_tokens[i - 2]
            uvw, uv = f"{u} {v} {w}", f"{u} {v}"
            s3 = c3[uvw] / c2[uv] if uvw in c3 and uv in c2 else alpha * s2
        s = s1 if i == 0 else (s2 if (order == 2 or i == 1) else s3)
        total += _round_half_away(math.log(s) * 1e6)
    return total


def _train_df(spark):
    return spark.createDataFrame([(t,) for t in TRAIN], "text string")


def test_ngram_counts_exact(spark):
    got = {
        (r["n"], r["gram"]): r["cnt"]
        for r in ngram_counts(_train_df(spark), order=2).collect()
    }
    c1, c2 = Counter(), Counter()
    for t in TRAIN:
        tk = t.split()
        c1.update(tk)
        c2.update(" ".join(p) for p in zip(tk, tk[1:]))
    want = {(1, g): c for g, c in c1.items()} | {(2, g): c for g, c in c2.items()}
    assert got == want


def test_ngram_counts_min_count_prunes(spark):
    got = ngram_counts(_train_df(spark), order=1, min_count=2)
    rows = {r["gram"]: r["cnt"] for r in got.collect()}
    assert all(c >= 2 for c in rows.values())
    assert "the" in rows and "fish" not in rows


def test_ngram_counts_empty_and_null_docs(spark):
    df = spark.createDataFrame([("",), (None,), ("  ",), ("one two",)], "text string")
    rows = ngram_counts(df, order=2).collect()
    assert {(r["n"], r["gram"]) for r in rows} == {
        (1, "one"), (1, "two"), (2, "one two")
    }


@pytest.mark.parametrize("order", [2, 3])
def test_stupid_backoff_matches_sequential_reference(spark, order):
    docs = [
        (0, "the cat sat on the mat"),        # fully in-domain
        (1, "the cat sat on a bone"),          # partial backoff
        (2, "zebra quark the unseen"),         # OOV-heavy
        (3, "the"),                            # single token
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    counts = ngram_counts(_train_df(spark), order=order)
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob_micro"])
        for r in stupid_backoff_score(df, counts, order=order).collect()
    }
    for did, text in docs:
        tk = text.split()
        want = _sb_reference(TRAIN, tk, order=order)
        assert got[did] == (len(tk), want), (did, got[did], want)


def test_stupid_backoff_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, TRAIN[i % len(TRAIN)] + f" extra{i}") for i in range(40)],
        "doc_id long, text string",
    )
    counts = ngram_counts(_train_df(spark), order=2)
    a = {
        r["doc_id"]: r["logprob_micro"]
        for r in stupid_backoff_score(docs.repartition(1), counts).collect()
    }
    b = {
        r["doc_id"]: r["logprob_micro"]
        for r in stupid_backoff_score(docs.repartition(13), counts).collect()
    }
    assert a == b


def test_stupid_backoff_zero_token_docs_produce_no_row(spark):
    df = spark.createDataFrame([(0, ""), (1, None), (2, "the cat")],
                               "doc_id long, text string")
    counts = ngram_counts(_train_df(spark), order=2)
    assert {r["doc_id"] for r in stupid_backoff_score(df, counts).collect()} == {2}


def test_perplexity_separates_in_domain_from_gibberish(spark):
    counts = ngram_counts(_train_df(spark), order=2)
    df = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "qq zz xx vv ww yy")],
        "doc_id long, text string",
    )
    ppl = {r["doc_id"]: r["ppl"] for r in stupid_backoff_score(df, counts).collect()}
    assert ppl[0] < ppl[1] / 10


def test_perplexity_filter_modes(spark):
    counts = ngram_counts(_train_df(spark), order=2)
    df = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "qq zz xx vv ww yy"), (2, "")],
        "doc_id long, text string",
    )
    in_ppl = stupid_backoff_score(
        df.filter("doc_id = 0"), counts
    ).first()["ppl"]
    flagged = perplexity_filter(df, counts, max_ppl=in_ppl * 2, mode="flag")
    got = {r["doc_id"]: (r["ppl_keep"], r["ppl"]) for r in flagged.collect()}
    assert got[0][0] is True
    assert got[1][0] is False
    assert got[2] == (False, None)  # zero-token docs fail the gate
    kept = perplexity_filter(df, counts, max_ppl=in_ppl * 2, mode="remove")
    assert [r["doc_id"] for r in kept.collect()] == [0]
    assert set(kept.columns) == {"doc_id", "text", "ppl"}


def test_trigram_backs_off_through_bigram(spark):
    """A doc whose trigrams are all unseen but bigrams seen must score
    exactly alpha * bigram-score at positions >= 2."""
    # 'the cat ate' has bigrams 'the cat' and 'cat ate' in TRAIN but the
    # trigram 'the cat ate' IS in TRAIN — use an unseen trigram instead:
    # 'the dog ate': bigrams 'the dog' + 'dog ate' seen, trigram unseen.
    counts = ngram_counts(_train_df(spark), order=3)
    df = spark.createDataFrame([(0, "the dog ate")], "doc_id long, text string")
    got = stupid_backoff_score(df, counts, order=3).first()["logprob_micro"]
    assert got == _sb_reference(TRAIN, ["the", "dog", "ate"], order=3)


def test_validation_errors(spark):
    df = _train_df(spark)
    counts = ngram_counts(df, order=2)
    with pytest.raises(ValueError):
        ngram_counts(df, order=0)
    with pytest.raises(ValueError):
        ngram_counts(df, min_count=0)
    with pytest.raises(ValueError):
        stupid_backoff_score(df, counts, order=4)
    with pytest.raises(ValueError):
        stupid_backoff_score(df, counts, alpha=1.5)
    with pytest.raises(ValueError):
        perplexity_filter(df, counts, max_ppl=0)
    with pytest.raises(ValueError):
        perplexity_filter(df, counts, max_ppl=10, mode="bogus")
    empty = ngram_counts(df.filter("text = 'nope'"), order=2)
    with pytest.raises(ValueError, match="no unigrams"):
        stupid_backoff_score(df, empty)
