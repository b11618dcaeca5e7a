"""Trained BPE: merge-table parity with a naive sequential reference,
greedy-apply semantics, roundtrip, and distributed encode parity."""

from __future__ import annotations

from collections import Counter

import pytest

from vector_spark.functions import (
    bpe_encode,
    bpe_token_count_trained,
    bpe_word_counts,
    encode_word,
    train_bpe,
)
from vector_spark.functions.bpe import END


def _naive_train(word_counts, num_merges):
    """O(merges × histogram) textbook trainer — train_bpe's incremental
    index must match it merge-for-merge."""
    words = [(list(w) + [END], c) for w, c in word_counts]
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for syms, c in words:
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc or max(pc.values()) < 2:
            break
        cnt = max(pc.values())
        a, b = min(p for p, c2 in pc.items() if c2 == cnt)
        merges.append((a, b))
        nxt = []
        for syms, c in words:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            nxt.append((out, c))
        words = nxt
    return merges


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_train_matches_naive_reference():
    got = train_bpe(SENNRICH, num_merges=10)
    assert got == _naive_train(SENNRICH, 10)
    # the canonical example's first merge is ('e','s') with count 9
    assert got[0] == ("e", "s")


def test_train_matches_naive_on_wider_histogram():
    wc = [(f"tok{i % 37}abc"[: 3 + i % 9], (i * 13) % 29 + 1) for i in range(300)]
    wc = sorted(Counter(dict(wc)).items())
    assert train_bpe(wc, num_merges=60) == _naive_train(wc, 60)


def test_encode_word_greedy_lowest_rank_first():
    # ('a','b') ranks below ('b','c'): "abc" must become ab|c, never a|bc
    ranks = {("a", "b"): 0, ("b", "c"): 1}
    assert encode_word("abc", ranks) == ["ab", "c", END]
    ranks2 = {("b", "c"): 0, ("a", "b"): 1}
    assert encode_word("abc", ranks2) == ["a", "bc", END]


def test_encode_roundtrip_and_fallback():
    merges = train_bpe(SENNRICH, num_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["low", "lowest", "newest", "zebra", "w"]:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END  # lossless
    # unseen chars fall back to single symbols, never crash
    assert encode_word("", ranks) == [END]


def test_validation():
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(SENNRICH, num_merges=0)


def test_word_counts_distributed(spark):
    texts = ["low low lower", "newest newest widest", " low\tnewest "]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = bpe_word_counts(df, max_words=100)
    exp = Counter(w for t in texts for w in t.split())
    assert dict(got) == dict(exp)
    # ordering: count desc then word asc, stable under repartitioning
    assert got == bpe_word_counts(df.repartition(7), max_words=100)
    assert [w for w, _ in got[:2]] == ["low", "newest"]
    # the cap keeps the HEAD by (count desc, word asc)
    assert bpe_word_counts(df, max_words=1) == [("low", 3)]


def test_bpe_encode_end_to_end(spark):
    texts = ["low lower newest", "widest low", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = train_bpe(bpe_word_counts(df), num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    rows = {
        r.doc_id: r.bpe_tokens
        for r in bpe_encode(df, merges).select("doc_id", "bpe_tokens").collect()
    }
    for i, t in enumerate(texts):
        exp = [tok for w in t.split() for tok in encode_word(w, ranks)]
        assert rows[i] == exp
    counted = {
        r.doc_id: r.n_bpe
        for r in bpe_token_count_trained(df, merges).select("doc_id", "n_bpe").collect()
    }
    assert counted == {i: len(v) for i, v in rows.items()}


def test_bpe_encode_partition_invariant(spark, docs_table):
    docs = docs_table.limit(60)
    merges = train_bpe(bpe_word_counts(docs), num_merges=40)
    a = {
        r.doc_id: r.n_bpe
        for r in bpe_token_count_trained(docs.repartition(1), merges).collect()
    }
    b = {
        r.doc_id: r.n_bpe
        for r in bpe_token_count_trained(docs.repartition(16), merges).collect()
    }
    assert a == b and len(a) == 60
