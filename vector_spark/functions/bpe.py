"""Trained byte-pair-encoding tokenizer: distributed word counting, driver
merge training, Arrow-batched distributed encoding.

The classic subword pipeline (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units"), built the way production
tokenizer trainers actually run at corpus scale (SentencePiece / HF
tokenizers): the CLUSTER computes the word-frequency histogram (one explode +
one map-side-combined hash aggregate over 100 TB), and the DRIVER runs the
merge loop over that *bounded* histogram — BPE merges are inherently
sequential (merge i+1's pair counts depend on merge i), so the loop is not
distributable, but it never sees the corpus: only the top ``max_words``
distinct words with their counts.  ``max_words`` is the honest cap — at web
scale the distinct-word tail is unbounded (typos, hashes, URLs) while the
frequency mass is Zipf-concentrated; the cap is logged loudly, never silent.

Encoding is a map-only Arrow-batched pandas UDF: the merge ranks broadcast
to every executor (a dict of ≤ num_merges entries), each batch memoizes
word → subwords so the Zipf head is encoded once per batch, and tokenization
parity with the rest of the repo is BY CONSTRUCTION — the UDF receives the
JVM-computed :func:`word_tokens` array, never re-tokenizing in Python.

Determinism: the merge loop breaks pair-count ties lexicographically
(count desc, then pair asc), so the trained merge table is a pure function
of the histogram; the histogram cap takes the top words by (count desc,
word asc) — a TakeOrderedAndProject, not a sample.  Training twice on the
same corpus, or on any repartitioning of it, yields byte-identical merges
(property-tested), and encoding is deterministic per word.

There is deliberately NO SQL oracle for the encode step — an ordered merge
loop per word is not ANSI-expressible; the contract row is declared
rows-only and the exactness is pinned by the sequential-reference property
tests instead (the ``sim_ivf_topk`` precedent).

Reference scope: the reference's data plane has no tokenizer; this is part
of the training-data-pipeline palette (charter §"beyond the reference").
"""

from __future__ import annotations

import logging
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

from vector_spark.functions.sampling import word_tokens

log = logging.getLogger(__name__)

END = "</w>"


def bpe_word_counts(
    docs: DataFrame,
    text_col: str = "text",
    max_words: int = 1_000_000,
) -> list[tuple[str, int]]:
    """Top-``max_words`` (word, count) pairs by (count desc, word asc).

    One explode + one map-side-combined hash aggregate + a
    TakeOrderedAndProject — the only stage that ever reads the corpus.
    The returned list is driver-sized by construction (≤ ``max_words``
    rows), which is the SentencePiece/HF trainer contract, not a
    ``collect()`` anti-pattern.  Truncation is logged with the dropped
    distinct-word count.
    """
    if max_words < 1:
        raise ValueError(f"max_words must be >= 1, got {max_words}")
    counts = (
        docs.select(F.explode(word_tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rows = counts.orderBy(F.col("c").desc(), F.col("w").asc()).limit(
        max_words + 1
    ).collect()
    if len(rows) > max_words:
        log.warning(
            "bpe_word_counts: histogram capped at max_words=%d distinct words "
            "(more exist); the Zipf tail is dropped from TRAINING only — "
            "encoding still covers every word via character fallback.",
            max_words,
        )
        rows = rows[:max_words]
    return [(r.w, r.c) for r in rows]


def train_bpe(
    word_counts: list[tuple[str, int]],
    num_merges: int = 200,
) -> list[tuple[str, str]]:
    """The Sennrich merge loop over a word histogram → ordered merge table.

    Each word is a symbol sequence ``chars + [</w>]``; every iteration
    merges the globally most frequent adjacent pair (ties: lexicographically
    smallest pair), maintained incrementally via a pair → word-index
    posting map so each merge touches only the words containing the pair —
    O(affected words) per merge, not O(histogram).  Stops early when no
    pair occurs twice.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    words: list[list[str]] = [list(w) + [END] for w, _ in word_counts]
    freqs = [c for _, c in word_counts]

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        f = freqs[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            where.setdefault(p, set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        cnt = max(pair_counts.values())
        if cnt < 2:
            break
        # lexicographically smallest pair among the most frequent — the
        # deterministic tie-break that makes merges a pure function of the
        # histogram
        a, b = min(p for p, c in pair_counts.items() if c == cnt)
        merges.append((a, b))
        ab = a + b
        for i in sorted(where.get((a, b), ())):
            syms, f = words[i], freqs[i]
            # subtract this word's old pairs, rewrite, add new pairs
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                s = where.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        where.pop(p, None)
            out = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                where.setdefault(p, set()).add(i)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word greedily by rank (the reference BPE apply):
    repeatedly merge the present pair with the LOWEST training rank."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_j = None, -1
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col: array<string>`` of subword tokens per document.

    Map-only: tokenization happens JVM-side (:func:`word_tokens` — parity by
    construction), the merge-rank dict rides the closure (≤ num_merges
    entries, broadcast with the task), and each Arrow batch memoizes
    word → subwords so the Zipf head costs one encode per batch.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def _enc(tok_arrays: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc_doc(tokens: Iterable[str]) -> list[str]:
            out: list[str] = []
            for w in tokens if tokens is not None else ():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        return tok_arrays.map(enc_doc)

    return docs.withColumn(out_col, _enc(word_tokens(text_col)))


def bpe_token_count_trained(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe",
) -> DataFrame:
    """Per-document trained-BPE token count (the budget/packing input)."""
    enc = bpe_encode(docs, merges, text_col=text_col, out_col="_bpe")
    return enc.withColumn(out_col, F.size("_bpe").cast("int")).drop("_bpe")
