"""BM25 ranked search: exact-integer parity with a sequential reference,
partition invariance, prebuilt-postings path, and plan shape."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from vector_spark.functions import bm25_postings, bm25_topk

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat ate the fish"),
    (3, "a dog ate a bone"),
    (4, "spark shuffles the hash join"),
    (5, ""),  # empty doc: counts toward N, never scores
]
QUERIES = [("qa", "cat fish"), ("qb", "dog"), ("qc", "zebra")]


def _round_half_away(x: float) -> int:
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _bm25_reference(docs, queries, k=10, k1=1.2, b=0.75):
    """Sequential single-process BM25 — the distributed job must match it
    integer-for-integer (same Python-folded constants, same op order)."""
    toks = {i: t.split() for i, t in docs}
    n_docs = len(docs)
    total_len = sum(len(t) for t in toks.values())
    tfs = {i: Counter(t) for i, t in toks.items()}
    k1p1, one_minus_b = k1 + 1.0, 1.0 - b
    out = []
    for qid, q in queries:
        scores = {}
        for term in sorted(set(q.split())):
            df = sum(1 for t in tfs.values() if term in t)
            if df == 0:
                continue
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for i, tf_c in tfs.items():
                tf = tf_c.get(term, 0)
                if tf == 0:
                    continue
                dl_ratio = (len(toks[i]) * n_docs) / total_len
                norm = (tf * k1p1) / (tf + k1 * (one_minus_b + b * dl_ratio))
                scores[i] = scores.get(i, 0) + _round_half_away(idf * norm * 1e6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend((qid, i, r + 1, s) for r, (i, s) in enumerate(ranked))
    return sorted(out)


@pytest.fixture(scope="module")
def tiny(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    qdf = spark.createDataFrame(QUERIES, ["query_id", "query"])
    return docs, qdf


def _rows(df):
    return sorted(
        (r.query_id, r.doc_id, r.rnk, r.score_micro) for r in df.collect()
    )


def test_bm25_matches_sequential_reference(tiny):
    docs, qdf = tiny
    got = _rows(bm25_topk(docs, qdf, k=10))
    assert got == _bm25_reference(DOCS, QUERIES)
    # zebra never occurs: qc contributes no rows at all
    assert not [r for r in got if r[0] == "qc"]


def test_bm25_partition_invariant(tiny):
    docs, qdf = tiny
    a = _rows(bm25_topk(docs.repartition(1), qdf, k=3))
    b = _rows(bm25_topk(docs.repartition(16), qdf.repartition(4), k=3))
    assert a == b and a


def test_bm25_prebuilt_postings_path(tiny, tmp_path):
    docs, qdf = tiny
    path = str(tmp_path / "postings")
    bm25_postings(docs).write.parquet(path)
    loaded = docs.sparkSession.read.parquet(path)
    direct = _rows(bm25_topk(docs, qdf, k=10))
    via_index = _rows(bm25_topk(docs, qdf, k=10, postings=loaded))
    assert direct == via_index


def test_bm25_k_validation(tiny):
    docs, qdf = tiny
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(docs, qdf, k=0)


def test_bm25_ties_break_on_doc_id(spark):
    # identical docs → identical scores → rank order must follow doc_id
    docs = spark.createDataFrame(
        [(7, "alpha beta"), (3, "alpha beta"), (5, "alpha beta")],
        ["doc_id", "text"],
    )
    qdf = spark.createDataFrame([("q", "alpha")], ["query_id", "query"])
    got = _rows(bm25_topk(docs, qdf, k=3))
    assert [r[1] for r in sorted(got, key=lambda r: r[2])] == [3, 5, 7]
    assert len({r[3] for r in got}) == 1


def test_bm25_plan_broadcasts_small_sides(tiny):
    # qterms/vocab/df/stats all broadcast; postings never broadcast.  The
    # only exchanges are the postings agg, the per-(query,doc) sum, and the
    # top-k window.
    docs, qdf = tiny
    plan = bm25_topk(docs, qdf, k=5)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") >= 4
    assert "SortMergeJoin" not in plan
