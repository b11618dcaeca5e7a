"""Distributed BM25 ranked search over the documents corpus.

Okapi BM25 (Robertson & Zaragoza 2009, "The Probabilistic Relevance
Framework") with the Lucene idf variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``
— always non-negative, so a matching term never *subtracts* relevance the
way the classic idf does for terms in more than half the corpus.

Shape (the inverted-index discipline shared with ``dedup.ngram_jaccard``):

* **postings build** = ONE explode + ONE map-side-combined hash aggregate
  keyed ``(doc, term)`` — the per-corpus artifact.  :func:`bm25_postings`
  is public precisely so callers can persist it (parquet, sorted by term
  for min/max row-group pruning) and re-use it across query batches, the
  ``build_ivf_index`` / ``ivf_search`` split applied to text.
* **search** prunes postings to the query vocabulary FIRST with a broadcast
  left-semi join (query vocab is tiny by definition), so the df counts and
  every downstream join touch only matching postings — never the full
  vocabulary.  df/qterms/stats are all broadcast; the only shuffles are the
  postings aggregate and the final per-(query, doc) sum + top-k.
* top-k per query = ``row_number`` over (score desc, doc id asc) — a
  TakeOrderedAndProject-shaped window, deterministic under ties.

Determinism discipline (the `lm.py` doctrine): each (query, doc, term)
score quantizes to an integer micro-unit (×1e6, half-away rounding = SQL
``round``) BEFORE summation, so the document score is an exact BIGINT —
bit-identical across partitionings and engines.  All float arithmetic is
an identical IEEE expression tree on both sides (constants are computed in
Python and injected verbatim); the only implementation-defined op is
``ln``, and a last-ulp ``ln`` divergence must land within ~1e-10 of a
rounding boundary to flip a micro-unit.

Scale notes (100 TB): postings is corpus-sized and stays distributed
end-to-end; at 10^12 docs ``dl * n_docs`` stays far under int64 (dl ~1e4 ×
N ~1e12 = 1e16 < 9.2e18).  Stop-word query terms are hot probe-side keys
against a unique-keyed build side — AQE skew-split territory, no salting
needed (the `lm.py` scoring-join argument).

Reference semantics: the reference exposes ranked search only through its
control-plane UI search box (`ui/src/components/pipeline/*`); the data-plane
BM25 here is the standard public formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.functions.sampling import word_tokens

MICRO = 1_000_000


def bm25_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted index: ``(id_col, dl: int, term: string, tf: bigint)``.

    One explode + one map-side-combined hash aggregate.  ``dl`` (document
    length in :func:`word_tokens` tokens) rides in the grouping key — it is
    functionally dependent on the doc id, so it adds no groups.  Docs with
    empty/null text produce no postings (they still count toward corpus
    stats, which :func:`bm25_topk` takes from the doc table, not from
    postings).  Persist this sorted by ``term`` for parquet min/max pruning
    when serving repeated query batches.
    """
    tk = word_tokens(text_col)
    return (
        docs.select(
            F.col(id_col), F.size(tk).alias("dl"), F.explode(tk).alias("term")
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` docs per query by BM25, scored in integer micro-units.

    Returns ``(query_id_col, id_col, rnk: int, score_micro: bigint)`` with
    ``rnk`` 1-based, ties broken by ascending doc id.  Query term frequency
    is ignored (distinct query terms — the Lucene convention).  Pass a
    persisted :func:`bm25_postings` result as ``postings`` to skip the
    index build; corpus stats (N, total token count) are recomputed from
    ``docs`` either way — a map-only aggregate.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # Constants are folded in *Python* so the Spark literal and the oracle's
    # decimal literal parse to the same IEEE double (1.2 + 1.0 at runtime
    # could round differently from parsing "2.2" — repr() round-trips).
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    tk = word_tokens(text_col)
    if postings is None:
        postings = bm25_postings(docs, id_col=id_col, text_col=text_col)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.size(tk)), F.lit(0)).cast("long").alias("total_len"),
    )
    qterms = queries.select(
        query_id_col, F.explode(word_tokens(query_text_col)).alias("term")
    ).distinct()
    vocab = qterms.select("term").distinct()

    # Prune to the query vocabulary BEFORE counting df — the full-vocab
    # aggregate never runs.
    hits = postings.join(F.broadcast(vocab), "term", "left_semi")
    df_tab = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        hits.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_tab), "term")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    # dl/avgdl as (dl * N) / total_len: exact int64 numerator, ONE division.
    dl_ratio = (F.col("dl") * F.col("n_docs")) / F.col("total_len")
    tf_norm = (F.col("tf") * F.lit(k1p1)) / (
        F.col("tf") + F.lit(k1) * (F.lit(one_minus_b) + F.lit(b) * dl_ratio)
    )
    micro = F.round(idf * tf_norm * F.lit(float(MICRO)), 0).cast("long")

    per_doc = (
        scored.withColumn("_m", micro)
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_m").alias("score_micro"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    return (
        per_doc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "rnk", "score_micro")
    )
