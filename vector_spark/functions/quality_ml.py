"""Trained quality classification — the fastText-style discriminative
filter every major curation pipeline runs (GPT-3's WebText-vs-crawl
logistic regression, CCNet/LLaMA's fastText quality model, RedPajama's
classifier): hash a document's uni+bigram bag into a fixed feature
space, fit logistic regression "curated seed vs raw crawl", keep docs
the model scores curated-like.

Complements the two UNSUPERVISED quality signals already here:
`quality_features`/`gopher_quality_filter` (rule-based) and
`dsir_score` (generative importance ratio).  This is the supervised
discriminative member of the family — same hashing-trick idea as DSIR's
histograms, but with LEARNED per-bucket weights.

Spark-first: tokenization is the module's standard whitespace split
(pure codegen), n-grams/hashing/training are pyspark.ml's JVM
estimators (`NGram`, `HashingTF`, `LogisticRegression` — LBFGS, one
pass per iteration, driver holds only the 2^b-float coefficient
vector), scoring is a map-only `PipelineModel.transform`.  No Python
workers anywhere.

Training is iterative and cluster-wide, so it is NOT ANSI-SQL
expressible — like IVF's k-means, the contract is pinned by tests
(holdout accuracy on separable corpora, partition invariance of the
score) instead of a DuckDB oracle; the driver row is rows-only by
declared design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["train_quality_classifier", "score_quality", "tokens_expr"]


def tokens_expr(text_col: str | Column, lowercase: bool = True) -> Column:
    """Whitespace tokens of a document (the repo's standard
    normalize-and-split, matching whitespace_token_count)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if lowercase:
        c = F.lower(c)
    trimmed = F.trim(F.regexp_replace(F.coalesce(c, F.lit("")), r"\s+", " "))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, " ")
    )


def _assemble(df: DataFrame, text_col: str, lowercase: bool) -> DataFrame:
    # uni+bigram bag: bigrams via the JVM NGram transformer, concatenated
    # onto the unigrams so ONE HashingTF covers both (fastText's
    # wordNgrams=2 setup)
    from pyspark.ml.feature import NGram

    toks = df.withColumn("_toks", tokens_expr(text_col, lowercase))
    bi = NGram(n=2, inputCol="_toks", outputCol="_bi").transform(toks)
    return bi.withColumn("_grams", F.concat(F.col("_toks"), F.col("_bi")))


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    n_features: int = 1 << 18,
    lowercase: bool = True,
    max_iter: int = 50,
    reg_param: float = 1e-4,
):
    """Fit the curated-vs-crawl classifier.  ``positive`` is the curated
    seed corpus (wiki/books/reference pages), ``negative`` a raw-crawl
    sample — the GPT-3 recipe.  Returns a fitted ``PipelineModel``
    (HashingTF + LogisticRegression); persist with ``model.save(path)``
    and reload with ``PipelineModel.load`` — the IVF build-once
    discipline: train on samples once per corpus version, score the full
    100 TB with the frozen model.

    Class balance is the caller's job (sample the bigger side); training
    cost is one corpus pass per LBFGS iteration with only the
    ``n_features`` coefficient vector on the driver."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, NGram

    if n_features < 2:
        raise ValueError(f"n_features must be >= 2, got {n_features}")
    pos = positive.select(tokens_expr(text_col, lowercase).alias("_toks"), F.lit(1.0).alias("label"))
    neg = negative.select(tokens_expr(text_col, lowercase).alias("_toks"), F.lit(0.0).alias("label"))
    train = pos.unionByName(neg)
    pipe = Pipeline(stages=[
        NGram(n=2, inputCol="_toks", outputCol="_bi"),
        _ConcatGrams(inputCols=["_toks", "_bi"], outputCol="_grams"),
        HashingTF(inputCol="_grams", outputCol="features", numFeatures=n_features),
        LogisticRegression(maxIter=max_iter, regParam=reg_param, labelCol="label"),
    ])
    return pipe.fit(train)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "quality_prob",
    lowercase: bool = True,
) -> DataFrame:
    """Score every document with P(curated | text) — map-only transform of
    the frozen model; adds ``out_col`` (double in [0, 1]).  Filter with
    e.g. ``df.filter("quality_prob > 0.5")`` or Pareto-sample on the score
    (the GPT-3 trick) downstream."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(
        df.withColumn("_toks", tokens_expr(text_col, lowercase))
    )
    return scored.withColumn(
        out_col, vector_to_array("probability")[1]
    ).drop("_toks", "_bi", "_grams", "features", "rawPrediction", "probability", "prediction")


# A minimal JVM-free Transformer: concatenates two token-array columns.
# (pyspark.ml has no stock array-concat transformer; this one is pure
# DataFrame API so the pipeline stays serializable and JVM-executed.)
from pyspark.ml import Transformer  # noqa: E402
from pyspark.ml.param import Param, Params  # noqa: E402
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable  # noqa: E402


class _ConcatGrams(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    inputCols = Param(Params._dummy(), "inputCols", "columns to concat")
    outputCol = Param(Params._dummy(), "outputCol", "output column")

    def __init__(self, inputCols=None, outputCol=None):
        super().__init__()
        self._set(inputCols=inputCols or ["_toks", "_bi"], outputCol=outputCol or "_grams")

    def _transform(self, df: DataFrame) -> DataFrame:
        cols = self.getOrDefault(self.inputCols)
        return df.withColumn(
            self.getOrDefault(self.outputCol), F.concat(*[F.col(c) for c in cols])
        )
