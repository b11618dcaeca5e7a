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

Spark-first: tokenization is the repo's standard `word_tokens`
expression wrapped in a params-serializable Transformer so it is PART
of the persisted model (train/serve skew is impossible by
construction — the lowercase flag and input column travel with the
PipelineModel); n-grams/hashing/training are pyspark.ml's JVM
estimators (`NGram`, `HashingTF`, `LogisticRegression` — LBFGS, one
corpus pass per iteration, the driver holds only the n_features-float
coefficient vector), and scoring is a map-only
`PipelineModel.transform`.  No Python workers anywhere.

Training is iterative and cluster-wide, so it is NOT ANSI-SQL
expressible — like IVF's k-means, the contract is pinned by tests
(holdout accuracy on separable corpora, partition invariance of the
score, save/load identity) instead of a DuckDB oracle; the driver row
is rows-only by declared design.
"""

from __future__ import annotations

from pyspark.ml import Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_quality_classifier", "score_quality"]

# columns the MLlib stages create; a clash with user data is an error,
# never a silent overwrite/drop
_RESERVED = ("_toks", "_bi", "_grams", "features", "rawPrediction",
             "probability", "prediction")


class _Tokenize(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    """`word_tokens` (+ optional lowercase) as a pipeline stage, so the
    tokenization settings persist INSIDE the saved model."""

    inputCol = Param(Params._dummy(), "inputCol", "text column",
                     typeConverter=TypeConverters.toString)
    outputCol = Param(Params._dummy(), "outputCol", "token array column",
                      typeConverter=TypeConverters.toString)
    lowercase = Param(Params._dummy(), "lowercase", "lowercase before split",
                      typeConverter=TypeConverters.toBoolean)

    def __init__(self, inputCol="text", outputCol="_toks", lowercase=True):
        super().__init__()
        self._set(inputCol=inputCol, outputCol=outputCol, lowercase=lowercase)

    def _transform(self, df: DataFrame) -> DataFrame:
        from vector_spark.functions.sampling import word_tokens

        c = F.col(self.getOrDefault(self.inputCol))
        if self.getOrDefault(self.lowercase):
            c = F.lower(c)
        return df.withColumn(self.getOrDefault(self.outputCol), word_tokens(c))


class _ConcatGrams(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    """Concatenates token-array columns (pyspark.ml has no stock
    array-concat transformer); pure DataFrame API, JVM-executed."""

    inputCols = Param(Params._dummy(), "inputCols", "columns to concat",
                      typeConverter=TypeConverters.toListString)
    outputCol = Param(Params._dummy(), "outputCol", "output column",
                      typeConverter=TypeConverters.toString)

    def __init__(self, inputCols=None, outputCol=None):
        super().__init__()
        self._set(inputCols=inputCols or ["_toks", "_bi"], outputCol=outputCol or "_grams")

    def _transform(self, df: DataFrame) -> DataFrame:
        cols = self.getOrDefault(self.inputCols)
        return df.withColumn(
            self.getOrDefault(self.outputCol), F.concat(*[F.col(c) for c in cols])
        )


def _check_reserved(df: DataFrame, what: str) -> None:
    clash = [c for c in _RESERVED if c in df.columns]
    if clash:
        raise ValueError(
            f"{what}: input already has column(s) {clash} which the model "
            f"pipeline creates — rename them first (reserved: {list(_RESERVED)})"
        )


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
    sample — the GPT-3 recipe.  Returns a fitted ``PipelineModel`` whose
    FIRST stage is the tokenizer (input column + lowercase flag persist
    with the model, so a reloaded model always re-tokenizes exactly as
    trained); persist with ``model.save(path)``, reload with
    ``PipelineModel.load`` — the IVF build-once discipline: train on
    samples once per corpus version, score the full 100 TB with the
    frozen model.

    Class balance is the caller's job (sample the bigger side); training
    cost is one corpus pass per LBFGS iteration with only the
    ``n_features`` coefficient vector on the driver."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, NGram

    if n_features < 2:
        raise ValueError(f"n_features must be >= 2, got {n_features}")
    pos = positive.select(F.col(text_col), F.lit(1.0).alias("label"))
    neg = negative.select(F.col(text_col), F.lit(0.0).alias("label"))
    train = pos.unionByName(neg)
    _check_reserved(train, "train_quality_classifier")
    pipe = Pipeline(stages=[
        _Tokenize(inputCol=text_col, outputCol="_toks", lowercase=lowercase),
        NGram(n=2, inputCol="_toks", outputCol="_bi"),
        _ConcatGrams(inputCols=["_toks", "_bi"], outputCol="_grams"),
        HashingTF(inputCol="_grams", outputCol="features", numFeatures=n_features),
        LogisticRegression(maxIter=max_iter, regParam=reg_param, labelCol="label"),
    ])
    model = pipe.fit(train)
    # Drop the training summary from the fitted LR stage.  It pins the
    # SparkSession into the model object graph
    # (BinaryClassificationSummary.sparkSession), and scoring serializes the
    # model into every task closure — which crashes with
    # `NotSerializableException: ObservationManager` the moment ANY
    # `Observation` has run on the session (our metrics module attaches
    # them; reproduced + verified on Spark 4.1.2).  Saved-and-reloaded
    # models never carry a summary, so stripping it also removes a
    # fresh-model-vs-reloaded-model behavioral difference.
    lr_model = model.stages[-1]
    spark = train.sparkSession
    lr_model._java_obj.setSummary(spark.sparkContext._jvm.scala.Option.apply(None))
    return model


def score_quality(
    df: DataFrame,
    model,
    text_col: str | None = None,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score every document with P(curated | text) — map-only transform of
    the frozen model; adds ``out_col`` (double in [0, 1]).  Tokenization
    comes from the model's own first stage (no train/serve skew);
    ``text_col`` only needs to be passed when the scoring frame names its
    text column differently from training.  Filter with e.g.
    ``df.filter("quality_prob > 0.5")`` or Pareto-sample on the score
    (the GPT-3 trick) downstream."""
    _check_reserved(df, "score_quality")
    tok = model.stages[0]
    model_text = tok.getOrDefault(tok.inputCol)
    alias_added = False
    if text_col is not None and text_col != model_text:
        if model_text in df.columns:
            raise ValueError(
                f"score_quality: both {text_col!r} and the model's text "
                f"column {model_text!r} exist — ambiguous input"
            )
        df = df.withColumn(model_text, F.col(text_col))
        alias_added = True
    if model_text not in df.columns:
        raise ValueError(
            f"score_quality: input has no {model_text!r} column (the model "
            f"was trained on it); pass text_col= to map another column"
        )
    scored = model.transform(df).withColumn(
        out_col, _prob_of_positive()
    ).drop(*_RESERVED)
    return scored.drop(model_text) if alias_added else scored


def _prob_of_positive():
    from pyspark.ml.functions import vector_to_array

    return vector_to_array("probability")[1]
