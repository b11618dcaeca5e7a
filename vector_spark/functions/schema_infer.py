"""Distributed JSON schema inference — the reference UI's per-batch event
schema discovery (`ui/src/components/pipeline/data_view.rs:348-372`), scaled
from "inspect 100 displayed events" to "profile every event in the corpus".

Vector events are schemaless JSON maps (`shared/src/messages.rs:126-141`);
the reference infers a display schema by classifying each field's JSON
value into one of six kinds: null / boolean / number / string / array /
object (`data_view.rs:356-363`).  This module computes the same
classification corpus-wide:

* :func:`infer_json_schema` — one output row per ``(field, kind)`` with its
  exact occurrence count: the full type histogram, including fields that
  flip types across events (the thing a fixed ``from_json`` schema silently
  coerces away).  Malformed JSON or non-object rows are surfaced under the
  reserved field name ``"<malformed>"`` / kind ``"invalid"`` — refusal
  shape, never silent drop.
* :func:`merge_kinds` — fold a field's kind set to the promoted column type
  under the widening lattice ``null < boolean < number < string``
  (array/object never merge with scalars → ``"mixed"``): the "what column
  type do I promote this field to" decision documented in SURVEY §1.2.

Shape: parsing is a map-only Arrow-batched pass emitting per-PARTITION
pre-aggregated ``(field, kind, n)`` partials (state bounded by the live
field-name set, the same bound the overflow ``MapType`` column carries),
then ONE hash aggregate over the tiny (field, kind) space.  A 10^12-row
scan shuffles only per-partition partials — fields x 6 rows per task.

The contract row (`infer_json_schema`) pins exactness against DuckDB's
``json_keys``/``json_type`` over an identically-constructed JSON column
(number kinds UBIGINT/BIGINT/DOUBLE normalize to "number", matching both
the reference's single Number kind and Python's int/float).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["infer_json_schema", "merge_kinds"]

MALFORMED_FIELD = "<malformed>"

_KIND_ORDER = ["null", "boolean", "number", "string", "array", "object"]


def _classify_partition(json_col: str):
    def run(iterator):
        import json as _json

        import pandas as pd

        counts: dict[tuple, int] = {}
        for pdf in iterator:
            for raw in pdf[json_col]:
                if raw is None:
                    counts[(MALFORMED_FIELD, "invalid")] = (
                        counts.get((MALFORMED_FIELD, "invalid"), 0) + 1
                    )
                    continue
                try:
                    obj = _json.loads(raw)
                except (ValueError, TypeError):
                    obj = None
                if not isinstance(obj, dict):
                    counts[(MALFORMED_FIELD, "invalid")] = (
                        counts.get((MALFORMED_FIELD, "invalid"), 0) + 1
                    )
                    continue
                for field, v in obj.items():
                    if v is None:
                        kind = "null"
                    elif isinstance(v, bool):  # bool before int: bool is int
                        kind = "boolean"
                    elif isinstance(v, (int, float)):
                        kind = "number"
                    elif isinstance(v, str):
                        kind = "string"
                    elif isinstance(v, list):
                        kind = "array"
                    else:
                        kind = "object"
                    counts[(field, kind)] = counts.get((field, kind), 0) + 1
        yield pd.DataFrame(
            [(f, k, n) for (f, k), n in counts.items()],
            columns=["field", "kind", "n"],
        )

    return run


def infer_json_schema(df: DataFrame, json_col: str) -> DataFrame:
    """Exact corpus-wide type histogram of a JSON-object column: one row per
    ``(field string, kind string, n bigint)``; kinds are the reference's six
    (`data_view.rs:356-363`) plus ``"invalid"`` for unparseable/non-object
    rows (reserved field ``"<malformed>"``)."""
    if json_col not in df.columns:
        raise ValueError(f"unknown column: {json_col}")
    partials = df.select(json_col).mapInPandas(
        _classify_partition(json_col), "field string, kind string, n long"
    )
    return partials.groupBy("field", "kind").agg(F.sum("n").alias("n"))


def merge_kinds(hist: DataFrame) -> DataFrame:
    """Fold the per-(field, kind) histogram to one promoted kind per field
    under the widening lattice ``null < boolean < number < string``;
    any array/object mixed with another non-null kind → ``"mixed"`` (promote
    to the MapType overflow column, SURVEY §1.2).  Pure JVM expressions —
    one tiny hash aggregate over the histogram."""
    rank = F.when(F.col("kind") == "null", 0).otherwise(
        F.when(F.col("kind") == "boolean", 1).otherwise(
            F.when(F.col("kind") == "number", 2).otherwise(
                F.when(F.col("kind") == "string", 3).otherwise(F.lit(10))
            )
        )
    )
    agg = (
        hist.filter(F.col("kind") != "invalid")
        .withColumn("_rank", rank)
        .groupBy("field")
        .agg(
            F.max("_rank").alias("_max"),
            F.max(F.when(F.col("_rank") < 10, F.col("_rank"))).alias(
                "_max_scalar"
            ),
            F.count_distinct(F.when(F.col("_rank") == 10, F.col("kind"))).alias(
                "_n_nested"
            ),
            F.max(F.when(F.col("_rank") == 10, F.col("kind"))).alias("_nested"),
            F.sum("n").alias("n"),
        )
    )
    scalar = F.element_at(
        F.array(*[F.lit(k) for k in _KIND_ORDER[:4]]), F.col("_max").cast("int") + 1
    )
    merged = (
        # scalars only: widen along the lattice
        F.when(F.col("_max") < 10, scalar)
        # one nested kind, optionally mixed with nulls only: keep it
        .when(
            (F.col("_n_nested") == 1)
            & (F.col("_max_scalar").isNull() | (F.col("_max_scalar") == 0)),
            F.col("_nested"),
        )
        # array+object, or nested mixed with non-null scalars
        .otherwise(F.lit("mixed"))
    )
    return agg.select("field", merged.alias("kind"), "n")
