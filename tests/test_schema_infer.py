"""Corpus-wide JSON schema inference (the reference UI's 6-kind per-field
classification, `data_view.rs:348-372`, scaled to every row) + the kind-set
widening fold."""
from __future__ import annotations

import pytest

from vector_spark.functions import infer_json_schema, merge_kinds
from vector_spark.functions.schema_infer import MALFORMED_FIELD


def _hist(df):
    return {(r["field"], r["kind"]): r["n"] for r in df.collect()}


def test_exact_type_histogram(spark):
    rows = [
        ('{"a": 1, "b": "x"}',),
        ('{"a": 2.5, "b": null}',),
        ('{"a": true, "c": [1]}',),
        ('{"a": {"z": 1}}',),
    ]
    df = spark.createDataFrame(rows, "msg string")
    assert _hist(infer_json_schema(df, "msg")) == {
        ("a", "number"): 2,
        ("a", "boolean"): 1,
        ("a", "object"): 1,
        ("b", "string"): 1,
        ("b", "null"): 1,
        ("c", "array"): 1,
    }


def test_malformed_and_non_object_rows_surface(spark):
    rows = [('{"a": 1}',), ("not json",), ("[1, 2]",), ('"scalar"',), (None,)]
    df = spark.createDataFrame(rows, "msg string")
    h = _hist(infer_json_schema(df, "msg"))
    assert h[(MALFORMED_FIELD, "invalid")] == 4
    assert h[("a", "number")] == 1


def test_partition_invariance(spark):
    rows = [('{"f%d": %d}' % (i % 5, i),) for i in range(400)]
    df = spark.createDataFrame(rows, "msg string")
    a = _hist(infer_json_schema(df.repartition(1), "msg"))
    b = _hist(infer_json_schema(df.repartition(13), "msg"))
    assert a == b and sum(a.values()) == 400


def test_unknown_column(spark):
    df = spark.createDataFrame([("{}",)], "msg string")
    with pytest.raises(ValueError, match="unknown column"):
        infer_json_schema(df, "nope")


@pytest.mark.parametrize(
    "kinds, want",
    [
        ({"null": 3}, "null"),
        ({"null": 1, "boolean": 2}, "boolean"),
        ({"boolean": 1, "number": 2}, "number"),
        ({"number": 5, "string": 1, "null": 2}, "string"),
        ({"array": 4}, "array"),
        ({"array": 4, "null": 1}, "array"),
        ({"object": 2, "null": 1}, "object"),
        ({"array": 1, "object": 1}, "mixed"),
        ({"array": 1, "number": 1}, "mixed"),
        ({"object": 1, "string": 3}, "mixed"),
    ],
)
def test_merge_kinds_lattice(spark, kinds, want):
    rows = [("f", k, n) for k, n in kinds.items()]
    hist = spark.createDataFrame(rows, "field string, kind string, n long")
    out = merge_kinds(hist).collect()
    assert len(out) == 1
    assert out[0]["kind"] == want
    assert out[0]["n"] == sum(kinds.values())


def test_merge_kinds_drops_invalid_and_keeps_fields_separate(spark):
    hist = spark.createDataFrame(
        [
            ("a", "number", 2),
            ("a", "string", 1),
            ("b", "array", 3),
            (MALFORMED_FIELD, "invalid", 9),
        ],
        "field string, kind string, n long",
    )
    out = {r["field"]: (r["kind"], r["n"]) for r in merge_kinds(hist).collect()}
    assert out == {"a": ("string", 3), "b": ("array", 3)}
