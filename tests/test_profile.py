"""Corpus profiler: exact stats, all-null columns, tie-breaks, approx path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from vector_spark.functions import profile_corpus


@pytest.fixture(scope="module")
def sample(spark):
    schema = StructType([
        StructField("id", LongType()),
        StructField("s", StringType()),
        StructField("dead", StringType()),
    ])
    rows = [
        (1, "aa", None),
        (2, "bb", None),
        (3, "aa", None),
        (4, None, None),
        (10, "cc", None),
    ]
    return spark.createDataFrame(rows, schema)


def test_profile_exact_stats(sample):
    out = {r.col_name: r for r in profile_corpus(sample).collect()}
    assert set(out) == {"id", "s", "dead"}

    rid = out["id"]
    assert (rid.n_rows, rid.n_null, rid.n_distinct) == (5, 0, 5)
    assert (rid.min_val, rid.max_val) == ("1", "10")
    assert rid.total_bytes == 6  # "1","2","3","4","10"
    # all ids unique -> mode ties -> ascending value: "1" < "10" < "2"...
    assert (rid.top_value, rid.top_count) == ("1", 1)

    rs = out["s"]
    assert (rs.n_rows, rs.n_null, rs.n_distinct) == (5, 1, 3)
    assert (rs.min_val, rs.max_val) == ("aa", "cc")
    assert rs.total_bytes == 8
    assert (rs.top_value, rs.top_count) == ("aa", 2)

    rd = out["dead"]
    assert (rd.n_rows, rd.n_null, rd.n_distinct) == (5, 5, 0)
    assert rd.min_val is None and rd.max_val is None
    assert rd.total_bytes == 0
    assert rd.top_value is None and rd.top_count is None


def test_profile_truncation_and_validation(sample):
    out = {r.col_name: r for r in profile_corpus(sample, ["s"], trunc=1).collect()}
    assert out["s"].min_val == "a" and out["s"].top_value == "a"
    with pytest.raises(ValueError, match="unknown columns"):
        profile_corpus(sample, ["nope"])
    with pytest.raises(ValueError, match="trunc"):
        profile_corpus(sample, trunc=0)


def test_profile_partition_invariant(sample):
    a = sorted(map(tuple, profile_corpus(sample.repartition(1)).collect()))
    b = sorted(map(tuple, profile_corpus(sample.repartition(13)).collect()))
    assert a == b


def test_profile_approx_path(sample):
    out = {r.col_name: r for r in profile_corpus(sample, approx=True).collect()}
    # approx distinct is within the HLL error at this size; mode is skipped
    assert abs(out["id"].n_distinct - 5) <= 1
    assert out["id"].top_value is None and out["id"].top_count is None
    # exact scalars unchanged
    assert out["s"].n_null == 1 and out["s"].total_bytes == 8
