"""Exact heavy hitters via per-partition Misra-Gries + broadcast verify.

The contract: output EQUALS ``GROUP BY keys HAVING count > n*frac`` — the
candidate pass is only allowed to over-approximate (superset), never to
lose a true heavy hitter, under any partition layout.
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from vector_spark.functions import heavy_hitter_candidates, heavy_hitters


def _naive(df, key_cols, frac):
    n = df.count()
    return {
        tuple(r[c] for c in key_cols) + (r["n"],)
        for r in df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > n * frac)
        .collect()
    }


def _hh(df, key_cols, frac, **kw):
    return {
        tuple(r[c] for c in key_cols) + (r["n"],)
        for r in heavy_hitters(df, key_cols, frac, **kw).collect()
    }


METHODS = ["freq", "mg"]


@pytest.mark.parametrize("method", METHODS)
def test_equals_naive_groupby_having(spark, method):
    # zipf-ish skew: a few hot keys over a long uniform tail
    rng = random.Random(7)
    rows = [("hot%d" % (i % 3),) for i in range(3000)] + [
        ("cold%d" % rng.randrange(5000),) for _ in range(3000)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k string")
    assert _hh(df, ["k"], 0.05, method=method) == _naive(df, ["k"], 0.05)


@pytest.mark.parametrize("method", METHODS)
def test_partition_invariance(spark, method):
    rows = [(i % 37,) for i in range(4000)] + [(999,)] * 600
    df = spark.createDataFrame(rows, "k int")
    want = _naive(df, ["k"], 0.02)
    assert _hh(df.repartition(1), ["k"], 0.02, method=method) == want
    assert _hh(df.repartition(16), ["k"], 0.02, method=method) == want


def test_multi_column_keys_and_null_groups(spark):
    # NULL is a real group in GROUP BY; the semi-join must be null-safe
    rows = [(None, "a")] * 50 + [(1, None)] * 50 + [(2, "b")] * 5
    df = spark.createDataFrame(rows, "x int, y string").repartition(8)
    for method in METHODS:
        out = _hh(df, ["x", "y"], 0.3, method=method)
        assert out == {(None, "a", 50), (1, None, 50)}
        assert out == _naive(df, ["x", "y"], 0.3)


def test_candidates_are_bounded_superset(spark):
    rows = [(i % 1000,) for i in range(20000)] + [(42,)] * 2000
    df = spark.createDataFrame(rows, "k int").repartition(8)
    frac = 0.05
    cand = heavy_hitter_candidates(df, ["k"], frac).collect()
    n_parts = df.rdd.getNumPartitions()
    k = 20  # ceil(1/0.05)
    # bounded map-side state: <= k counters + 1 sentinel per partition
    assert len(cand) <= n_parts * (k + 1)
    # sentinel rows reconstruct n exactly
    assert sum(-r["_mg_est"] for r in cand if r["_mg_est"] < 0) == 22000
    # superset of the true heavy set
    true_keys = {t[0] for t in _naive(df, ["k"], frac)}
    cand_keys = {r["k"] for r in cand if r["_mg_est"] >= 0}
    assert true_keys <= cand_keys


@pytest.mark.parametrize("method", METHODS)
def test_no_heavy_hitters_uniform(spark, method):
    df = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    assert heavy_hitters(df, ["k"], 0.01, method=method).count() == 0


@pytest.mark.parametrize("method", METHODS)
def test_empty_input(spark, method):
    df = spark.createDataFrame([], "k string")
    out = heavy_hitters(df, ["k"], 0.1, method=method)
    assert out.columns == ["k", "n"] and out.count() == 0


def test_all_null_candidate_tuple_distinct_from_dead_bucket(spark):
    # an (NULL, NULL) key that IS heavy must survive the freq path's
    # null-struct "non-candidate" bucket trick
    rows = [(None, None)] * 80 + [(1, "a")] * 10 + [(2, "b")] * 10
    df = spark.createDataFrame(rows, "x int, y string").repartition(4)
    for method in METHODS:
        out = _hh(df, ["x", "y"], 0.5, method=method)
        assert out == {(None, None, 80)}


def test_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="frac"):
        heavy_hitters(df, ["k"], 0.0)
    with pytest.raises(ValueError, match="frac"):
        heavy_hitters(df, ["k"], 1.0)
    with pytest.raises(ValueError, match="non-empty"):
        heavy_hitters(df, [], 0.1)
    with pytest.raises(ValueError, match="unknown"):
        heavy_hitters(df, ["nope"], 0.1)
    for method in METHODS:
        with pytest.raises(ValueError, match="frac"):
            heavy_hitters(df, ["k"], 0.0, method=method)
    with pytest.raises(ValueError, match="method"):
        heavy_hitters(df, ["k"], 0.1, method="nope")
