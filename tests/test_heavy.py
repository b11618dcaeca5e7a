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


# ---------------------------------------------------------------------------
# windowed_heavy_hitters
# ---------------------------------------------------------------------------
from datetime import datetime, timezone

from vector_spark.functions import windowed_heavy_hitters


def _ts(m, s=0):
    return datetime(2024, 1, 1, 0, m, s, tzinfo=timezone.utc).replace(tzinfo=None)


def _naive_windowed(df, key_cols, ts_col, window_s, frac):
    from pyspark.sql.window import Window as W

    w = F.floor(F.col(ts_col).cast("timestamp").cast("double") / window_s)
    c = df.groupBy(w.alias("_w"), *key_cols).agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(W.partitionBy("_w"))
    out = c.withColumn("_t", tot).filter(F.col("n") > F.col("_t") * frac)
    return {
        (r["_w"],) + tuple(r[k] for k in key_cols) + (r["n"],)
        for r in out.collect()
    }


def _wh(df, key_cols, ts_col, window_s, frac, **kw):
    out = windowed_heavy_hitters(df, key_cols, ts_col, window_s, frac, **kw)

    def wid(r):
        ws = r["window_start"]
        if ws is None:
            return None
        epoch = ws.replace(tzinfo=timezone.utc).timestamp()
        return int(epoch // window_s)

    return {
        (wid(r),) + tuple(r[k] for k in key_cols) + (r["n"],)
        for r in out.collect()
    }


def test_windowed_equals_naive(spark):
    # 3 one-minute windows; each window has its own hot key + uniform tail
    rows = []
    for w in range(3):
        rows += [(f"hot{w}", _ts(w, s % 60)) for s in range(120)]
        rows += [(f"cold{w}_{i}", _ts(w, i % 60)) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, ts timestamp").repartition(8)
    got = _wh(df, ["k"], "ts", 60, 0.25)
    assert got == _naive_windowed(df, ["k"], "ts", 60, 0.25)
    # each window's hot key found, cross-window keys don't leak
    assert {t[1] for t in got} == {"hot0", "hot1", "hot2"}


def test_windowed_key_heavy_in_one_window_only(spark):
    # key is heavy in window 0, light in window 1 — must appear ONLY for w0
    rows = [("x", _ts(0, s % 60)) for s in range(90)] + [
        (f"a{i}", _ts(0, i % 60)) for i in range(30)
    ]
    rows += [("x", _ts(1, 0))] + [(f"b{i}", _ts(1, i % 60)) for i in range(99)]
    df = spark.createDataFrame(rows, "k string, ts timestamp").repartition(6)
    got = _wh(df, ["k"], "ts", 60, 0.5)
    naive = _naive_windowed(df, ["k"], "ts", 60, 0.5)
    assert got == naive
    assert [t[1] for t in got] == ["x"] and len(got) == 1


def test_windowed_null_ts_and_null_keys(spark):
    rows = [(None, None)] * 40 + [("k1", None)] * 5 + [(None, _ts(0))] * 30 + [
        ("z", _ts(0))
    ] * 5
    df = spark.createDataFrame(rows, "k string, ts timestamp").repartition(4)
    got = _wh(df, ["k"], "ts", 60, 0.5)
    assert got == _naive_windowed(df, ["k"], "ts", 60, 0.5)
    # NULL window is a real group (its heavy key is the NULL key)
    assert (None, None, 40) in got


def test_windowed_partition_invariance(spark):
    rows = [(i % 11, _ts(i % 4, i % 60)) for i in range(4000)] + [
        (99, _ts(2, 30))
    ] * 500
    df = spark.createDataFrame(rows, "k int, ts timestamp")
    want = _naive_windowed(df, ["k"], "ts", 60, 0.1)
    assert _wh(df.repartition(1), ["k"], "ts", 60, 0.1) == want
    assert _wh(df.repartition(32), ["k"], "ts", 60, 0.1) == want


def test_windowed_validation(spark):
    df = spark.createDataFrame([("a", _ts(0))], "k string, ts timestamp")
    with pytest.raises(ValueError, match="frac"):
        windowed_heavy_hitters(df, ["k"], "ts", 60, 0.0)
    with pytest.raises(ValueError, match="window_s"):
        windowed_heavy_hitters(df, ["k"], "ts", 0, 0.1)
    with pytest.raises(ValueError, match="unknown ts"):
        windowed_heavy_hitters(df, ["k"], "nope", 60, 0.1)
    with pytest.raises(ValueError, match="unknown key"):
        windowed_heavy_hitters(df, ["nope"], "ts", 60, 0.1)


def test_k_override_guards_superset_bound(spark):
    df = spark.createDataFrame([("a",)] * 10, "k string")
    # k below ceil(1/frac) voids the MG decrement proof -> rejected
    for method in METHODS:
        with pytest.raises(ValueError, match="superset"):
            heavy_hitters(df, ["k"], 0.25, k=1, method=method)
    with pytest.raises(ValueError, match="superset"):
        heavy_hitter_candidates(df, ["k"], 0.25, k=1)
    with pytest.raises(ValueError, match="superset"):
        windowed_heavy_hitters(
            spark.createDataFrame([("a", _ts(0))], "k string, ts timestamp"),
            ["k"], "ts", 60, 0.25, k=1,
        )
    # a LARGER budget is fine (fewer false positives), both engines
    rows = [("hot",)] * 50 + [(f"c{i}",) for i in range(50)]
    big = spark.createDataFrame(rows, "k string")
    for method in METHODS:
        assert _hh(big, ["k"], 0.25, k=100, method=method) == {("hot", 50)}


def test_freq_tiny_frac_falls_back_to_mg(spark):
    # frac below freqItems' 1e-4 support floor must NOT silently clamp
    # (clamping loses the superset guarantee) — the freq path hands off to
    # mg, which has no floor.  500 'hot' rows in 60_000: freq share 8.3e-3,
    # frac 5e-5 -> hot is heavy and must be found.
    df = spark.range(60_000).select(
        F.when(F.col("id") < 500, F.lit("hot"))
        .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
        .alias("k")
    ).repartition(8)
    out = _hh(df, ["k"], 5e-5, method="freq")
    assert ("hot", 500) in out
    assert out == _naive(df, ["k"], 5e-5)


# ---------------------------------------------------------------------------
# property: both engines == naive GROUP BY ... HAVING on arbitrary corpora
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as hst


@settings(max_examples=12, deadline=None)
@given(
    weights=hst.lists(hst.integers(1, 40), min_size=1, max_size=12),
    frac=hst.sampled_from([0.05, 0.1, 0.25, 0.5]),
    parts=hst.sampled_from([1, 3, 8]),
    data=hst.data(),
)
def test_property_equals_naive(spark, weights, frac, parts, data):
    keys = [None if i == 0 else f"k{i}" for i in range(len(weights))]
    rows = [(k,) for k, w in zip(keys, weights) for _ in range(w)]
    rng = random.Random(data.draw(hst.integers(0, 2**31)))
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k string").repartition(parts)
    want = _naive(df, ["k"], frac)
    for method in METHODS:
        assert _hh(df, ["k"], frac, method=method) == want
