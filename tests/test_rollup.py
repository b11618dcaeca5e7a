"""rollup_hypertable — merge-aggregation exactness, nesting validation, and
the one-scan plan shape."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vector_spark.operators import rollup_hypertable

AGGS = {
    "n": ("count", None),
    "v_sum": ("sum", "v"),
    "v_min": ("min", "v"),
    "v_max": ("max", "v"),
}


@pytest.fixture(scope="module")
def ev(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            "ts",
            "event_type",
            F.round(F.col("value") * 1000).cast("long").alias("v"),
        )
        .cache()
    )


def _direct(ev, grain):
    """Ground truth: aggregate the RAW table at this grain directly."""
    return (
        ev.groupBy(F.window("ts", grain).alias("_w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("v_sum"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
        )
        .select(F.col("_w.start").alias("bucket_start"), "event_type", "n", "v_sum", "v_min", "v_max")
    )


def test_rollup_levels_match_direct_aggregation(ev):
    """Every coarser level (computed from the FINER level) must equal the
    same grain computed from raw — the mergeable-aggregate guarantee."""
    grains = ("10 minutes", "1 hour", "6 hours")
    levels = rollup_hypertable(ev, "ts", AGGS, grains, group_by=["event_type"])
    assert list(levels) == list(grains)
    for g in grains:
        got = levels[g].toPandas().sort_values(["bucket_start", "event_type"]).reset_index(drop=True)
        exp = _direct(ev, g).toPandas().sort_values(["bucket_start", "event_type"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(exp, got, check_dtype=False)


def test_rollup_counts_conserved(ev):
    levels = rollup_hypertable(ev, "ts", {"n": ("count", None)}, ("1 hour", "1 day"))
    total = ev.count()
    for g, df in levels.items():
        assert df.agg(F.sum("n")).collect()[0][0] == total, g


def test_rollup_validation(ev):
    with pytest.raises(ValueError, match="ascend"):
        rollup_hypertable(ev, "ts", AGGS, ("1 hour", "10 minutes"))
    with pytest.raises(ValueError, match="nest"):
        rollup_hypertable(ev, "ts", AGGS, ("7 minutes", "1 hour"))
    with pytest.raises(ValueError, match="mergeable"):
        rollup_hypertable(ev, "ts", {"a": ("avg", "v")}, ("1 hour",))
    with pytest.raises(ValueError, match="granularity"):
        rollup_hypertable(ev, "ts", AGGS, ("hourly",))


def test_rollup_coarse_level_reuses_fine_level(ev):
    """Plan shape: the coarsest level's plan contains exactly ONE scan of the
    base relation — coarser grains aggregate the finer rollup, not the raw
    table again."""
    levels = rollup_hypertable(ev, "ts", AGGS, ("10 minutes", "1 hour", "1 day"))
    plan = levels["1 day"]._jdf.queryExecution().optimizedPlan().toString()
    # three STACKED aggregates in one linear plan (coarse-from-fine chaining);
    # a recompute-from-raw implementation would show a single Aggregate here
    assert plan.count("Aggregate [") == 3
    assert "Union" not in plan


def test_rollup_refresh_pair_is_exported():
    """ADVICE r4: the documented continuous-aggregate pairing must be
    importable from the public surfaces the docstrings point at."""
    import vector_spark.streaming as st
    from vector_spark.operators import rollup_merge_aggs  # noqa: F401

    assert "streaming_rollup_fine" in st.__all__
    assert callable(st.streaming_rollup_fine)


def test_rollup_distinct_hll_sketches(spark):
    """Distinct counts roll up as HLL sketches: the coarse grain's estimate
    must equal the base table's exact distinct count (small cardinalities
    estimate exactly), and the merge path must agree with direct
    sketching — the property exact COUNT(DISTINCT) cannot deliver."""
    from pyspark.sql import functions as F

    from vector_spark.operators import (
        estimate_distinct,
        rollup_hypertable,
        rollup_merge_aggs,
    )

    # 4 hours × 600 events; user cardinality differs per hour (97/193/…)
    df = spark.range(2400).select(
        F.timestamp_seconds(1_699_920_000 + F.col("id") * 6).alias("ts"),  # day-aligned
        (F.col("id") % ((F.col("id") / 600).cast("int") * 96 + 97)).alias("user_id"),
        F.lit("all").alias("k"),
    )
    aggs = {"users": ("distinct", "user_id"), "n": ("count", None)}
    levels = rollup_hypertable(df, "ts", aggs, ("1 hour", "1 day"), group_by=["k"])
    day = estimate_distinct(levels["1 day"], ["users"]).collect()[0]
    exact = df.select("user_id").distinct().count()
    assert day.users == exact  # HLL is exact at these cardinalities
    assert day.n == 2400

    # refresh path: re-aggregate the FINE level's stored sketches
    merged = rollup_hypertable(
        levels["1 hour"], "bucket_start", rollup_merge_aggs(aggs), ("1 day",)
    )["1 day"]
    again = estimate_distinct(merged, ["users"]).collect()[0]
    assert again.users == exact and again.n == 2400


def test_rollup_moments_sumsq(spark):
    """count+sum+sumsq roll up algebraically; derive_stats recovers the
    SAME avg/std at every grain and through the merge-refresh path."""
    import math

    from pyspark.sql import functions as F

    from vector_spark.operators import (
        derive_stats,
        rollup_hypertable,
        rollup_merge_aggs,
    )

    df = spark.range(1440).select(
        F.timestamp_seconds(1_699_920_000 + F.col("id") * 60).alias("ts"),
        (F.col("id") % 17).cast("double").alias("lat"),
        F.lit("k").alias("k"),
    )
    aggs = {
        "n": ("count", None), "s": ("sum", "lat"), "s2": ("sumsq", "lat"),
    }
    levels = rollup_hypertable(df, "ts", aggs, ("1 hour", "1 day"), group_by=["k"])
    day = derive_stats(levels["1 day"], "n", "s", "s2").collect()[0]
    vals = [i % 17 for i in range(1440)]
    mean = sum(vals) / len(vals)
    var = sum(v * v for v in vals) / len(vals) - mean * mean
    assert abs(day.avg - mean) < 1e-9 and abs(day.std - math.sqrt(var)) < 1e-9

    merged = rollup_hypertable(
        levels["1 hour"], "bucket_start", rollup_merge_aggs(aggs), ("1 day",)
    )["1 day"]
    again = derive_stats(merged, "n", "s", "s2").collect()[0]
    assert abs(again.avg - mean) < 1e-9 and abs(again.std - math.sqrt(var)) < 1e-9
