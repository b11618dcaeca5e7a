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
