"""Incremental materialized-view maintenance (plans/matview.py): O(delta)
refresh must equal a from-scratch aggregate after every window, and refuse
(never go silently stale) when the window is not merge-derivable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.plans import matview as MV
from vector_spark.plans import table_format as TF
from vector_spark.plans.checkpoint import PART_COL

AGGS = {
    "n": ("count", None),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _events(spark, start, end, part):
    return spark.range(start, end).select(
        F.concat(F.lit("svc"), (F.col("id") % 3).cast("string")).alias("svc"),
        (F.col("id") % 100).cast("long").alias("v"),
        F.lit(part).alias(PART_COL),
    )


def _expected(spark, base):
    src = TF.read_table(spark, base, "facts")
    return {
        r["svc"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in src.groupBy("svc")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }


def _view(spark, base):
    return {
        r["svc"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in TF.read_table(spark, base, "mv").collect()
    }


def test_build_then_incremental_refresh_equals_full(spark, tmp_path):
    base = str(tmp_path / "t")
    TF.write_multi_sink({"facts": _events(spark, 0, 500, "p0")}, base)
    out = MV.matview_build(spark, base, "facts", "mv", ["svc"], AGGS)
    assert out["mode"] == "full"
    assert _view(spark, base) == _expected(spark, base)

    # two more append snapshots, then ONE refresh folds both
    TF.write_multi_sink({"facts": _events(spark, 500, 800, "p1")}, base)
    TF.write_multi_sink({"facts": _events(spark, 800, 1100, "p2")}, base)
    out = MV.matview_refresh(spark, base, "facts", "mv", ["svc"], AGGS)
    assert out["mode"] == "incremental" and out["groups_updated"] == 3
    assert _view(spark, base) == _expected(spark, base)

    # nothing new -> noop, state still advances nowhere
    out = MV.matview_refresh(spark, base, "facts", "mv", ["svc"], AGGS)
    assert out["mode"] == "noop"
    assert _view(spark, base) == _expected(spark, base)


def test_refresh_touches_only_affected_groups(spark, tmp_path):
    base = str(tmp_path / "t")
    TF.write_multi_sink({"facts": _events(spark, 0, 300, "p0")}, base)
    MV.matview_build(spark, base, "facts", "mv", ["svc"], AGGS)
    # the delta holds ONLY svc0 rows (ids ≡ 0 mod 3)
    delta = _events(spark, 300, 400, "p1").where(F.col("svc") == "svc0")
    TF.write_multi_sink({"facts": delta}, base)
    out = MV.matview_refresh(spark, base, "facts", "mv", ["svc"], AGGS)
    assert out["groups_updated"] == 1
    assert _view(spark, base) == _expected(spark, base)


def test_delete_window_refuses_then_rebuild_recovers(spark, tmp_path):
    base = str(tmp_path / "t")
    TF.write_multi_sink({"facts": _events(spark, 0, 300, "p0")}, base)
    MV.matview_build(spark, base, "facts", "mv", ["svc"], AGGS)
    TF.write_multi_sink({"facts": _events(spark, 300, 400, "p1")}, base)
    TF.delete_keys(spark, base, "facts", spark.createDataFrame(
        [("svc1", 1)], f"svc string, v long").select("svc", "v"), ["svc"])
    with pytest.raises(TF.IncrementalUnavailable, match="deletes"):
        MV.matview_refresh(spark, base, "facts", "mv", ["svc"], AGGS)
    # the failed refresh must not have moved state or corrupted the view
    # (build pinned the source at version 1 — before the MV's own commit)
    st = MV.matview_state(base, "mv")
    assert st["src_version"] == 1
    out = MV.matview_build(
        spark, base, "facts", "mv", ["svc"], AGGS, overwrite=True
    )
    assert out["mode"] == "full"
    assert _view(spark, base) == _expected(spark, base)
    # and incremental refresh works again after the rebuild
    TF.write_multi_sink({"facts": _events(spark, 400, 500, "p2")}, base)
    out = MV.matview_refresh(spark, base, "facts", "mv", ["svc"], AGGS)
    assert out["mode"] == "incremental"
    assert _view(spark, base) == _expected(spark, base)


def test_null_group_values_are_real_groups(spark, tmp_path):
    base = str(tmp_path / "t")
    rows = _events(spark, 0, 100, "p0").withColumn(
        "svc", F.when(F.col("v") % 2 == 0, F.col("svc"))
    )
    TF.write_multi_sink({"facts": rows}, base)
    MV.matview_build(spark, base, "facts", "mv", ["svc"], AGGS)
    more = _events(spark, 100, 200, "p1").withColumn(
        "svc", F.when(F.col("v") % 2 == 0, F.col("svc"))
    )
    TF.write_multi_sink({"facts": more}, base)
    MV.matview_refresh(spark, base, "facts", "mv", ["svc"], AGGS)
    got = _view(spark, base)
    assert got == _expected(spark, base)
    assert None in got  # the NULL-svc group merged, not dropped


def test_validation_and_state_guards(spark, tmp_path):
    base = str(tmp_path / "t")
    TF.write_multi_sink({"facts": _events(spark, 0, 50, "p0")}, base)
    with pytest.raises(ValueError, match="never built"):
        MV.matview_refresh(spark, base, "facts", "mv", ["svc"], AGGS)
    with pytest.raises(ValueError, match="not mergeable"):
        MV.matview_build(spark, base, "facts", "mv", ["svc"], {"a": ("avg", "v")})
    with pytest.raises(ValueError, match="collides"):
        MV.matview_build(spark, base, "facts", "mv", ["svc"], {"svc": ("sum", "v")})
    MV.matview_build(spark, base, "facts", "mv", ["svc"], AGGS)
    with pytest.raises(ValueError, match="already built"):
        MV.matview_build(spark, base, "facts", "mv", ["svc"], AGGS)
    with pytest.raises(ValueError, match="tracks source"):
        MV.matview_refresh(spark, base, "other", "mv", ["svc"], AGGS)


def test_matview_over_hidden_partitioned_source(spark, tmp_path):
    # the changelog reader works per-spec; the view must not care how the
    # source is laid out
    base = str(tmp_path / "t")
    # a spec'd sink's partitions derive from the data, so a second batch
    # hits ALREADY-COMMITTED partitions — write_multi_sink's partition-
    # level exactly-once model deliberately skips those; add_files is the
    # file-level append for that case, and the changelog reports it
    TF.write_multi_sink(
        {"facts": _events(spark, 0, 300, "p0")}, base,
        spec=[("bucket", "svc", 4)], run_id="w1",
    )
    MV.matview_build(spark, base, "facts", "mv", ["svc"], AGGS)
    TF.add_files(spark, base, "facts", _events(spark, 300, 600, "p1"))
    out = MV.matview_refresh(spark, base, "facts", "mv", ["svc"], AGGS)
    assert out["mode"] == "incremental"
    assert _view(spark, base) == _expected(spark, base)
