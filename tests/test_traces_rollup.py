"""trace_rollup — span->trace assembly semantics."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from vector_spark.operators import trace_rollup


def _ts(ms: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, 0, ms * 1000)


@pytest.fixture(scope="module")
def spans(spark):
    rows = [
        # trace T1: root + 2 children (one error), overlapping spans
        ("T1", "s1", None, "GET /cart", 1, _ts(0), _ts(250), "api"),
        ("T1", "s2", "s1", "SELECT", 2, _ts(20), _ts(120), "db"),
        ("T1", "s3", "s1", "PUT cache", 1, _ts(100), _ts(300), "cache"),
        # trace T2: two roots (partial ingest) -> smallest span_id wins
        ("T2", "r2", None, "retry", 1, _ts(10), _ts(20), "api"),
        ("T2", "r1", None, "first", 1, _ts(0), _ts(30), "api"),
        # trace T3: orphaned subtree, no root at all
        ("T3", "x1", "gone", "orphan", 2, _ts(0), _ts(10), "api"),
    ]
    return spark.createDataFrame(
        rows,
        "trace_id string, span_id string, parent_span_id string, name string, "
        "status_code int, start_timestamp timestamp, end_timestamp timestamp, "
        "service string",
    )


def test_trace_rollup_counts_duration_root(spans):
    out = {r["trace_id"]: r for r in
           trace_rollup(spans, service_expr=F.col("service")).collect()}
    t1 = out["T1"]
    assert t1["n_spans"] == 3 and t1["n_errors"] == 1
    # wall clock = max(end) - min(start), not sum of span durations
    assert t1["duration_us"] == 300_000
    assert t1["root_name"] == "GET /cart"
    assert t1["services"] == ["api", "cache", "db"]  # sorted distinct

    # several roots: deterministic winner is the smallest span_id
    assert out["T2"]["root_name"] == "first"
    # no root: NULL, not an error
    assert out["T3"]["root_name"] is None
    assert out["T3"]["n_errors"] == 1


def test_trace_rollup_partition_invariant(spark, spans):
    a = sorted(map(tuple, trace_rollup(spans.repartition(1)).collect()))
    b = sorted(map(tuple, trace_rollup(spans.repartition(7, "name")).collect()))
    assert a == b


def test_service_graph_edges(spark, spans):
    from vector_spark.operators import service_graph

    out = {(r["parent_service"], r["child_service"]): r
           for r in service_graph(spans).collect()}
    # T1: s2 (db) and s3 (cache) call into s1 (api); T3's parent is not
    # ingested -> no invented edge; T2 has only roots -> no edges
    assert set(out) == {("api", "db"), ("api", "cache")}
    assert out[("api", "db")]["n_calls"] == 1
    assert out[("api", "db")]["n_errors"] == 1      # SELECT errored (code 2)
    assert out[("api", "cache")]["n_errors"] == 0


def test_service_graph_no_status(spark, spans):
    from vector_spark.operators import service_graph

    out = service_graph(spans.drop("status_code"), status_col=None).collect()
    assert {r["n_errors"] for r in out} == {0}


def test_service_graph_null_status_counts_zero_errors(spark, spans):
    from pyspark.sql import functions as F

    from vector_spark.operators import service_graph

    # proto3 omits STATUS_CODE_UNSET -> decoded spans carry NULL status;
    # an all-NULL edge must report 0 errors, never a NULL sum
    nulled = spans.withColumn("status_code", F.lit(None).cast("int"))
    out = service_graph(nulled).collect()
    assert out and all(r["n_errors"] == 0 for r in out)
