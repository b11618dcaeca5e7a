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


# ---------------------------------------------------------------------------
# tail_sample — tail-based trace sampling
# ---------------------------------------------------------------------------
from vector_spark.operators import tail_sample


def test_tail_sample_error_policy_keeps_whole_trace(spark, spans):
    # keep_fraction=0: only policy hits survive.  T1 and T3 each contain an
    # error span -> ALL their spans kept; T2 (no errors) dropped entirely
    out = tail_sample(spans, keep_fraction=0.0, with_decision=True)
    rows = out.collect()
    by_trace = {}
    for r in rows:
        by_trace.setdefault(r["trace_id"], set()).add(r["sample_decision"])
    assert set(by_trace) == {"T1", "T3"}
    assert by_trace["T1"] == {"error"} and by_trace["T3"] == {"error"}
    # trace-complete: every span of T1 survives
    assert sum(1 for r in rows if r["trace_id"] == "T1") == 3


def test_tail_sample_latency_policy(spark, spans):
    # no errors considered (status_col=None); T1 wall = 300ms, T2 = 30ms,
    # T3 = 10ms -> threshold 100ms keeps only T1, tagged 'slow'
    out = tail_sample(
        spans, keep_fraction=0.0, status_col=None,
        slow_threshold_us=100_000, with_decision=True,
    ).collect()
    assert {r["trace_id"] for r in out} == {"T1"}
    assert {r["sample_decision"] for r in out} == {"slow"}


def test_tail_sample_probabilistic_deterministic_and_whole(spark):
    rows = [(f"T{i}", f"s{i}{j}") for i in range(200) for j in range(3)]
    spans = spark.createDataFrame(rows, "trace_id string, span_id string")
    out1 = tail_sample(
        spans, keep_fraction=0.3, status_col=None, seed="x"
    ).collect()
    out2 = tail_sample(
        spans.repartition(16), keep_fraction=0.3, status_col=None, seed="x"
    ).collect()
    # deterministic under partitioning
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    # traces kept whole: every surviving trace has all 3 spans
    from collections import Counter

    c = Counter(r["trace_id"] for r in out1)
    assert c and set(c.values()) == {3}
    # rate in the right ballpark
    assert 0.15 < len(c) / 200 < 0.45


def test_tail_sample_md5_twin_matches_convention(spark):
    rows = [(f"T{i}", "s") for i in range(500)]
    spans = spark.createDataFrame(rows, "trace_id string, span_id string")
    kept = {
        r["trace_id"]
        for r in tail_sample(
            spans, keep_fraction=0.2, status_col=None, method="md5", seed="z"
        ).collect()
    }
    import hashlib

    want = {
        f"T{i}"
        for i in range(500)
        if int(hashlib.md5(f"T{i}z".encode()).hexdigest()[:7], 16) % 1_000_000
        < 200_000
    }
    assert kept == want


def test_tail_sample_null_trace_handling(spark):
    rows = [("T1", "a", 2), (None, "b", 1), (None, "c", 2)]
    spans = spark.createDataFrame(rows, "trace_id string, span_id string, status_code int")
    # default: untraced spans dropped
    out = tail_sample(spans, keep_fraction=0.0)
    assert {r["span_id"] for r in out.collect()} == {"a"}
    # opt-in: retained, tagged
    out2 = tail_sample(spans, keep_fraction=0.0, keep_untraced=True, with_decision=True)
    got = {r["span_id"]: r["sample_decision"] for r in out2.collect()}
    assert got == {"a": "error", "b": "untraced", "c": "untraced"}


def test_tail_sample_validation(spark, spans):
    with pytest.raises(ValueError, match="keep_fraction"):
        tail_sample(spans, keep_fraction=1.5)
    with pytest.raises(ValueError, match="slow_threshold"):
        tail_sample(spans, slow_threshold_us=-1)
    with pytest.raises(ValueError, match="hash method"):
        tail_sample(spans, method="sha1")
    with pytest.raises(ValueError, match="unknown columns"):
        tail_sample(spans.drop("status_code"))


# ---------------------------------------------------------------------------
# span_metrics — the spanmetrics RED connector
# ---------------------------------------------------------------------------
from vector_spark.operators import span_metrics


@pytest.fixture(scope="module")
def red_spans(spark):
    rows = [
        # window 0 (minute 0): api/GET 3 calls (1 error), durations
        # 500 / 5_000 / 2_000_000 us -> buckets [1,1,0,0,1]
        ("api", "GET", 1, _ts(0), 500),
        ("api", "GET", 2, _ts(1), 5_000),
        ("api", "GET", 1, _ts(2), 2_000_000),
        # window 0: db/SELECT 1 call, NULL duration (counts, no bucket)
        ("db", "SELECT", 1, _ts(3), None),
        # window 1 (minute 1): api/GET 1 call at a bucket EDGE (1000 ->
        # upper-inclusive bucket 0)
        ("api", "GET", 1, datetime(2024, 1, 1, 0, 1, 0), 1_000),
    ]
    return spark.createDataFrame(
        rows,
        "service string, name string, status_code int, "
        "start_timestamp timestamp, duration_us long",
    )


def test_span_metrics_red_histogram(spark, red_spans):
    out = {
        (r["service"], r["name"], r["window_start"].minute): r
        for r in span_metrics(red_spans, window_s=60).collect()
    }
    g0 = out[("api", "GET", 0)]
    assert g0["n_calls"] == 3 and g0["n_errors"] == 1
    assert g0["duration_sum"] == 2_005_500.0
    assert g0["bucket_counts"] == [1, 1, 0, 0, 1]
    assert g0["explicit_bounds"] == [1_000.0, 10_000.0, 100_000.0, 1_000_000.0]
    d0 = out[("db", "SELECT", 0)]
    # NULL duration: counted as a call, absent from buckets and sum
    assert d0["n_calls"] == 1 and d0["duration_sum"] is None
    assert d0["bucket_counts"] == [0, 0, 0, 0, 0]
    # upper-inclusive edge: exactly 1000us lands in bucket 0
    assert out[("api", "GET", 1)]["bucket_counts"] == [1, 0, 0, 0, 0]


def test_span_metrics_feeds_histogram_quantile(spark, red_spans):
    from vector_spark.operators import histogram_quantile

    red = span_metrics(red_spans, window_s=60)
    out = histogram_quantile(red.where("n_calls = 3"), 0.5).collect()
    # p50 of [1,1,0,0,1]: rank 1.5 -> second bucket (1000, 10000],
    # interpolated at (1.5-1)/1 through it
    assert len(out) == 1
    assert out[0]["q0_5"] == pytest.approx(1000 + 0.5 * 9000)


def test_span_metrics_validation(spark, red_spans):
    with pytest.raises(ValueError, match="window_s"):
        span_metrics(red_spans, window_s=0)
    with pytest.raises(ValueError, match="increasing"):
        span_metrics(red_spans, bounds=(10.0, 5.0))
    with pytest.raises(ValueError, match="increasing"):
        span_metrics(red_spans, bounds=())
    with pytest.raises(ValueError, match="unknown columns"):
        span_metrics(red_spans.drop("duration_us"))


def test_span_metrics_exemplars(spark, red_spans):
    spans = red_spans.withColumn(
        "span_id", F.concat(F.lit("s"), F.col("duration_us").cast("string"))
    )
    out = {
        (r["service"], r["name"], r["window_start"].minute): r
        for r in span_metrics(spans, window_s=60, exemplar_col="span_id").collect()
    }
    g0 = out[("api", "GET", 0)]
    # each populated bucket carries the MIN exemplar of its spans; empty
    # buckets (and the NULL-duration-only group) hold NULL
    assert g0["exemplars"] == ["s500", "s5000", None, None, "s2000000"]
    assert out[("db", "SELECT", 0)]["exemplars"] == [None] * 5
    with pytest.raises(ValueError, match="unknown columns"):
        span_metrics(spans, exemplar_col="nope")
