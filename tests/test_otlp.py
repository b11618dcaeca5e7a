"""OTLP/JSON logs decode — nesting, AnyValue arms, timestamps, malformed
input.  Reference: opentelemetry source palette row (config_panel.rs:1290-
1415); wire shape per the public opentelemetry-proto JSON mapping."""

import json

import pytest

from vector_spark.sources.otlp import otlp_logs_parse

_BODY = {
    "resourceLogs": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.name", "value": {"stringValue": "checkout"}},
                    {"key": "host.id", "value": {"intValue": "42"}},
                ]
            },
            "scopeLogs": [
                {
                    "scope": {"name": "app.logger", "version": "1.2"},
                    "logRecords": [
                        {
                            "timeUnixNano": "1700000000123456789",
                            "observedTimeUnixNano": "1700000001000000000",
                            "severityNumber": 9,
                            "severityText": "Info",
                            "body": {"stringValue": "user logged in"},
                            "attributes": [
                                {"key": "user_id", "value": {"intValue": "7"}},
                                {"key": "ok", "value": {"boolValue": True}},
                                {"key": "latency_ms", "value": {"doubleValue": 12.5}},
                            ],
                            "traceId": "0af7651916cd43dd8448eb211c80319c",
                            "spanId": "b7ad6b7169203331",
                        },
                        {
                            "timeUnixNano": "1700000002000000000",
                            "severityNumber": 17,
                            "severityText": "Error",
                            "body": {"stringValue": "boom"},
                            "attributes": [],
                        },
                    ],
                }
            ],
        },
        {
            "resource": {"attributes": []},
            "scopeLogs": [
                {
                    "scope": {"name": "other"},
                    "logRecords": [
                        {
                            "timeUnixNano": "1700000003000000000",
                            "body": {"doubleValue": 3.5},
                            "attributes": [],
                        }
                    ],
                }
            ],
        },
    ]
}


def test_otlp_logs_flatten(spark):
    df = spark.createDataFrame([(1, json.dumps(_BODY))], "req_id int, message string")
    out = otlp_logs_parse(df).orderBy("timestamp").collect()
    assert len(out) == 3

    r0 = out[0]
    assert r0["req_id"] == 1
    assert r0["body"] == "user logged in"
    assert r0["severity_text"] == "Info" and r0["severity_number"] == 9
    assert r0["resource"] == {"service.name": "checkout", "host.id": "42"}
    assert r0["attributes"] == {"user_id": "7", "ok": "true", "latency_ms": "12.5"}
    assert r0["scope_name"] == "app.logger"
    assert r0["trace_id"] == "0af7651916cd43dd8448eb211c80319c"
    # nanos → micros truncation, wall time preserved
    assert r0["timestamp"].isoformat().startswith("2023-11-14T22:13:20.123456")
    assert r0["observed_timestamp"].isoformat().startswith("2023-11-14T22:13:21")

    r1 = out[1]
    assert r1["body"] == "boom" and r1["attributes"] == {} and r1["observed_timestamp"] is None

    r2 = out[2]
    assert r2["body"] == "3.5" and r2["resource"] == {} and r2["scope_name"] == "other"


def test_otlp_malformed_rows_drop_not_crash(spark):
    df = spark.createDataFrame(
        [(1, json.dumps(_BODY)), (2, "not json at all"), (3, "{}")],
        "req_id int, message string",
    )
    out = otlp_logs_parse(df)
    assert out.count() == 3
    assert {r["req_id"] for r in out.collect()} == {1}


def test_otlp_duplicate_attribute_key_keeps_last(spark):
    """A repeated attribute key (legal on the wire, emitted by buggy
    exporters) must not abort the job via mapKeyDedupPolicy=EXCEPTION —
    the LAST occurrence wins (proto3 merge semantics)."""
    body = {
        "resourceLogs": [{
            "resource": {"attributes": [
                {"key": "k", "value": {"stringValue": "a"}},
                {"key": "k", "value": {"stringValue": "b"}},
            ]},
            "scopeLogs": [{
                "scope": {"name": "s"},
                "logRecords": [{
                    "timeUnixNano": "1700000000000000000",
                    "body": {"stringValue": "m"},
                    "attributes": [
                        {"key": "a", "value": {"intValue": "1"}},
                        {"key": "a", "value": {"intValue": "2"}},
                        {"key": "b", "value": {"intValue": "3"}},
                    ],
                }],
            }],
        }]
    }
    df = spark.createDataFrame([(json.dumps(body),)], "message string")
    rows = otlp_logs_parse(df).collect()
    assert len(rows) == 1
    assert rows[0].resource == {"k": "b"}
    assert rows[0].attributes == {"a": "2", "b": "3"}


# ---------------------------------------------------------------------------
# Traces + metrics signals
# ---------------------------------------------------------------------------

from vector_spark.sources.otlp import otlp_metrics_parse, otlp_traces_parse  # noqa: E402

_TRACE_BODY = {
    "resourceSpans": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.name", "value": {"stringValue": "checkout"}}
                ]
            },
            "scopeSpans": [
                {
                    "scope": {"name": "app.tracer", "version": "1.0"},
                    "spans": [
                        {
                            "traceId": "0af7651916cd43dd8448eb211c80319c",
                            "spanId": "b7ad6b7169203331",
                            "name": "GET /cart",
                            "kind": 2,
                            "startTimeUnixNano": "1700000000000000000",
                            "endTimeUnixNano": "1700000000250000000",
                            "attributes": [
                                {"key": "http.status", "value": {"intValue": "200"}},
                                {"key": "http.status", "value": {"intValue": "204"}},
                            ],
                            "status": {"code": 1, "message": ""},
                            "events": [
                                {"timeUnixNano": "1700000000100000000", "name": "cache.miss"},
                                {"timeUnixNano": "1700000000200000000", "name": "db.query"},
                            ],
                        },
                        {
                            "traceId": "0af7651916cd43dd8448eb211c80319c",
                            "spanId": "c7ad6b7169203332",
                            "parentSpanId": "b7ad6b7169203331",
                            "name": "SELECT",
                            "kind": 3,
                            "startTimeUnixNano": "1700000000120000000",
                            "endTimeUnixNano": "1700000000180000000",
                            "status": {"code": 2, "message": "timeout"},
                        },
                    ],
                }
            ],
        }
    ]
}


def test_otlp_traces_flatten_and_span_semantics(spark):
    df = spark.createDataFrame([(1, json.dumps(_TRACE_BODY))], "id int, message string")
    rows = {r["span_id"]: r for r in otlp_traces_parse(df).collect()}
    assert set(rows) == {"b7ad6b7169203331", "c7ad6b7169203332"}

    root = rows["b7ad6b7169203331"]
    assert root["parent_span_id"] is None  # proto3 absent -> NULL root marker
    assert root["name"] == "GET /cart" and root["kind"] == 2
    assert root["duration_us"] == 250_000
    assert root["n_events"] == 2
    assert root["attributes"]["http.status"] == "204"  # repeated key: last wins
    assert root["resource"]["service.name"] == "checkout"
    assert root["scope_name"] == "app.tracer"
    assert root["status_code"] == 1

    child = rows["c7ad6b7169203332"]
    assert child["parent_span_id"] == "b7ad6b7169203331"
    assert child["duration_us"] == 60_000 and child["n_events"] == 0
    assert child["status_code"] == 2 and child["status_message"] == "timeout"
    # epoch-nano precision survives the decimal path (no double rounding)
    assert root["start_timestamp"].microsecond == 0
    assert root["end_timestamp"].microsecond == 250_000


_METRIC_BODY = {
    "resourceMetrics": [
        {
            "resource": {
                "attributes": [
                    {"key": "service.name", "value": {"stringValue": "checkout"}}
                ]
            },
            "scopeMetrics": [
                {
                    "scope": {"name": "app.meter", "version": "1.0"},
                    "metrics": [
                        {
                            "name": "mem_usage",
                            "unit": "MiB",
                            "gauge": {
                                "dataPoints": [
                                    {
                                        "attributes": [
                                            {"key": "pool", "value": {"stringValue": "heap"}}
                                        ],
                                        "timeUnixNano": "1700000000000000000",
                                        "asDouble": 512.25,
                                    }
                                ]
                            },
                        },
                        {
                            "name": "requests_total",
                            "unit": "1",
                            "sum": {
                                "dataPoints": [
                                    {
                                        "timeUnixNano": "1700000001000000000",
                                        "asInt": "12345",
                                    }
                                ],
                                "aggregationTemporality": 2,
                                "isMonotonic": True,
                            },
                        },
                        {
                            "name": "latency",
                            "unit": "ms",
                            "histogram": {
                                "dataPoints": [
                                    {
                                        "timeUnixNano": "1700000002000000000",
                                        "count": "7",
                                        "sum": 99.5,
                                        "bucketCounts": ["3", "3", "1"],
                                        "explicitBounds": [5.0, 50.0],
                                    }
                                ],
                                "aggregationTemporality": 1,
                            },
                        },
                    ],
                }
            ],
        }
    ]
}


def test_otlp_metrics_three_point_kinds_normalized(spark):
    df = spark.createDataFrame([(1, json.dumps(_METRIC_BODY))], "id int, message string")
    rows = {r["metric_name"]: r for r in otlp_metrics_parse(df).collect()}
    assert set(rows) == {"mem_usage", "requests_total", "latency"}

    g = rows["mem_usage"]
    assert g["metric_type"] == "gauge" and g["value"] == 512.25
    assert g["count"] is None and g["bucket_counts"] is None
    assert g["temporality"] is None and g["is_monotonic"] is None
    assert g["attributes"]["pool"] == "heap"
    assert g["resource"]["service.name"] == "checkout"

    s = rows["requests_total"]
    assert s["metric_type"] == "sum" and s["value"] == 12345.0
    assert s["temporality"] == 2 and s["is_monotonic"] is True

    h = rows["latency"]
    assert h["metric_type"] == "histogram" and h["value"] is None
    assert h["count"] == 7 and h["sum"] == 99.5
    assert list(h["bucket_counts"]) == [3, 3, 1]
    assert list(h["explicit_bounds"]) == [5.0, 50.0]
    assert h["temporality"] == 1


def test_otlp_traces_metrics_malformed_dropped(spark):
    df = spark.createDataFrame(
        [(1, "{not json"), (2, json.dumps({"resourceSpans": []}))],
        "id int, message string",
    )
    assert otlp_traces_parse(df).count() == 0
    assert otlp_metrics_parse(df.withColumnRenamed("message", "m"), "m").count() == 0


def test_otlp_metrics_summary_and_exponential_histogram(spark):
    body = {
        "resourceMetrics": [{
            "resource": {"attributes": []},
            "scopeMetrics": [{
                "scope": {"name": "m"},
                "metrics": [
                    {
                        "name": "rpc_latency",
                        "unit": "ms",
                        "summary": {
                            "dataPoints": [{
                                "timeUnixNano": "1700000000000000000",
                                "count": "100",
                                "sum": 2500.0,
                                "quantileValues": [
                                    {"quantile": 0.5, "value": 20.0},
                                    {"quantile": 0.99, "value": 95.5},
                                ],
                            }]
                        },
                    },
                    {
                        "name": "req_size",
                        "unit": "By",
                        "exponentialHistogram": {
                            "dataPoints": [{
                                "timeUnixNano": "1700000001000000000",
                                "count": "10",
                                "sum": 30.5,
                                "scale": 0,
                                "zeroCount": "2",
                                "positive": {"offset": 0, "bucketCounts": ["2", "4", "2"]},
                            }],
                            "aggregationTemporality": 2,
                        },
                    },
                ],
            }],
        }]
    }
    df = spark.createDataFrame([(json.dumps(body),)], "message string")
    rows = {r["metric_name"]: r for r in otlp_metrics_parse(df).collect()}

    s = rows["rpc_latency"]
    assert s["metric_type"] == "summary"
    assert s["count"] == 100 and s["sum"] == 2500.0
    assert [(qv["quantile"], qv["value"]) for qv in s["quantiles"]] == [
        (0.5, 20.0), (0.99, 95.5)
    ]
    assert s["scale"] is None and s["value"] is None

    e = rows["req_size"]
    assert e["metric_type"] == "exp_histogram"
    assert e["scale"] == 0 and e["zero_count"] == 2
    assert e["positive_offset"] == 0
    assert list(e["positive_bucket_counts"]) == [2, 4, 2]
    assert e["negative_bucket_counts"] is None
    assert e["temporality"] == 2 and e["count"] == 10


def test_exp_histogram_quantile(spark):
    from vector_spark.operators import exp_histogram_quantile

    # scale=0 -> base=2; buckets: (1,2], (2,4], (4,8]; zero bucket holds 2
    df = spark.createDataFrame(
        [(1, 0, 2, 0, [2, 4, 2]), (2, 0, 5, 0, [1, 1, 1]), (3, 0, 0, 0, None)],
        "id int, scale int, zero_count long, positive_offset int, "
        "positive_bucket_counts array<long>",
    )
    out = {r["id"]: r["q0_5"] for r in exp_histogram_quantile(df, 0.5).collect()}
    # id 1: total 10, rank 5; zero(2) + b0(2) = 4 < 5; bucket (2,4]:
    # interp = 2 + 2 * (5-4)/4
    assert out[1] == 2.0 + 2.0 * (5 - 4) / 4
    # id 2: total 8, rank 4; zero holds 5 >= 4 -> 0.0
    assert out[2] == 0.0
    # id 3: empty -> NULL
    assert out[3] is None
    # higher scale: base = 2^(2^-1) = sqrt(2)
    df2 = spark.createDataFrame(
        [(1, 1, 0, 2, [4])],
        "id int, scale int, zero_count long, positive_offset int, "
        "positive_bucket_counts array<long>",
    )
    v = exp_histogram_quantile(df2, 1.0).collect()[0]["q1_0"]
    assert v == pytest.approx(2.0 ** 1.5)  # upper bound of bucket (b^2, b^3]
