"""OTLP/JSON logs decode — nesting, AnyValue arms, timestamps, malformed
input.  Reference: opentelemetry source palette row (config_panel.rs:1290-
1415); wire shape per the public opentelemetry-proto JSON mapping."""

import json

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
