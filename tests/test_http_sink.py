"""http sink against a LIVE localhost server — executor-side delivery,
batching, codecs, and pipeline-config wiring (config_panel.rs:1929-1965)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from vector_spark.plans import http_sink
from vector_spark.plans.pipeline import Pipeline


@pytest.fixture()
def http_capture():
    """Tiny threaded HTTP server capturing (method, content_type, body)."""
    captured: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def _handle(self):
            n = int(self.headers.get("Content-Length", 0))
            captured.append(
                {
                    "method": self.command,
                    "ctype": self.headers.get("Content-Type"),
                    "body": self.rfile.read(n).decode(),
                }
            )
            self.send_response(200)
            self.end_headers()

        do_POST = _handle
        do_PUT = _handle

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/ingest", captured
    srv.shutdown()


def test_ndjson_delivery_all_rows(spark, http_capture):
    uri, captured = http_capture
    df = spark.createDataFrame(
        [(i, f"msg-{i}") for i in range(50)], "event_id long, message string"
    ).repartition(4)
    http_sink.HttpSinkPlan(uri, codec="ndjson").run_batch(df)
    lines = [ln for c in captured for ln in c["body"].strip().splitlines()]
    assert len(lines) == 50
    assert {json.loads(ln)["event_id"] for ln in lines} == set(range(50))
    assert all(c["method"] == "POST" for c in captured)
    assert all(c["ctype"] == "application/x-ndjson" for c in captured)
    assert len(captured) >= 2  # partitions delivered independently


def test_json_array_codec_and_put(spark, http_capture):
    uri, captured = http_capture
    df = spark.createDataFrame([(1, "a"), (2, "b")], "event_id long, message string").coalesce(1)
    http_sink.HttpSinkPlan(uri, method="put", codec="json").run_batch(df)
    assert captured[0]["method"] == "PUT"
    events = json.loads(captured[0]["body"])
    assert {e["event_id"] for e in events} == {1, 2}


def test_batch_max_events_splits_requests(spark, http_capture):
    uri, captured = http_capture
    df = spark.createDataFrame([(i,) for i in range(10)], "event_id long").coalesce(1)
    http_sink.HttpSinkPlan(uri, batch_max_events=3).run_batch(df)
    sizes = [len(c["body"].strip().splitlines()) for c in captured]
    assert sorted(sizes, reverse=True) == [3, 3, 3, 1]


def test_text_codec_sends_message_field(spark, http_capture):
    uri, captured = http_capture
    df = spark.createDataFrame([("hello",), ("world",)], "message string").coalesce(1)
    http_sink.HttpSinkPlan(uri, codec="text").run_batch(df)
    assert captured[0]["body"] == "hello\nworld\n"
    assert captured[0]["ctype"] == "text/plain"


def test_pipeline_http_sink_from_config(spark, http_capture):
    uri, captured = http_capture
    p = Pipeline.from_dict(
        {
            "sources": {"gen": {"type": "demo_logs", "count": 8, "format": "json"}},
            "sinks": {
                "out": {
                    "type": "http",
                    "inputs": ["gen"],
                    "uri": uri,
                    "method": "post",
                    "encoding": {"codec": "ndjson"},
                }
            },
        }
    )
    assert p.validate() == []
    p.run(spark)
    lines = [ln for c in captured for ln in c["body"].strip().splitlines()]
    assert len(lines) == 8


def test_invalid_options_rejected():
    with pytest.raises(ValueError, match="method"):
        http_sink.HttpSinkPlan("http://x", method="delete")
    with pytest.raises(ValueError, match="codec"):
        http_sink.HttpSinkPlan("http://x", codec="avro")
