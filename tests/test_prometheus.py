"""prometheus_scrape source: exposition-format parse (text/plain 0.0.4) and
the distributed scrape against a LIVE localhost endpoint."""

from __future__ import annotations

import math
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from vector_spark.sources import (
    prometheus_parse,
    prometheus_scrape_source,
    prometheus_types,
)

EXPO = "\n".join(
    [
        "# HELP http_requests_total Total requests.",
        "# TYPE http_requests_total counter",
        'http_requests_total{method="GET",code="200"} 1027 1395066363000',
        'http_requests_total{method="POST",code="200"} 3',
        "",
        "# TYPE temperature_celsius gauge",
        "temperature_celsius 21.5",
        'weird_label{msg="a\\"quote\\" and\\nnewline and back\\\\nslash"} 1',
        "infinite_gauge +Inf",
        "nan_gauge NaN",
        "this line is malformed !!",
    ]
)


def _lines_df(spark):
    return spark.createDataFrame([(l,) for l in EXPO.split("\n")], "message string")


def test_prometheus_parse(spark):
    rows = prometheus_parse(_lines_df(spark)).collect()
    by = {}
    for r in rows:
        by.setdefault(r.name, []).append(r)
    # comments and blank lines dropped; malformed kept with NULL name
    assert None in by and len(by[None]) == 1
    gets = [r for r in by["http_requests_total"] if r.labels.get("method") == "GET"]
    assert len(gets) == 1
    assert gets[0].value == 1027.0
    assert gets[0].timestamp_ms == 1395066363000
    assert gets[0].labels == {"method": "GET", "code": "200"}
    posts = [r for r in by["http_requests_total"] if r.labels.get("method") == "POST"]
    assert posts[0].timestamp_ms is None
    (temp,) = by["temperature_celsius"]
    assert temp.value == 21.5 and temp.labels == {}
    (weird,) = by["weird_label"]
    assert weird.labels["msg"] == 'a"quote" and\nnewline and back\\nslash'
    assert by["infinite_gauge"][0].value == float("inf")
    assert math.isnan(by["nan_gauge"][0].value)


def test_prometheus_types(spark):
    got = {r.name: r.metric_type for r in prometheus_types(_lines_df(spark)).collect()}
    assert got == {"http_requests_total": "counter", "temperature_celsius": "gauge"}


@pytest.fixture()
def metrics_endpoint():
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = EXPO.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/metrics"
    srv.shutdown()


def test_prometheus_scrape_live(spark, metrics_endpoint):
    """Executor-side scrape of a live endpoint + one dead target: samples
    parse and the dead target surfaces as a scrape_error row, not a task
    failure."""
    dead = "http://127.0.0.1:1/metrics"  # port 1: connection refused
    df = prometheus_scrape_source(
        spark, [metrics_endpoint, dead], timeout_s=3.0
    )
    rows = df.collect()
    ok = [r for r in rows if r.scrape_error is None and r.name is not None]
    errs = [r for r in rows if r.scrape_error is not None]
    assert {r.name for r in ok} >= {"http_requests_total", "temperature_celsius"}
    assert len(errs) == 1 and errs[0].endpoint == dead
    assert errs[0].value is None


from hypothesis import given, settings
from hypothesis import strategies as st

_label_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\n"),
    max_size=40,
)


def _expo_escape(v: str) -> str:
    """Writer-side escaping per the exposition spec."""
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


@given(st.lists(_label_text, min_size=1, max_size=6))
@settings(max_examples=25, deadline=None)
def test_label_escape_roundtrip_property(spark, values):
    """escape-on-write → prometheus_parse == identity for arbitrary label
    values (newline-free generation; the newline arm itself is pinned by
    the EXPO fixture's weird_label case)."""
    rows = [
        (i, f'm_total{{v="{_expo_escape(v)}"}} 1')
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, "i int, message string")
    got = {r["i"]: r["labels"]["v"] for r in prometheus_parse(df).collect()}
    assert got == {i: v for i, v in enumerate(values)}


def test_prometheus_duplicate_label_keeps_last(spark):
    """A repeated label name (invalid exposition text) degrades per-line —
    last occurrence wins — instead of killing the scrape job."""
    from vector_spark.sources import prometheus_parse

    df = spark.createDataFrame(
        [('m{a="1",a="2",b="x"} 5',), ('ok{c="3"} 1',)], "message string"
    )
    got = {r.name: r.labels for r in prometheus_parse(df, "message").collect()}
    assert got["m"] == {"a": "2", "b": "x"}
    assert got["ok"] == {"c": "3"}
