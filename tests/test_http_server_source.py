"""http_server source: live HTTP ingest → spool → file stream, end to end."""

from __future__ import annotations

import json
import urllib.request

import pytest

from vector_spark.sources.http_server import HttpIngestServer, http_server_source


@pytest.fixture()
def ingest(tmp_path):
    srv = HttpIngestServer(str(tmp_path / "spool"), path="/ingest")
    yield srv
    srv.stop()


def _post(url, body: bytes, expect: int = 200):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.status == expect
    except urllib.error.HTTPError as e:
        assert e.code == expect


def test_http_ingest_end_to_end(spark, ingest, tmp_path):
    events = [{"msg": f"m{i}", "n": i} for i in range(7)]
    body = "\n".join(json.dumps(e) for e in events).encode()
    _post(ingest.url, body)
    _post(ingest.url, json.dumps({"msg": "late", "n": 99}).encode())

    stream = http_server_source(spark, ingest.spool_dir, "msg string, n int")
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("http_ingest")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r.msg, r.n) for r in spark.sql("select * from http_ingest").collect()}
    assert rows == {(e["msg"], e["n"]) for e in events} | {("late", 99)}


def test_http_ingest_path_and_method_contract(ingest):
    base = ingest.url.rsplit("/", 1)[0]
    _post(f"{base}/other", b"{}", expect=404)
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(urllib.request.Request(ingest.url, method="GET"), timeout=10)
    assert exc.value.code == 405
