"""demo_logs formats + decoding codecs + framing methods — the advanced
option surface of the reference's source forms (config_panel.rs:775-900)."""

from __future__ import annotations

import json
import struct

import pytest
from pyspark.sql import functions as F

from vector_spark.plans.pipeline import Pipeline
from vector_spark.sources import DEMO_FORMATS, codecs, demo_logs


# ------------------------------------------------------------- demo formats

def test_all_reference_formats_generate(spark):
    for fmt in DEMO_FORMATS:
        df = demo_logs(spark, count=20, fmt=fmt, lines=["alpha", "beta"])
        rows = df.collect()
        assert len(rows) == 20, fmt
        assert all(r.message for r in rows), fmt


def test_format_shapes(spark):
    one = lambda fmt, **kw: demo_logs(spark, count=5, fmt=fmt, **kw).collect()[0].message
    assert one("apache_common").count('"') == 2
    assert one("apache_error").startswith("[")
    assert "[error]" in one("apache_error") or "[warn]" in one("apache_error") or "[notice]" in one("apache_error") or "[crit]" in one("apache_error")
    # RFC 5424 has a version digit after <pri>; RFC 3164 does not
    assert one("syslog").split(">")[1][0] == "1"
    assert not one("bsd_syslog").split(">")[1][0].isdigit()
    assert json.loads(one("json"))["method"]


def test_shuffle_format_lines_and_sequence(spark):
    msgs = {r.message for r in demo_logs(spark, 50, fmt="shuffle", lines=["a", "b"]).collect()}
    assert msgs <= {"a", "b"} and len(msgs) == 2
    seq = [r.message for r in demo_logs(spark, 10, fmt="shuffle", lines=["x"], sequence=True).orderBy("id").collect()]
    assert seq == [f"{i} x" for i in range(10)]


def test_demo_logs_deterministic_across_partitions(spark):
    a = {r.id: r.message for r in demo_logs(spark, 100, fmt="syslog", partitions=2).collect()}
    b = {r.id: r.message for r in demo_logs(spark, 100, fmt="syslog", partitions=16).collect()}
    assert a == b


# ----------------------------------------------------------------- decoding

def test_decode_json_codec_via_demo_logs(spark):
    df = demo_logs(spark, 10, fmt="json", decoding_codec="json")
    rows = df.collect()
    assert {"method", "path", "status", "bytes", "ip"} <= set(df.columns)
    assert all(r.status >= 100 for r in rows)


def test_decode_syslog_both_rfcs(spark):
    for fmt in ("syslog", "bsd_syslog"):
        df = demo_logs(spark, 10, fmt=fmt, decoding_codec="syslog")
        rows = df.collect()
        assert all(r.severity is not None and 0 <= r.severity <= 7 for r in rows), fmt
        assert all(r.host.startswith("host-") for r in rows), fmt
        assert all("->" in r.message for r in rows), fmt
        assert all(r.appname == "app" for r in rows), fmt


def test_decode_gelf(spark):
    ev = {"version": "1.1", "host": "h1", "short_message": "boom", "timestamp": 1735689600.0, "level": 3}
    df = spark.createDataFrame([(json.dumps(ev),)], "message string")
    out = codecs.decode_events(df, "gelf").collect()[0]
    assert out.host == "h1" and out.message == "boom" and out.severity == 3
    assert out.timestamp.year == 2025


def test_decode_native_json(spark):
    ev = {"log": {"message": "m", "timestamp": "2026-01-01T00:00:00Z", "host": "h", "source_type": "demo_logs", "fields": {"k": "v"}}}
    df = spark.createDataFrame([(json.dumps(ev),)], "message string")
    out = codecs.decode_events(df, "native_json").collect()[0]
    assert out.message == "m" and out.host == "h" and out.fields == {"k": "v"}


def test_decode_native_is_documented_out_of_scope(spark):
    df = spark.createDataFrame([("x",)], "message string")
    with pytest.raises(NotImplementedError, match="native"):
        codecs.decode_events(df, "native")


# ------------------------------------------------------------------ framing

def test_framing_newline_delimited(spark):
    df = spark.createDataFrame([("a\nb\r\nc\n",)], "value string")
    got = [r.message for r in codecs.frame_stream(df, "newline_delimited").collect()]
    assert got == ["a", "b", "c"]


def test_framing_character_delimited(spark):
    df = spark.createDataFrame([("a|b||c",)], "value string")
    got = [r.message for r in codecs.frame_stream(df, "character_delimited", delimiter="|").collect()]
    assert got == ["a", "b", "", "c"]


def test_framing_length_delimited(spark):
    frames = [b"hello", b"", b"worlds!"]
    buf = b"".join(struct.pack(">I", len(f)) + f for f in frames)
    df = spark.createDataFrame([(buf,)], "value binary")
    got = [r.message for r in codecs.frame_stream(df, "length_delimited").collect()]
    assert got == ["hello", "", "worlds!"]


def test_framing_octet_counting(spark):
    buf = b"5 hello3 foo11 hello world"
    df = spark.createDataFrame([(buf,)], "value binary")
    got = [r.message for r in codecs.frame_stream(df, "octet_counting").collect()]
    assert got == ["hello", "foo", "hello world"]


# --------------------------------------------------------- pipeline surface

def test_pipeline_demo_logs_full_option_surface(spark):
    p = Pipeline.from_dict(
        {
            "sources": {
                "gen": {
                    "type": "demo_logs",
                    "format": "bsd_syslog",
                    "count": 25,
                    "decoding": {"codec": "syslog"},
                }
            },
            "transforms": {
                "errors": {
                    "type": "filter",
                    "inputs": ["gen"],
                    "condition": ".severity <= 3",
                }
            },
            "sinks": {"out": {"type": "memory", "inputs": ["errors"]}},
        }
    )
    assert p.validate() == []
    res = p.run(spark)
    assert all(e["severity"] <= 3 for e in res["out"])


def test_file_source_with_octet_counting_framing(spark, tmp_path):
    from vector_spark.sources import file_source

    raw = tmp_path / "frames.bin"
    raw.write_bytes(b"5 hello3 foo11 hello world")
    df = file_source(spark, str(raw), framing="octet_counting")
    assert [r.message for r in df.collect()] == ["hello", "foo", "hello world"]


def test_file_source_framing_plus_json_decode(spark, tmp_path):
    import json as _json

    from vector_spark.sources import file_source

    events = [{"m": "a", "n": 1}, {"m": "b", "n": 2}]
    frames = [_json.dumps(e).encode() for e in events]
    buf = b"".join(b"%d %s" % (len(f), f) for f in frames)
    raw = tmp_path / "ev.bin"
    raw.write_bytes(buf)
    df = file_source(spark, str(raw), codec="json", schema="m string, n int", framing="octet_counting")
    assert {(r.m, r.n) for r in df.collect()} == {("a", 1), ("b", 2)}


# ------------------------------------------------------ socket-family sources

def test_statsd_parse_wire_format(spark):
    from vector_spark.sources import statsd_parse

    lines = ["gorets:1|c", "glork:320|ms|@0.1", "gauges.mem:1024.5|g", "uniq:42|s", "not statsd"]
    df = spark.createDataFrame([(ln,) for ln in lines], "message string")
    rows = {r.name: r for r in statsd_parse(df).collect() if r.name}
    assert rows["gorets"].value == 1.0 and rows["gorets"].metric_type == "c"
    assert rows["glork"].sample_rate == 0.1 and rows["glork"].metric_type == "ms"
    assert rows["gauges.mem"].value == 1024.5 and rows["gauges.mem"].metric_type == "g"
    assert rows["uniq"].metric_type == "s" and rows["uniq"].sample_rate == 1.0
    assert len(rows) == 4  # the non-statsd line yields NULL name


def test_socket_source_compiles_streaming_plan(spark):
    from vector_spark.sources import socket_source, syslog_source

    df = socket_source(spark, "127.0.0.1:19999")
    assert df.isStreaming and df.columns == ["message"]
    sys_df = syslog_source(spark, "127.0.0.1:19998")
    assert sys_df.isStreaming
    assert {"severity", "host", "appname", "message"} <= set(sys_df.columns)


def test_socket_source_rejects_non_tcp(spark):
    from vector_spark.sources import socket_source

    with pytest.raises(ValueError, match="TCP-only"):
        socket_source(spark, mode="udp")


def test_pipeline_socket_sources_build(spark):
    p = Pipeline.from_dict(
        {
            "sources": {"s": {"type": "statsd", "address": "127.0.0.1:18125", "mode": "tcp"}},
            "sinks": {"out": {"type": "memory", "inputs": ["s"]}},
        }
    )
    assert p.validate() == []
    built = p.build(spark)
    assert built["out"].isStreaming
    assert {"name", "value", "metric_type", "sample_rate"} <= set(built["out"].columns)


def test_frame_stream_in_place_column_and_uniform_schema(spark):
    """Regression: value_col == out_col must replace the column (no ambiguous
    duplicate), and every framing method emits the same schema including
    framing_error."""
    import struct

    from vector_spark.sources import codecs

    payload = struct.pack(">I", 2) + b"hi"
    df = spark.createDataFrame([(payload,)], "message binary")
    out = codecs.frame_stream(df, "length_delimited", value_col="message", out_col="message")
    assert out.columns.count("message") == 1
    # downstream reference to the column must not be ambiguous
    assert [r.message for r in out.filter(F.col("message") == "hi").collect()] == ["hi"]

    schemas = set()
    for method, val in (
        ("bytes", b"x"),
        ("newline_delimited", b"a\nb"),
        ("character_delimited", b"a,b"),
        ("length_delimited", payload),
        ("octet_counting", b"2 hi"),
    ):
        d = spark.createDataFrame([(val,)], "value binary")
        schemas.add(tuple(sorted(codecs.frame_stream(d, method).columns)))
    assert len(schemas) == 1  # uniform: unions across framing methods stay valid
