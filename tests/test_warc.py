"""WARC source: synth↔parse round trip (plain + member-gzip), distributed
multi-file read, HTTP head/body split, corruption failure modes."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from vector_spark.sources.warc import (
    http_response_parts,
    split_warc_records,
    synth_warc_bytes,
    warc_source,
)


def _http(body: bytes, ctype: str = "text/plain; charset=utf-8") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode() + b"\r\n\r\n" + body
    )


def _records():
    return [
        {
            "target_uri": "https://example.org/a",
            "date": datetime(2026, 1, 2, 3, 4, 5, tzinfo=timezone.utc),
            "payload": _http("hello world 你好".encode()),
        },
        {
            "target_uri": "https://example.org/b",
            "warc_type": "request",
            "payload": b"GET /b HTTP/1.1\r\n\r\n",
            "content_type": "application/http; msgtype=request",
        },
        {
            "target_uri": "https://example.org/c",
            "payload": _http(b"\x00\xff binary-ish body"),
        },
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    data = synth_warc_bytes(_records(), gzip_members=gz)
    if gz:
        assert data[:2] == b"\x1f\x8b"
    got = split_warc_records(data)
    assert [h["warc-target-uri"] for h, _ in got] == [
        "https://example.org/a", "https://example.org/b", "https://example.org/c",
    ]
    assert got[0][1] == _http("hello world 你好".encode())
    assert got[1][0]["warc-type"] == "request"
    assert got[2][1].endswith(b"binary-ish body")
    assert all(int(h["content-length"]) == len(p) for h, p in got)


def test_synth_gzip_deterministic():
    a = synth_warc_bytes(_records(), gzip_members=True)
    b = synth_warc_bytes(_records(), gzip_members=True)
    assert a == b


def test_corruption_raises():
    data = synth_warc_bytes(_records())
    with pytest.raises(ValueError, match="declares"):
        split_warc_records(data[:-30])  # truncated payload
    with pytest.raises(ValueError, match="version line"):
        split_warc_records(b"HTTP/1.1 200 OK\r\n\r\nnope")


def test_warc_source_distributed(spark, tmp_path):
    # 3 files (one gzip) → binaryFile scan → one row per record; the file
    # level is the parallelism unit, so records keep their source path.
    for i, gz in enumerate([False, True, False]):
        recs = [
            {
                "target_uri": f"https://example.org/f{i}/r{j}",
                "date": datetime(2026, 1, 1, tzinfo=timezone.utc),
                "payload": _http(f"body {i}-{j}".encode()),
            }
            for j in range(4)
        ]
        ext = "warc.gz" if gz else "warc"
        (tmp_path / f"seg-{i}.{ext}").write_bytes(
            synth_warc_bytes(recs, gzip_members=gz)
        )
    df = warc_source(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 12
    assert {r.warc_type for r in rows} == {"response"}
    assert all(r.content_length == len(r.payload) for r in rows)
    assert str(rows[0].warc_date) == "2026-01-01 00:00:00"

    out = http_response_parts(df).select("target_uri", "http_status", "http_content_type", "body")
    got = {r.target_uri: r for r in out.collect()}
    assert got["https://example.org/f1/r2"].body == "body 1-2"
    assert got["https://example.org/f1/r2"].http_status == 200
    assert got["https://example.org/f0/r0"].http_content_type == "text/plain; charset=utf-8"


def test_http_parts_no_header_terminator(spark):
    df = spark.createDataFrame([(b"no headers here",)], "payload binary")
    row = http_response_parts(df).collect()[0]
    assert row.http_status is None and row.body == "no headers here"


def test_warc_toml_pipeline(spark, tmp_path):
    # `type = "warc"` dispatches through the pipeline compiler with the
    # HTTP split applied, and downstream VRL filters see body/status.
    from datetime import datetime, timezone

    from vector_spark.plans.pipeline import Pipeline

    recs = [
        {
            "target_uri": f"https://example.org/r{j}",
            "date": datetime(2026, 1, 1, tzinfo=timezone.utc),
            "payload": _http(f"payload {j}".encode()),
        }
        for j in range(5)
    ]
    (tmp_path / "seg.warc").write_bytes(synth_warc_bytes(recs))
    toml_src = f"""
[sources.crawl]
type = "warc"
path = "{tmp_path}"

[transforms.ok]
type = "filter"
inputs = ["crawl"]
condition = '.http_status == 200 && contains(.body, "payload 3")'

[sinks.out]
type = "console"
inputs = ["ok"]
"""
    outs = Pipeline.from_toml(toml_src).build(spark)
    rows = outs["out"].collect()
    assert len(rows) == 1 and rows[0]["target_uri"] == "https://example.org/r3"


def test_http_parts_non_utf8_body_and_http2(spark):
    """Non-UTF-8 bodies must degrade per-row (U+FFFD), never abort the job
    (Spark 4 ANSI decode would); HTTP/2 status lines parse too."""
    df = spark.createDataFrame(
        [
            (b"HTTP/1.1 200 OK\r\n\r\n\xff\xfe raw latin-1 \xe9 body",),
            (b"HTTP/2 200\r\nContent-Type: text/html\r\n\r\nok",),
        ],
        "payload binary",
    )
    rows = http_response_parts(df).collect()
    assert rows[0].http_status == 200 and "�" in rows[0].body
    assert rows[1].http_status == 200 and rows[1].body == "ok"


def test_warc_folded_header_and_missing_content_length():
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://example.org/very\r\n \tlong/path\r\n"
        b"Content-Length: 2\r\n"
        b"\r\nhi\r\n\r\n"
    )
    got = split_warc_records(rec)
    assert got[0][0]["warc-target-uri"] == "https://example.org/very long/path"
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nhi\r\n\r\n"
    with pytest.raises(ValueError, match="no Content-Length"):
        split_warc_records(bad)


# --- property: synth↔parse round trip over arbitrary record shapes -----------

from hypothesis import given, settings
from hypothesis import strategies as st

_rec = st.fixed_dictionaries(
    {
        "target_uri": st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\r\n"),
            min_size=1, max_size=40,
        ),
        "payload": st.binary(max_size=200),
    }
)


@given(st.lists(_rec, min_size=1, max_size=6), st.booleans())
@settings(max_examples=60, deadline=None)
def test_warc_property_roundtrip(recs, gz):
    got = split_warc_records(synth_warc_bytes(recs, gzip_members=gz))
    # header VALUES are whitespace-trimmed by the format (field grammar),
    # so the round-trip contract is trim(uri), byte-exact payloads.
    assert [h["warc-target-uri"] for h, _ in got] == [
        r["target_uri"].strip() for r in recs
    ]
    assert [p for _, p in got] == [r["payload"] for r in recs]


def test_warc_bad_date_degrades_to_nat(spark, tmp_path):
    """A malformed WARC-Date on a well-framed record yields NaT for that
    row — never a task failure (only STRUCTURAL corruption raises)."""
    from vector_spark.sources.warc import warc_source

    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:1>\r\n"
        b"WARC-Date: unknown\r\n"
        b"WARC-Target-URI: http://x/\r\n"
        b"Content-Length: 2\r\n"
        b"\r\nhi\r\n\r\n"
    )
    p = tmp_path / "seg.warc"
    p.write_bytes(rec)
    rows = warc_source(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0].warc_date is None
    assert rows[0].target_uri == "http://x/"
