"""WARC (ISO 28500) record source — the Common-Crawl container format.

A WARC file is a sequence of records::

    WARC/1.0\r\n
    <Header-Name>: <value>\r\n …
    \r\n
    <Content-Length bytes of block>\r\n\r\n

optionally with each record in its own gzip MEMBER (the Common Crawl
convention — member-level gzip lets a reader start at any record offset
without decompressing the whole file).

Scale shape: one WARC file is a sequential stream — Content-Length framing
means a single file cannot be split mid-stream without scanning for record
boundaries.  Parallelism therefore comes from the FILE level (Common Crawl
ships ~1 GB segments by the hundred-thousand), and that is how this source
distributes: a `binaryFile` scan gives one task per file, and a
`mapInPandas` splitter walks each file's records sequentially.  At cluster
scale the unit of work is "a segment", exactly as web-corpus pipelines
expect; no shuffle is introduced by the parse itself.

The HTTP head/body split (`http_response_parts`) runs AFTER the splitter as
pure JVM column expressions, so the per-byte work in Python is limited to
the one unavoidable record walk.

Reference anchor: the file/object-store source family
(`ui/src/components/pipeline/palette.rs:70-122`, aws_s3 form
`config_panel.rs:2088-2130`); the reference has no WARC reader — this module
is part of the web-corpus surface the rebuild adds (SURVEY §2.2 + the
training-data charter).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"

#: Output schema of `warc_source` — one row per WARC record.
WARC_SCHEMA = (
    "path string, record_id string, warc_type string, warc_date timestamp, "
    "target_uri string, content_type string, content_length long, payload binary"
)


def synth_warc_bytes(records: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize records to WARC/1.0 bytes (deterministic; test/fixture twin
    of the reader).  Each record dict: ``target_uri``, ``payload`` (bytes),
    and optionally ``warc_type`` (default ``response``), ``date`` (datetime,
    default epoch), ``record_id``, ``content_type``.

    With ``gzip_members`` each record is its own gzip member (mtime pinned
    to 0 so output is byte-deterministic), the Common Crawl layout.
    """
    out = bytearray()
    for i, r in enumerate(records):
        payload: bytes = r["payload"]
        date = r.get("date") or datetime(1970, 1, 1, tzinfo=timezone.utc)
        if date.tzinfo is None:
            date = date.replace(tzinfo=timezone.utc)
        headers = [
            ("WARC-Type", r.get("warc_type", "response")),
            ("WARC-Record-ID", r.get("record_id", f"<urn:uuid:rec-{i:08d}>")),
            ("WARC-Date", date.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")),
            ("WARC-Target-URI", r["target_uri"]),
            ("Content-Type", r.get("content_type", "application/http; msgtype=response")),
            ("Content-Length", str(len(payload))),
        ]
        rec = bytearray(b"WARC/1.0\r\n")
        for k, v in headers:
            rec += f"{k}: {v}\r\n".encode()
        rec += _CRLF
        rec += payload
        rec += _CRLF + _CRLF
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, 31)  # wbits=31: gzip wrapper
            out += co.compress(bytes(rec)) + co.flush()
        else:
            out += rec
    return bytes(out)


def _iter_members(data: bytes) -> Iterator[bytes]:
    """Yield decompressed gzip members, or the raw bytes if not gzip."""
    if data[:2] != b"\x1f\x8b":
        yield data
        return
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        chunk = d.decompress(data[pos:]) + d.flush()
        yield chunk
        consumed = (len(data) - pos) - len(d.unused_data)
        if consumed <= 0:  # defensive: no forward progress
            raise ValueError(f"gzip member at offset {pos} consumed no bytes")
        pos += consumed


def split_warc_records(data: bytes) -> list[tuple[dict[str, str], bytes]]:
    """Walk WARC bytes (plain or member-gzip) → [(headers, payload), …].

    Headers come back lower-cased; payload is exactly Content-Length bytes.
    Raises on structural corruption (missing version line / header
    terminator / short payload) — a truncated segment should fail its task
    loudly, not emit partial records.
    """
    out: list[tuple[dict[str, str], bytes]] = []
    for blob in _iter_members(data):
        pos, n = 0, len(blob)
        while pos < n:
            while blob[pos : pos + 2] == _CRLF:
                pos += 2
            if pos >= n:
                break
            hdr_end = blob.find(b"\r\n\r\n", pos)
            if hdr_end < 0:
                raise ValueError(f"WARC header not terminated at offset {pos}")
            head_lines = blob[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
            if not head_lines[0].startswith("WARC/"):
                raise ValueError(
                    f"expected WARC version line at offset {pos}, got {head_lines[0][:40]!r}"
                )
            headers: dict[str, str] = {}
            last_key: str | None = None
            for line in head_lines[1:]:
                if line[:1] in (" ", "\t") and last_key is not None:
                    # ISO 28500 §4: long values fold onto a following line
                    # starting with space/tab — continuation, not a new key.
                    headers[last_key] += " " + line.strip()
                    continue
                k, _, v = line.partition(":")
                last_key = k.strip().lower()
                headers[last_key] = v.strip()
            if "content-length" not in headers:
                raise ValueError(
                    f"WARC record at offset {pos} has no Content-Length header"
                )
            clen = int(headers["content-length"])
            body_start = hdr_end + 4
            if body_start + clen > n:
                raise ValueError(
                    f"record at offset {pos} declares {clen} bytes, "
                    f"only {n - body_start} remain"
                )
            out.append((headers, blob[body_start : body_start + clen]))
            pos = body_start + clen
    return out


def warc_source(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: `binaryFile` scan (one task per segment) →
    mapInPandas record walk → one row per record (`WARC_SCHEMA`)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "path", "record_id", "warc_type", "warc_date",
            "target_uri", "content_type", "content_length", "payload",
        ]
        for pdf in batches:
            rows = []
            def _ts(hdrs: dict[str, str]) -> pd.Timestamp:
                if "warc-date" not in hdrs:
                    return pd.NaT
                try:
                    t = pd.Timestamp(hdrs["warc-date"])
                except (ValueError, TypeError):
                    # real crawls carry the odd unparsable WARC-Date; a bad
                    # METADATA value on a well-framed record degrades to
                    # NaT per-row — only STRUCTURAL corruption raises
                    return pd.NaT
                return t.tz_convert(None) if t.tzinfo is not None else t

            for p, content in zip(pdf["path"], pdf["content"]):
                for hdrs, payload in split_warc_records(bytes(content)):
                    rows.append(
                        (
                            p,
                            hdrs.get("warc-record-id", ""),
                            hdrs.get("warc-type", ""),
                            _ts(hdrs),
                            hdrs.get("warc-target-uri", ""),
                            hdrs.get("content-type", ""),
                            len(payload),
                            payload,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(gen, WARC_SCHEMA)
    )


def http_response_parts(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Split an HTTP response payload (CC ``response`` records) into
    ``http_status`` (int), ``http_content_type``, and ``body`` — all JVM
    column expressions (decode → locate → substr → regexp), zero Python.

    Records whose payload has no header terminator get NULL status and the
    whole payload as body (robustness over strictness for the body side —
    dropping them is the caller's policy decision).

    Decode robustness: real web bodies are routinely NOT valid UTF-8
    (binary, legacy charsets, compressed entities), and Spark 4's ANSI-mode
    ``decode(…, 'UTF-8')`` would abort the whole job on the first such row.
    The payload is therefore reinterpreted via a binary→string cast (never
    throws) and repaired with ``make_valid_utf8`` (invalid sequences →
    U+FFFD) — per-row degradation, never a task failure.
    """
    s = F.make_valid_utf8(F.col(payload_col).cast("string"))
    sep = F.locate("\r\n\r\n", s)
    head = F.when(sep > 0, s.substr(F.lit(1), sep - 1))
    body = F.when(sep > 0, s.substr(sep + 4, F.length(s))).otherwise(s)
    return (
        df.withColumn(
            "http_status",
            F.regexp_extract(head, r"^HTTP/\d(?:\.\d)? (\d{3})", 1).try_cast("int"),
        )
        .withColumn(
            "http_content_type",
            F.regexp_extract(head, r"(?i)\r\ncontent-type:\s*([^\r\n]+)", 1),
        )
        .withColumn("body", body)
    )
