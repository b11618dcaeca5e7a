"""Decoding codecs + framing methods (the `demo_logs`/socket-source advanced
options, ui/src/components/pipeline/config_panel.rs:855-900).

Reference option surface:
  decoding.codec ∈ {bytes, json, syslog, gelf, native, native_json}
  framing.method ∈ {bytes, newline_delimited, character_delimited,
                    length_delimited, octet_counting}

Framing turns a byte-stream column into one row per event; decoding turns
each event's raw message into typed columns.  Both are plain DataFrame
transforms: framing for the delimiter modes is JVM split+explode (codegen);
the two length-prefixed modes (length_delimited's u32-BE prefix,
octet_counting's RFC 6587 ASCII count) genuinely need stateful byte walking
and use ONE vectorized pandas UDF each (binary chunk → array of frames,
then explode — the Python cost is per chunk, not per event).

`native` (Vector's protobuf) is documented out of scope — there is no
public schema to be faithful to without the vector dependency; `native_json`
(the JSON rendering of the same event envelope) IS implemented.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FRAMING_METHODS = (
    "bytes",
    "newline_delimited",
    "character_delimited",
    "length_delimited",
    "octet_counting",
)
DECODING_CODECS = ("bytes", "json", "syslog", "gelf", "native", "native_json")


# ------------------------------------------------------------------ framing

# Length-prefixed framers emit (frame, error) pairs: a malformed or truncated
# tail is NOT silently dropped — it surfaces as one final frame with
# error=true carrying the undecodable remainder, so callers can route it
# like any other decode failure instead of reading corrupt input as clean
# data loss.
_FRAMES_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("frame", T.StringType()),
            T.StructField("error", T.BooleanType()),
        ]
    )
)


@F.pandas_udf(_FRAMES_SCHEMA)
def _length_delimited_udf(chunks: pd.Series) -> pd.Series:
    """u32 big-endian length prefix per frame (Vector's length_delimited)."""

    def split(buf: bytes | None) -> list[tuple[str, bool]]:
        out: list[tuple[str, bool]] = []
        pos = 0
        buf = buf or b""
        while pos + 4 <= len(buf):
            (n,) = struct.unpack_from(">I", buf, pos)
            if pos + 4 + n > len(buf):
                break  # truncated payload → remainder sentinel below
            out.append((buf[pos + 4 : pos + 4 + n].decode("utf-8", errors="replace"), False))
            pos += 4 + n
        if pos < len(buf):
            out.append((buf[pos:].decode("utf-8", errors="replace"), True))
        return out

    return chunks.map(split)


@F.pandas_udf(_FRAMES_SCHEMA)
def _octet_counting_udf(chunks: pd.Series) -> pd.Series:
    """RFC 6587 octet counting: ASCII frame length, a space, then the frame."""

    def split(buf: bytes | None) -> list[tuple[str, bool]]:
        out: list[tuple[str, bool]] = []
        pos = 0
        buf = buf or b""
        while pos < len(buf):
            sp = buf.find(b" ", pos)
            if sp < 0 or not buf[pos:sp].isdigit() or sp + 1 + int(buf[pos:sp]) > len(buf):
                out.append((buf[pos:].decode("utf-8", errors="replace"), True))
                return out
            n = int(buf[pos:sp])
            out.append((buf[sp + 1 : sp + 1 + n].decode("utf-8", errors="replace"), False))
            pos = sp + 1 + n
        return out

    return chunks.map(split)


def frame_stream(
    df: DataFrame,
    method: str = "bytes",
    value_col: str = "value",
    delimiter: str = ",",
    out_col: str = "message",
) -> DataFrame:
    """Byte-stream column → one row per framed event (string `out_col`).

    Every method emits the same schema, including a `framing_error` boolean:
    false for clean frames, true for the one sentinel row carrying a
    malformed/truncated tail in the length-prefixed methods (the delimiter
    methods cannot detect malformed input, so theirs is always false —
    uniform schema keeps multi-source unions valid)."""
    raw = F.col(value_col)
    as_str = raw.cast("string")
    if method == "bytes":
        out = df.withColumn(out_col, as_str).withColumn("framing_error", F.lit(False))
        return out.drop(value_col) if value_col != out_col else out
    if method == "newline_delimited":
        parts = F.split(as_str, r"\r?\n")
    elif method == "character_delimited":
        # \Q...\E: literal-quote the delimiter (F.split's pattern is a regex)
        parts = F.split(as_str, "\\Q" + delimiter + "\\E", -1)
    elif method in ("length_delimited", "octet_counting"):
        udf = _length_delimited_udf if method == "length_delimited" else _octet_counting_udf
        # (frame, error) pairs: clean frames get framing_error=false; a
        # malformed/truncated tail becomes one framing_error=true row.
        keep = [c for c in df.columns if c != out_col]
        out = df.withColumn("_f", F.explode(udf(raw.cast("binary")))).select(
            *keep,
            F.col("_f.frame").alias(out_col),
            F.col("_f.error").alias("framing_error"),
        )
        return out.drop(value_col) if value_col != out_col else out
    else:
        raise ValueError(f"unknown framing method {method!r}")
    out = df.withColumn(out_col, F.explode(parts)).withColumn("framing_error", F.lit(False))
    if method in ("newline_delimited",):
        out = out.filter(F.col(out_col) != "")
    return out.drop(value_col) if value_col != out_col else out


# ----------------------------------------------------------------- decoding

#: RFC 5424: <pri>version ts host app procid msgid [sd] msg
_RFC5424 = r"^<(\d+)>\d\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s+\S+\s+(?:-|\[[^\]]*\])\s*(.*)$"
#: RFC 3164 (BSD): <pri>Mmm dd hh:mm:ss host app[pid]: msg
_RFC3164 = r"^<(\d+)>([A-Z][a-z]{2}\s+\d+\s[\d:]{8})\s+(\S+)\s+([^\[:\s]+)(?:\[(\d+)\])?:\s*(.*)$"

GELF_SCHEMA = (
    "version string, host string, short_message string, full_message string, "
    "timestamp double, level int, facility string"
)

NATIVE_JSON_SCHEMA = (
    "log struct<message: string, timestamp: string, host: string, "
    "source_type: string, fields: map<string,string>>"
)


def _syslog_columns(msg: Column) -> list[Column]:
    """Parse RFC 5424 first, fall back to RFC 3164 — pure regexp_extract
    (codegen), NULL columns on non-matching lines."""
    is5424 = msg.rlike(_RFC5424)

    def pick(g5424: int, g3164: int) -> Column:
        return F.when(is5424, F.regexp_extract(msg, _RFC5424, g5424)).otherwise(
            F.regexp_extract(msg, _RFC3164, g3164)
        )

    pri = F.nullif(pick(1, 1), F.lit("")).cast("int")
    return [
        (pri / 8).cast("int").alias("facility"),
        F.pmod(pri, F.lit(8)).cast("int").alias("severity"),
        F.nullif(pick(2, 2), F.lit("")).alias("syslog_ts"),
        F.nullif(pick(3, 3), F.lit("")).alias("host"),
        F.nullif(pick(4, 4), F.lit("")).alias("appname"),
        F.nullif(pick(5, 5), F.lit("")).alias("procid"),
        pick(6, 6).alias("message"),
    ]


def decode_events(
    df: DataFrame,
    codec: str = "bytes",
    message_col: str = "message",
    schema: str | None = None,
) -> DataFrame:
    """Framed message strings → typed event columns per `decoding.codec`."""
    msg = F.col(message_col)
    keep = [c for c in df.columns if c != message_col]
    if codec == "bytes":
        return df
    if codec == "json":
        if not schema:
            raise ValueError("codec='json' needs a DDL schema for the event object")
        return df.select(*keep, F.from_json(msg, schema).alias("_e")).select(*keep, "_e.*")
    if codec == "syslog":
        return df.select(*keep, *_syslog_columns(msg))
    if codec == "gelf":
        parsed = F.from_json(msg, GELF_SCHEMA)
        return df.select(*keep, parsed.alias("_g")).select(
            *keep,
            F.col("_g.host").alias("host"),
            F.col("_g.short_message").alias("message"),
            F.coalesce("_g.full_message", "_g.short_message").alias("full_message"),
            F.timestamp_seconds("_g.timestamp").alias("timestamp"),
            F.col("_g.level").alias("severity"),
            F.col("_g.facility").alias("facility"),
        )
    if codec == "native_json":
        parsed = F.from_json(msg, NATIVE_JSON_SCHEMA)
        return df.select(*keep, parsed.alias("_n")).select(
            *keep,
            F.col("_n.log.message").alias("message"),
            F.col("_n.log.timestamp").cast("timestamp").alias("timestamp"),
            F.col("_n.log.host").alias("host"),
            F.col("_n.log.source_type").alias("source_type"),
            F.col("_n.log.fields").alias("fields"),
        )
    if codec == "native":
        raise NotImplementedError(
            "decoding.codec='native' is Vector's protobuf envelope; no public "
            "schema without the vector dependency — use native_json"
        )
    raise ValueError(f"unknown decoding codec {codec!r}")
