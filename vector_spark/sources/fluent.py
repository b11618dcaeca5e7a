"""Fluent Forward protocol source — the `fluent` palette row.

Fluentd/Fluent Bit forward their events as msgpack frames (the Forward
protocol, public spec: github.com/fluent/fluentd/wiki/Forward-Protocol-
Specification-v1).  A frame is one msgpack array in one of three modes:

    Message        [tag, time, record, option?]
    Forward        [tag, [[time, record], …], option?]
    PackedForward  [tag, bin(concatenated msgpack entries), option?]
    (CompressedPackedForward = PackedForward with gzip'd bin +
     option {"compressed": "gzip"})

msgpack itself is a tiny length-prefixed binary format; this module ships a
minimal pure-python codec (the subset the Forward protocol uses — ints,
strings, bins, arrays, maps, floats, bool/nil, and the EventTime ext type)
so no external dependency is needed.  The decoder runs inside mapInPandas
(one Arrow batch of frames at a time) — per-byte work stays in Python only
for the unavoidable varlength walk, the same boundary as the WARC reader.

Timestamps: Forward `time` is either a uint (seconds) or the EventTime ext
(type 0: 4-byte seconds + 4-byte nanoseconds, big-endian); both decode to
a UTC timestamp with microsecond precision.

Record values are stringified (map<string,string> output) — the same
schemaless-overflow convention the OTLP and native_json decoders use.

Reference anchor: palette `ui/src/components/pipeline/palette.rs:70-122`
(`fluent` row); socket form `config_panel.rs:952-1117`.
"""

from __future__ import annotations

import gzip as _gzip
import struct
from collections.abc import Iterator
from datetime import datetime, timezone
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

FLUENT_SCHEMA = "tag string, ts timestamp, record map<string,string>"


class EventTime:
    """Forward-protocol EventTime ext value (type 0): seconds + nanoseconds."""

    __slots__ = ("sec", "nsec")

    def __init__(self, sec: int, nsec: int = 0):
        self.sec, self.nsec = sec, nsec

    def __eq__(self, other):  # pragma: no cover - test convenience
        return isinstance(other, EventTime) and (self.sec, self.nsec) == (other.sec, other.nsec)


# --- minimal msgpack codec (the Forward-protocol subset) ---------------------

def msgpack_pack(obj: Any) -> bytes:
    """Deterministic encoder twin of `msgpack_unpack` (fixtures + tests).
    Dict key order is preserved (python dicts are ordered) so output is
    byte-stable for a given construction order."""
    if obj is None:
        return b"\xc0"
    if obj is True:
        return b"\xc3"
    if obj is False:
        return b"\xc2"
    if isinstance(obj, EventTime):
        return b"\xd7\x00" + struct.pack(">II", obj.sec, obj.nsec)  # fixext8, type 0
    if isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            return struct.pack("B", obj)
        if -32 <= obj < 0:
            return struct.pack("b", obj)
        if 0 <= obj <= 0xFFFFFFFF:
            return b"\xce" + struct.pack(">I", obj)
        if obj >= 0:
            return b"\xcf" + struct.pack(">Q", obj)
        return b"\xd3" + struct.pack(">q", obj)
    if isinstance(obj, float):
        return b"\xcb" + struct.pack(">d", obj)
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        if len(b) <= 31:
            return struct.pack("B", 0xA0 | len(b)) + b
        if len(b) <= 0xFF:
            return b"\xd9" + struct.pack("B", len(b)) + b
        if len(b) <= 0xFFFF:
            return b"\xda" + struct.pack(">H", len(b)) + b
        return b"\xdb" + struct.pack(">I", len(b)) + b
    if isinstance(obj, (bytes, bytearray)):
        b = bytes(obj)
        if len(b) <= 0xFF:
            return b"\xc4" + struct.pack("B", len(b)) + b
        return b"\xc6" + struct.pack(">I", len(b)) + b
    if isinstance(obj, (list, tuple)):
        if len(obj) <= 15:
            head = struct.pack("B", 0x90 | len(obj))
        elif len(obj) <= 0xFFFF:
            head = b"\xdc" + struct.pack(">H", len(obj))
        else:
            head = b"\xdd" + struct.pack(">I", len(obj))
        return head + b"".join(msgpack_pack(x) for x in obj)
    if isinstance(obj, dict):
        if len(obj) <= 15:
            head = struct.pack("B", 0x80 | len(obj))
        elif len(obj) <= 0xFFFF:
            head = b"\xde" + struct.pack(">H", len(obj))
        else:
            head = b"\xdf" + struct.pack(">I", len(obj))
        return head + b"".join(msgpack_pack(k) + msgpack_pack(v) for k, v in obj.items())
    raise TypeError(f"msgpack_pack: unsupported type {type(obj).__name__}")


def _unpack_one(data: bytes, pos: int) -> tuple[Any, int]:
    b = data[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0xA0 <= b <= 0xBF:  # fixstr
        n = b & 0x1F
        return data[pos : pos + n].decode("utf-8"), pos + n
    if 0x90 <= b <= 0x9F:  # fixarray
        return _unpack_seq(data, pos, b & 0x0F)
    if 0x80 <= b <= 0x8F:  # fixmap
        return _unpack_map(data, pos, b & 0x0F)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xCC, 0xCD, 0xCE, 0xCF):  # uint 8/16/32/64
        n = 1 << (b - 0xCC)
        return int.from_bytes(data[pos : pos + n], "big"), pos + n
    if b in (0xD0, 0xD1, 0xD2, 0xD3):  # int 8/16/32/64
        n = 1 << (b - 0xD0)
        return int.from_bytes(data[pos : pos + n], "big", signed=True), pos + n
    if b == 0xCA:
        return struct.unpack(">f", data[pos : pos + 4])[0], pos + 4
    if b == 0xCB:
        return struct.unpack(">d", data[pos : pos + 8])[0], pos + 8
    if b in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        ln = 1 << (b - 0xD9)
        n = int.from_bytes(data[pos : pos + ln], "big")
        pos += ln
        return data[pos : pos + n].decode("utf-8"), pos + n
    if b in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        ln = 1 << (b - 0xC4)
        n = int.from_bytes(data[pos : pos + ln], "big")
        pos += ln
        return bytes(data[pos : pos + n]), pos + n
    if b in (0xDC, 0xDD):  # array 16/32
        ln = 2 << (b - 0xDC)
        n = int.from_bytes(data[pos : pos + ln], "big")
        return _unpack_seq(data, pos + ln, n)
    if b in (0xDE, 0xDF):  # map 16/32
        ln = 2 << (b - 0xDE)
        n = int.from_bytes(data[pos : pos + ln], "big")
        return _unpack_map(data, pos + ln, n)
    if b == 0xD7 and data[pos] == 0x00:  # fixext8 type 0 = EventTime
        sec, nsec = struct.unpack(">II", data[pos + 1 : pos + 9])
        return EventTime(sec, nsec), pos + 9
    if b == 0xC7 and data[pos] == 8 and data[pos + 1] == 0x00:  # ext8(8) type 0
        sec, nsec = struct.unpack(">II", data[pos + 2 : pos + 10])
        return EventTime(sec, nsec), pos + 10
    raise ValueError(f"msgpack: unsupported type byte 0x{b:02x} at offset {pos - 1}")


def _unpack_seq(data: bytes, pos: int, n: int) -> tuple[list, int]:
    out = []
    for _ in range(n):
        v, pos = _unpack_one(data, pos)
        out.append(v)
    return out, pos


def _unpack_map(data: bytes, pos: int, n: int) -> tuple[dict, int]:
    out = {}
    for _ in range(n):
        k, pos = _unpack_one(data, pos)
        v, pos = _unpack_one(data, pos)
        out[k] = v
    return out, pos


def msgpack_unpack(data: bytes) -> Any:
    v, pos = _unpack_one(data, 0)
    if pos != len(data):
        raise ValueError(f"msgpack: {len(data) - pos} trailing bytes")
    return v


def msgpack_unpack_stream(data: bytes) -> list[Any]:
    """Decode back-to-back msgpack objects (the PackedForward entry layout)."""
    out, pos = [], 0
    while pos < len(data):
        v, pos = _unpack_one(data, pos)
        out.append(v)
    return out


# --- Forward-protocol frame → event rows -------------------------------------

def _to_ts(t: Any) -> datetime:
    if isinstance(t, EventTime):
        return datetime.fromtimestamp(t.sec, tz=timezone.utc).replace(
            microsecond=t.nsec // 1000
        )
    # uint seconds (the common wire form) or float64 seconds (fluentd
    # time_as_float) — fromtimestamp keeps the fractional part, matching
    # the microsecond fidelity of the EventTime arm.
    return datetime.fromtimestamp(float(t), tz=timezone.utc)


def decode_forward_frame(frame: bytes) -> list[tuple[str, datetime, dict[str, str]]]:
    """One Forward frame → [(tag, ts, record), …] across all three modes."""
    msg = msgpack_unpack(frame)
    if not isinstance(msg, list) or not msg or not isinstance(msg[0], str):
        raise ValueError("fluent: frame is not a Forward-protocol array")
    tag = msg[0]
    out = []
    body = msg[1]
    # Mode dispatch is on msg[1]'s TYPE (the spec's discriminator): bytes =
    # PackedForward, list = Forward (a zero-entry list is a valid, empty
    # Forward frame — clients flush empty buffers), anything else = Message.
    if isinstance(body, bytes):  # PackedForward / CompressedPackedForward
        option = msg[2] if len(msg) > 2 and isinstance(msg[2], dict) else {}
        if option.get("compressed") == "gzip":
            body = _gzip.decompress(body)
        entries = msgpack_unpack_stream(body)
        for t, rec in entries:
            out.append((tag, _to_ts(t), {str(k): str(v) for k, v in rec.items()}))
    elif isinstance(body, list):  # Forward (possibly empty)
        for t, rec in body:
            out.append((tag, _to_ts(t), {str(k): str(v) for k, v in rec.items()}))
    else:  # Message
        if len(msg) < 3 or not isinstance(msg[2], dict):
            raise ValueError(
                f"fluent: Message-mode frame for tag {tag!r} has no record map"
            )
        out.append((tag, _to_ts(msg[1]), {str(k): str(v) for k, v in msg[2].items()}))
    return out


def fluent_parse(df: DataFrame, frame_col: str = "payload") -> DataFrame:
    """Binary Forward frames → (tag, ts, record) rows via mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for frame in pdf[frame_col]:
                rows.extend(decode_forward_frame(bytes(frame)))
            out = pd.DataFrame(rows, columns=["tag", "ts", "record"])
            if len(out):
                out["ts"] = pd.to_datetime(out["ts"], utc=True).dt.tz_convert(None)
            yield out

    return df.select(frame_col).mapInPandas(gen, FLUENT_SCHEMA)
