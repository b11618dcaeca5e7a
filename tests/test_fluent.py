"""Fluent Forward source: msgpack codec round trip, all three frame modes
(+ gzip compression), EventTime precision, Spark decode path."""

from __future__ import annotations

import gzip

import pytest

from vector_spark.sources.fluent import (
    EventTime,
    decode_forward_frame,
    fluent_parse,
    msgpack_pack,
    msgpack_unpack,
    msgpack_unpack_stream,
)


def test_msgpack_roundtrip_scalars():
    cases = [
        None, True, False, 0, 5, 127, -1, -32, 255, 70000, 2**40, -70000,
        3.25, "", "hello", "x" * 40, "你好", b"", b"\x00\xff", [1, "a", None],
        {"k": 1, "nested": {"a": [1, 2, 3]}}, list(range(20)),
        {f"k{i}": i for i in range(20)},
    ]
    for c in cases:
        assert msgpack_unpack(msgpack_pack(c)) == c


def test_msgpack_eventtime_ext():
    t = EventTime(1_767_225_600, 123_456_789)
    got = msgpack_unpack(msgpack_pack(t))
    assert got == t and got.nsec == 123_456_789


def test_msgpack_trailing_bytes_raise():
    with pytest.raises(ValueError, match="trailing"):
        msgpack_unpack(msgpack_pack(1) + b"\x01")
    assert msgpack_unpack_stream(msgpack_pack(1) + msgpack_pack("a")) == [1, "a"]


def _entries():
    return [
        (EventTime(1_767_225_600, 500_000_000), {"message": "hello", "level": "info"}),
        (1_767_225_601, {"message": "world", "n": 7}),
    ]


def test_decode_message_mode():
    frame = msgpack_pack(["app.log", 1_767_225_600, {"message": "m", "ok": True}])
    got = decode_forward_frame(frame)
    assert len(got) == 1
    tag, ts, rec = got[0]
    assert tag == "app.log" and rec == {"message": "m", "ok": "True"}
    assert ts.isoformat() == "2026-01-01T00:00:00+00:00"


def test_decode_forward_mode():
    frame = msgpack_pack(["svc", [[t, r] for t, r in _entries()]])
    got = decode_forward_frame(frame)
    assert [g[0] for g in got] == ["svc", "svc"]
    assert got[0][1].microsecond == 500_000  # EventTime nsec → µs
    assert got[1][2]["n"] == "7"


@pytest.mark.parametrize("compressed", [False, True])
def test_decode_packed_forward(compressed):
    blob = b"".join(msgpack_pack([t, r]) for t, r in _entries())
    if compressed:
        frame = msgpack_pack(["svc", gzip.compress(blob), {"compressed": "gzip"}])
    else:
        frame = msgpack_pack(["svc", blob, {"size": 2}])
    got = decode_forward_frame(frame)
    assert len(got) == 2 and got[0][2]["message"] == "hello"


def test_fluent_parse_spark(spark):
    frames = [
        (msgpack_pack(["a.x", 1_767_225_600, {"m": "one"}]),),
        (msgpack_pack(["b.y", [[1_767_225_601, {"m": "two"}], [1_767_225_602, {"m": "three"}]]]),),
    ]
    df = spark.createDataFrame(frames, "payload binary")
    rows = fluent_parse(df).orderBy("ts").collect()
    assert [(r.tag, r.record["m"]) for r in rows] == [
        ("a.x", "one"), ("b.y", "two"), ("b.y", "three"),
    ]
    assert str(rows[0].ts) == "2026-01-01 00:00:00"


def test_fluent_toml_pipeline(spark, tmp_path):
    # `type = "fluent"` dispatches spooled frame files through the pipeline.
    frame = msgpack_pack(["app.web", 1_767_225_600, {"m": "from file", "lvl": "info"}])
    (tmp_path / "frame-0.msgpack").write_bytes(frame)
    from vector_spark.plans.pipeline import Pipeline

    toml_src = f"""
[sources.fw]
type = "fluent"
path = "{tmp_path}"

[sinks.out]
type = "console"
inputs = ["fw"]
"""
    rows = Pipeline.from_toml(toml_src).build(spark)["out"].collect()
    assert len(rows) == 1
    assert rows[0].tag == "app.web" and rows[0].record["lvl"] == "info"


# --- property: the codec round-trips arbitrary protocol-shaped values --------

from hypothesis import given, settings
from hypothesis import strategies as st

_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=64),
    st.binary(max_size=64),
    st.builds(
        EventTime,
        st.integers(min_value=0, max_value=2**32 - 1),
        st.integers(min_value=0, max_value=999_999_999),
    ),
)
_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=8),
        st.dictionaries(st.text(max_size=16), children, max_size=8),
    ),
    max_leaves=30,
)


@given(_value)
@settings(max_examples=150, deadline=None)
def test_msgpack_property_roundtrip(v):
    assert msgpack_unpack(msgpack_pack(v)) == v


def test_forward_empty_and_float_time_and_big_values():
    # empty Forward frame = zero rows, not a crash (clients flush empty
    # buffers); option dict after the empty list is NOT a record
    assert decode_forward_frame(msgpack_pack(["t", []])) == []
    assert decode_forward_frame(msgpack_pack(["t", [], {"size": 0}])) == []
    # Message mode with a missing record map fails loudly
    with pytest.raises(ValueError, match="no record map"):
        decode_forward_frame(msgpack_pack(["t", 5]))
    # float event time keeps sub-second precision (fluentd time_as_float)
    got = decode_forward_frame(msgpack_pack(["t", 5.75, {"m": "x"}]))
    assert got[0][1].microsecond == 750_000
    # >64KB strings and >65535-element containers round-trip (str32/array32/map32)
    big = "x" * 70_000
    assert msgpack_unpack(msgpack_pack(big)) == big
    arr = list(range(70_000))
    assert msgpack_unpack(msgpack_pack(arr)) == arr
    m = {f"k{i}": i for i in range(66_000)}
    assert msgpack_unpack(msgpack_pack(m)) == m
