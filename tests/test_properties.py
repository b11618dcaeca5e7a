"""Property-based tests (hypothesis) for the pure-function contracts.

The reference has no property tests (SURVEY §5); these guard the two
pieces of this engine where a single bad byte breaks the whole contract:
the html→text extractor (byte-identical invariant) and the VRL condition
compiler (filter semantics must equal a reference evaluation).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from vector_spark.extract import extract_text_bytes, extract_text_str

# --------------------------------------------------------------- extractor


@given(st.binary(max_size=2048))
@settings(max_examples=300, deadline=None)
def test_extractor_total_and_deterministic(data):
    """Never raises on arbitrary bytes; same input → same output."""
    a = extract_text_bytes(data)
    b = extract_text_bytes(data)
    assert a == b
    assert isinstance(a, bytes)


@given(st.binary(max_size=2048))
@settings(max_examples=300, deadline=None)
def test_extractor_whitespace_normalized(data):
    """Output never has leading/trailing whitespace or 2+ whitespace runs —
    the normalization half of the byte contract."""
    out = extract_text_bytes(data)
    assert out == out.strip()
    assert b"  " not in out and b"\n" not in out and b"\t" not in out


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200))
@settings(max_examples=200, deadline=None)
def test_extractor_plain_text_passthrough(text):
    """Text with no tags/entities passes through modulo whitespace collapse."""
    if any(ch in text for ch in "<>&"):
        return
    import re

    raw = text.encode("utf-8")
    # reference in the BYTE domain: the contract collapses ASCII whitespace
    # (\s in bytes), not Python's wider str.split() whitespace (\x1c-\x1f).
    want = re.sub(rb"\s+", b" ", raw).strip().decode("utf-8", errors="replace")
    assert extract_text_str(raw) == want


def test_extractor_tag_and_entity_goldens():
    cases = {
        b"<html><body><p>a b</p></body></html>": b"a b",
        b"<script>var x = 1;</script>hi": b"hi",
        b"<style>p{}</style>ok": b"ok",
        b"a &amp;lt; b": b"a &lt; b",  # &amp; decodes LAST
        b"x &lt;tag&gt; y": b"x <tag> y",
        b"": b"",
        None: b"",
    }
    for html, want in cases.items():
        assert extract_text_bytes(html) == want, html


# ------------------------------------------------------------ VRL compiler


@given(
    st.integers(min_value=-100, max_value=100),
    st.sampled_from([">=", ">", "<=", "<", "==", "!="]),
)
@settings(max_examples=30, deadline=None)
def test_vrl_numeric_comparisons_match_python(spark_session_holder, threshold, op):
    """Compiled `.value <op> t` filter keeps exactly the rows Python keeps."""
    spark = spark_session_holder
    from vector_spark.operators import filter_events

    rows = [(i, float(v)) for i, v in enumerate(range(-5, 6))]
    df = spark.createDataFrame(rows, "id long, value double")
    got = {r.id for r in filter_events(df, f".value {op} {threshold}").collect()}
    py = {
        i
        for i, v in rows
        if {
            ">=": v >= threshold,
            ">": v > threshold,
            "<=": v <= threshold,
            "<": v < threshold,
            "==": v == threshold,
            "!=": v != threshold,
        }[op]
    }
    assert got == py


def test_vrl_combined_conditions(spark):
    from vector_spark.operators import filter_events

    df = spark.createDataFrame(
        [(1, "error", 5.0), (2, "error", 50.0), (3, "info", 50.0), (4, None, 50.0)],
        "id long, level string, value double",
    )
    got = {r.id for r in filter_events(df, '.level == "error" && .value >= 10').collect()}
    assert got == {2}
    got = {r.id for r in filter_events(df, 'exists(.level) || .value < 0').collect()}
    assert got == {1, 2, 3}
    got = {r.id for r in filter_events(df, '!(.level == "error")').collect()}
    assert got == {3}  # three-valued logic: NULL level row drops, like VRL error


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    """Module-held session for hypothesis (function-scoped fixtures clash
    with @given)."""
    return spark


# --------------------------------------------------------- datadog_search

_dd_field = st.sampled_from(["status", "host", "duration", "user_id"])
_dd_word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)


@st.composite
def _dd_queries(draw):
    """Grammar-directed random datadog_search queries."""
    def atom():
        kind = draw(st.integers(0, 5))
        f, w = draw(_dd_field), draw(_dd_word)
        if kind == 0:
            return w                                  # bare term
        if kind == 1:
            return f'"{w} {draw(_dd_word)}"'          # phrase
        if kind == 2:
            return f"{f}:{w}"                         # equality
        if kind == 3:
            return f"{f}:{w}*"                        # wildcard
        if kind == 4:
            return f"{f}:*"                           # existence
        return f"{f}:>={draw(st.integers(0, 999))}"   # comparison

    parts = [atom() for _ in range(draw(st.integers(1, 4)))]
    ops = [draw(st.sampled_from([" AND ", " OR ", " "])) for _ in parts[1:]]
    q = parts[0]
    for op, p in zip(ops, parts[1:]):
        neg = draw(st.sampled_from(["", "-", "NOT "]))
        q += op + neg + p
    if draw(st.booleans()):
        q = f"({q})"
    return q


@given(q=_dd_queries())
@settings(max_examples=300, deadline=None)
def test_datadog_search_grammar_always_compiles(spark, q):
    """Every grammar-derived query compiles to a Column without raising —
    the parser is total over its documented surface.  (Column construction
    needs an active SparkContext in classic pyspark 4 — the `spark`
    fixture removes a latent test-ordering dependency.)"""
    from vector_spark.datadog_search import compile_datadog_search

    col = compile_datadog_search(q)
    assert col is not None


@given(q=st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_datadog_search_arbitrary_input_never_crashes_unexpectedly(spark, q):
    """Arbitrary input either compiles or raises the typed parse error —
    never an unhandled exception."""
    from vector_spark.datadog_search import DatadogSearchError, compile_datadog_search

    try:
        compile_datadog_search(q)
    except DatadogSearchError:
        pass


# ---------------------------------------------------------------- framing

@given(st.lists(st.binary(max_size=64), min_size=0, max_size=10))
@settings(max_examples=100, deadline=None)
def test_framing_roundtrip_encodings(frames):
    """encode-then-frame is the identity for both length-prefixed framings
    (pure-python halves of the UDFs, property-checked)."""
    import struct

    from vector_spark.sources.codecs import _length_delimited_udf, _octet_counting_udf

    ld = b"".join(struct.pack(">I", len(f)) + f for f in frames)
    oc = b"".join(b"%d " % len(f) + f for f in frames)
    expect = [(f.decode("utf-8", errors="replace"), False) for f in frames]
    # call the inner splitters via the udf's wrapped function on a pd.Series
    import pandas as pd

    assert list(_length_delimited_udf.func(pd.Series([ld]))[0]) == expect
    assert list(_octet_counting_udf.func(pd.Series([oc]))[0]) == expect

    # corrupt tail: a truncated length-prefixed frame is NOT silently
    # dropped — the clean frames still decode and the remainder surfaces as
    # exactly one error=true sentinel carrying the undecodable bytes
    for buf, udf in ((ld + b"\x00\x00\x00\xffoops", _length_delimited_udf),
                     (oc + b"notalength", _octet_counting_udf)):
        got = list(udf.func(pd.Series([buf]))[0])
        assert got[:-1] == expect
        tail_frame, tail_err = got[-1]
        assert tail_err is True and tail_frame != ""
