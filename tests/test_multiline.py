"""Multiline log assembly (operators/multiline.py) — boundary modes,
orphan heads, partition invariance."""

from __future__ import annotations

import pytest

from vector_spark.operators import assemble_multiline

LINES = [
    # (host, line_no, message)
    ("a", 1, "2024-01-01 ERROR boom"),
    ("a", 2, "  at frame.one"),
    ("a", 3, "  at frame.two"),
    ("a", 4, "2024-01-01 INFO ok"),
    ("a", 5, "2024-01-01 WARN slow"),
    ("a", 6, "  at frame.three"),
    ("b", 1, "2024-01-02 INFO start"),
    ("b", 2, "2024-01-02 INFO stop"),
]

START = r"^\d{4}-\d{2}-\d{2} "


@pytest.fixture(scope="module")
def lines(spark):
    return spark.createDataFrame(LINES, "host string, line_no long, message string")


def test_start_pattern_mode(lines):
    out = assemble_multiline(
        lines, START, mode="start_pattern", stream_by=["host"]
    ).orderBy("host", "event_id")
    rows = out.collect()
    assert [(r.host, r.event_id, r.n_lines, r.orphan) for r in rows] == [
        ("a", 1, 3, False), ("a", 2, 1, False), ("a", 3, 2, False),
        ("b", 1, 1, False), ("b", 2, 1, False),
    ]
    assert rows[0].message == "2024-01-01 ERROR boom\n  at frame.one\n  at frame.two"
    assert rows[0].first_line == 1
    assert rows[2].message == "2024-01-01 WARN slow\n  at frame.three"


def test_continuation_mode(lines):
    # continuation regex: indented lines continue the previous event
    out = assemble_multiline(
        lines, r"^\s", mode="continuation", stream_by=["host"]
    )
    got = {(r.host, r.event_id): r.message for r in out.collect()}
    assert got[("a", 1)] == "2024-01-01 ERROR boom\n  at frame.one\n  at frame.two"
    assert got[("a", 3)] == "2024-01-01 WARN slow\n  at frame.three"


def test_orphan_head(spark):
    # rotation artifact: file starts mid-event — fragment kept, flagged
    df = spark.createDataFrame(
        [("a", 1, "  at orphan.frame"), ("a", 2, "2024-01-01 INFO first real")],
        "host string, line_no long, message string",
    )
    rows = assemble_multiline(df, START, stream_by=["host"]).orderBy("event_id").collect()
    assert [(r.event_id, r.orphan, r.message) for r in rows] == [
        (0, True, "  at orphan.frame"),
        (1, False, "2024-01-01 INFO first real"),
    ]


def test_partition_invariance(lines):
    base = assemble_multiline(lines, START, stream_by=["host"])
    shuffled = assemble_multiline(
        lines.repartition(7, "line_no"), START, stream_by=["host"]
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, shuffled.collect()))


def test_bad_args(lines):
    with pytest.raises(ValueError, match="mode"):
        assemble_multiline(lines, START, mode="nope")
    with pytest.raises(ValueError, match="pattern"):
        assemble_multiline(lines, "")


def test_no_python_in_plan(lines):
    plan = (
        assemble_multiline(lines, START, stream_by=["host"])
        ._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    assert "pythonudf" not in plan
