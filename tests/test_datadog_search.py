"""datadog_search condition syntax (filter condition_type,
config_panel.rs:1461-1467): grammar → Spark Column, pushdown-friendly."""

from __future__ import annotations

import pytest

from vector_spark.datadog_search import DatadogSearchError, compile_datadog_search
from vector_spark.operators import filter_events


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # message, status, host, user_id, duration
        ("Connection timed out", "error", "web-01", "u1", 120.0),
        ("request ok", "info", "web-02", None, 30.0),
        ("Fatal ERROR in worker", "error", "db-01", "u2", 450.0),
        ("slow request", "warn", "web-03", "u3", 900.0),
        ("errorless run", "info", "api-01", None, 10.0),
    ]
    return spark.createDataFrame(
        rows, "message string, status string, host string, user_id string, duration double"
    )


def _msgs(events, q):
    return {r.message for r in filter_events(events, q, condition_type="datadog_search").collect()}


def test_bare_term_is_word_match_case_insensitive(events):
    # word-boundary: 'errorless' must NOT match the bare term 'error'
    assert _msgs(events, "error") == {"Fatal ERROR in worker"}


def test_quoted_phrase(events):
    assert _msgs(events, '"timed out"') == {"Connection timed out"}


def test_attribute_equality_and_at_prefix(events):
    assert _msgs(events, "status:error") == {"Connection timed out", "Fatal ERROR in worker"}
    assert _msgs(events, "@status:error") == _msgs(events, "status:error")


def test_wildcard_value(events):
    assert _msgs(events, "host:web-*") == {"Connection timed out", "request ok", "slow request"}


def test_existence(events):
    assert _msgs(events, "user_id:*") == {
        "Connection timed out",
        "Fatal ERROR in worker",
        "slow request",
    }


def test_numeric_comparisons_and_ranges(events):
    assert _msgs(events, "duration:>=450") == {"Fatal ERROR in worker", "slow request"}
    assert _msgs(events, "duration:[30 TO 450]") == {
        "Connection timed out",
        "request ok",
        "Fatal ERROR in worker",
    }
    assert _msgs(events, "duration:[* TO 30]") == {"request ok", "errorless run"}


def test_boolean_operators_and_negation(events):
    assert _msgs(events, "status:error AND host:web-*") == {"Connection timed out"}
    assert _msgs(events, "status:warn OR status:info") == {
        "request ok",
        "slow request",
        "errorless run",
    }
    assert _msgs(events, "NOT status:error") == {"request ok", "slow request", "errorless run"}
    assert _msgs(events, "-status:error") == _msgs(events, "NOT status:error")
    assert _msgs(events, "(status:error OR status:warn) AND -host:db-01") == {
        "Connection timed out",
        "slow request",
    }


def test_juxtaposition_is_implicit_and(events):
    assert _msgs(events, "status:error host:db-*") == {"Fatal ERROR in worker"}


def test_empty_query_matches_everything(events):
    assert len(_msgs(events, "")) == 5


def test_condition_stays_pushdown_eligible(events):
    # compiles to plain Column expressions — a Filter node, no UDF
    plan = filter_events(events, "status:error AND duration:>100", condition_type="datadog_search")
    explained = plan._jdf.queryExecution().optimizedPlan().toString()
    assert "pythonUDF" not in explained.lower()


def test_parse_errors():
    with pytest.raises(DatadogSearchError):
        compile_datadog_search("(status:error")
    with pytest.raises(DatadogSearchError):
        compile_datadog_search("status:error OR")


def test_missing_attribute_matches_nothing_when_schema_known(spark):
    """Schemaless semantics: a query on an attribute the events don't carry
    matches nothing (like Datadog) instead of raising UNRESOLVED_COLUMN."""
    df = spark.createDataFrame([("x", "error")], "message string, status string")
    kept = filter_events(df, "user_id:*", condition_type="datadog_search")
    assert kept.count() == 0
    kept2 = filter_events(df, "user_id:alice OR status:error", condition_type="datadog_search")
    assert kept2.count() == 1  # the present attribute still matches


def test_wildcard_with_backslash_literal(spark):
    df = spark.createDataFrame(
        [(r"C:\temp\f.txt",), ("Ctemp.txt",)], "path string"
    )
    got = {r.path for r in filter_events(df, r"path:C:\temp*", condition_type="datadog_search").collect()}
    assert got == {r"C:\temp\f.txt"}  # backslash is literal, not a LIKE escape
