"""VRL-subset compiler goldens — mirrors the filter examples in the
reference's config forms (config_panel.rs:1544-1581) and live configs."""

from __future__ import annotations

import pandas as pd
import pytest

from vector_spark.synth import sample_log_events
from vector_spark.vrl import VRLError, compile_condition


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(pd.DataFrame(sample_log_events(40)))


def test_equality(ev):
    # `.level == "error"` (config_panel.rs:1549)
    assert ev.filter(compile_condition('.level == "error"')).count() == 10


def test_numeric_comparison_with_coalesce(ev):
    # `status = to_int(.status) ?? 200; status >= 400` (production/vector.toml:32-39)
    got = ev.filter(compile_condition("status = to_int(.status) ?? 200; status >= 400"))
    rows = got.select("status").distinct().collect()
    assert {r.status for r in rows} <= {"404", "500", "503"}


def test_exists(ev):
    # `exists(.user_id)` (config_panel.rs:1560)
    assert ev.filter(compile_condition("exists(.level)")).count() == 40
    assert ev.filter(compile_condition("!exists(.level)")).count() == 0


def test_contains(ev):
    # `contains(string!(.message), "error")` (config_panel.rs:1568; demo.toml:15-21)
    n = ev.filter(compile_condition('contains(string!(.message), "request 1")')).count()
    assert n == 11  # "request 1" and "request 10"…"request 19"


def test_match_regex(ev):
    # `match(.message, r'ERROR|FATAL')` (config_panel.rs:1576)
    n = ev.filter(compile_condition(r"match(.message, r'request [12]\d')")).count()
    assert n == 20


def test_boolean_operators(ev):
    c = compile_condition('.level == "error" || .level == "warn"')
    assert ev.filter(c).count() == 20
    c2 = compile_condition('.level == "error" && .service == "demo-app"')
    assert ev.filter(c2).count() == 10


def test_string_functions(ev):
    assert ev.filter(compile_condition('starts_with(.message, "Processing")')).count() == 40
    assert ev.filter(compile_condition("length(.level) == 4")).count() == 20  # info, warn
    assert ev.filter(compile_condition('upcase(.level) == "ERROR"')).count() == 10


def test_is_log_kind():
    assert compile_condition("is_log()", event_kind="log") is not None


def test_arith_and_null(ev):
    assert ev.filter(compile_condition(".pid - 12345 >= 3")).count() > 0
    assert ev.filter(compile_condition("to_int(.service) == null")).count() == 0  # NULL == NULL → drop all


def test_syntax_error():
    with pytest.raises(VRLError):
        compile_condition(".level === 3")
    with pytest.raises(VRLError):
        compile_condition("unknown_fn(.x)")
