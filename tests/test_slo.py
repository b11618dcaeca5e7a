"""slo_burn_alerts — SRE-workbook multi-window burn-rate semantics."""

from __future__ import annotations

from datetime import datetime

import pytest

from vector_spark.operators import slo_burn_alerts


def _ts(m: int, s: int = 0) -> datetime:
    return datetime(2024, 1, 1, 0, m, s)


@pytest.fixture(scope="module")
def events(spark):
    # slo 0.9 -> budget 0.1; short 60 s, long 300 s, threshold 3 means
    # "error ratio > 0.3 in BOTH windows".
    # svc "a": minute 0 is a blip (3/4 errors) inside a healthy long window
    #          -> long gate holds, no alert
    # svc "b": sustained breach — every minute 1/2 errors -> short AND long
    #          burn = 5 > 3 -> every minute fires
    rows = []
    rows += [("a", _ts(0, i), i < 3) for i in range(4)]          # 3/4 errors
    rows += [("a", _ts(m, i), False) for m in range(1, 5) for i in range(8)]
    for m in range(5):
        rows += [("b", _ts(m, 0), True), ("b", _ts(m, 30), False)]
    return spark.createDataFrame(rows, "svc string, ts timestamp, is_error boolean")


def test_slo_burn_alerts_long_window_gates_blips(events):
    out = slo_burn_alerts(
        events, ["svc"], ts_col="ts", error_col="is_error",
        slo_target=0.9, short_s=60, long_s=300, threshold=3.0,
    ).collect()
    by_svc = {}
    for r in out:
        by_svc.setdefault(r["svc"], []).append(r)
    # "a"'s blip minute has burn_short 7.5 > 3 but long burn 3/36/0.1 = 0.83
    assert "a" not in by_svc
    assert len(by_svc["b"]) == 5          # every sustained minute fires
    b0 = sorted(by_svc["b"], key=lambda r: r["window_start"])[0]
    assert b0["n_events"] == 2 and b0["n_errors"] == 1
    assert b0["burn_short"] == pytest.approx(5.0)
    assert b0["burn_long"] == pytest.approx(5.0)


def test_slo_burn_alerts_keep_all_and_invariance(events):
    all_rows = slo_burn_alerts(
        events, ["svc"], ts_col="ts", error_col="is_error",
        slo_target=0.9, short_s=60, long_s=300, threshold=3.0, keep_all=True,
    ).collect()
    # every (svc, minute) with traffic is present; firing matches the filter
    assert len(all_rows) == 10
    assert sum(r["firing"] for r in all_rows) == 5
    a = sorted(map(tuple, slo_burn_alerts(
        events.repartition(1), ["svc"], ts_col="ts", error_col="is_error",
        slo_target=0.9, short_s=60, long_s=300, threshold=3.0).collect()))
    b = sorted(map(tuple, slo_burn_alerts(
        events.repartition(7, "ts"), ["svc"], ts_col="ts", error_col="is_error",
        slo_target=0.9, short_s=60, long_s=300, threshold=3.0).collect()))
    assert a == b


def test_slo_burn_alerts_validation(events):
    with pytest.raises(ValueError):
        slo_burn_alerts(events, [], ts_col="ts")
    with pytest.raises(ValueError):
        slo_burn_alerts(events, ["svc"], ts_col="ts", slo_target=1.0)
    with pytest.raises(ValueError):
        slo_burn_alerts(events, ["svc"], ts_col="ts", short_s=60, long_s=90)


def test_slo_burn_alerts_null_series_still_alerts(spark):
    # a NULL series key (label missing on the event) is a real group: the
    # short<->long join is null-safe, so a sustained breach still fires
    rows = [(None, _ts(m, s), True) for m in range(5) for s in (0, 30)]
    ev = spark.createDataFrame(rows, "svc string, ts timestamp, is_error boolean")
    out = slo_burn_alerts(
        ev, ["svc"], ts_col="ts", error_col="is_error",
        slo_target=0.9, short_s=60, long_s=300, threshold=3.0,
    ).collect()
    assert len(out) == 5 and all(r["svc"] is None for r in out)
