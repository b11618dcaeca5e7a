"""Anomaly detectors: hand-computed bursts, cold start, tie determinism,
rate-spike lag semantics, partition invariance."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vector_spark.functions import detect_bursts, rate_spikes

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), et, float(v)) for i, (s, et, v) in enumerate(rows)],
        ["event_id", "ts", "event_type", "value"],
    )


def test_bursts_hand_computed(spark):
    # nine 1.0 readings then a 10.0: prev mean 1.0, 10 > 3×1 → flagged;
    # the steady rows never flag
    rows = [(s, "a", 1.0) for s in range(9)] + [(9, "a", 10.0)]
    ev = _ev(spark, rows)
    got = detect_bursts(ev, window=20, k_milli=3_000, min_prev=5).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.event_id, r.value_milli, r.prev_cnt, r.prev_sum_milli) == (9, 10_000, 9, 9_000)


def test_bursts_cold_start_never_flags(spark):
    # a huge second event: only 1 predecessor < min_prev → silent
    ev = _ev(spark, [(0, "a", 1.0), (1, "a", 1000.0)])
    assert detect_bursts(ev, min_prev=2).count() == 0


def test_bursts_boundary_is_strict(spark):
    # exactly 4× the mean with k=3000: 4000·cnt·sum comparison is strict >
    # (v·cnt − sum)·1000 = (4−1)·sum·1000 == 3000·sum → NOT flagged at 4×?
    # No: v=4, mean=1 → lhs = 3·sum·1000 == rhs → strict > fails → no flag.
    rows = [(s, "a", 1.0) for s in range(5)] + [(5, "a", 4.0)]
    assert detect_bursts(_ev(spark, rows), window=20, k_milli=3_000, min_prev=5).count() == 0
    rows[-1] = (5, "a", 4.001)
    assert detect_bursts(_ev(spark, rows), window=20, k_milli=3_000, min_prev=5).count() == 1


def test_bursts_window_is_rows_bounded(spark):
    # spike at position 30 sees only the last 3 rows (window=3), which are
    # high, so no flag; with window=30 the early low rows pull the mean down
    rows = [(s, "a", 1.0) for s in range(27)] + [(27, "a", 9.0), (28, "a", 9.0), (29, "a", 9.0), (30, "a", 10.0)]
    ev = _ev(spark, rows)
    assert detect_bursts(ev, window=3, k_milli=2_000, min_prev=3).where("event_id = 30").count() == 0
    assert detect_bursts(ev, window=30, k_milli=2_000, min_prev=3).where("event_id = 30").count() == 1


def test_bursts_timestamp_ties_deterministic(spark):
    # same ts for all rows: frame order falls back to event_id; output is
    # identical under any partitioning
    rows = [(0, "a", 1.0)] * 8 + [(0, "a", 50.0)]
    ev = _ev(spark, rows)
    a = sorted(map(tuple, detect_bursts(ev.repartition(1)).collect()))
    b = sorted(map(tuple, detect_bursts(ev.repartition(16)).collect()))
    assert a == b
    assert [r[1] for r in a] == [8]  # the 50.0 row, by id


def test_bursts_validation(spark):
    ev = _ev(spark, [(0, "a", 1.0)])
    with pytest.raises(ValueError, match="window"):
        detect_bursts(ev, window=0)
    with pytest.raises(ValueError, match="min_prev"):
        detect_bursts(ev, min_prev=0)


def test_rate_spikes_hand_computed(spark):
    # bucket0: 2 events, bucket1: 5 events (2.5× > 2.0×) → flagged;
    # bucket2: 5 events (1.0×) → not flagged
    rows = ([(s, "a", 1.0) for s in (0, 30)]
            + [(60 + s, "a", 1.0) for s in range(5)]
            + [(120 + s, "a", 1.0) for s in range(5)])
    ev = _ev(spark, rows)
    got = rate_spikes(ev, bucket_s=60, ratio_milli=2_000).collect()
    assert len(got) == 1
    assert (got[0].cnt, got[0].prev_cnt) == (5, 2)
    assert got[0].bucket_start == T0 + dt.timedelta(seconds=60)


def test_rate_spikes_gap_lag_is_previous_occupied(spark):
    # bucket0: 1 event, bucket2: 5 events with bucket1 empty — lag compares
    # against bucket0 (documented), so it still flags
    rows = [(0, "a", 1.0)] + [(120 + s, "a", 1.0) for s in range(5)]
    got = rate_spikes(_ev(spark, rows), bucket_s=60, ratio_milli=2_000).collect()
    assert len(got) == 1 and got[0].prev_cnt == 1


def test_rate_spikes_first_bucket_never_flags(spark):
    rows = [(s, "a", 1.0) for s in range(5)]
    assert rate_spikes(_ev(spark, rows), bucket_s=60).count() == 0
