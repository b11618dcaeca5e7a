"""counter_rate / delta_to_cumulative — semantics + partition invariance."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from vector_spark.operators import counter_rate, delta_to_cumulative


def _ts(s: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def samples(spark):
    # two series: "a" is a healthy cumulative counter with one mid-life
    # reset (30 -> 4); "b" has a same-timestamp pair and a zero-elapsed gap
    rows = [
        ("a", _ts(0), 10.0, 1),
        ("a", _ts(10), 30.0, 2),
        ("a", _ts(20), 4.0, 3),   # reset: 4 < 30
        ("a", _ts(40), 9.0, 4),
        ("b", _ts(0), 5.0, 5),
        ("b", _ts(5), 5.0, 6),    # flat
        ("b", _ts(5), 8.0, 7),    # same ts as previous -> delta, no rate
    ]
    return spark.createDataFrame(rows, "series string, ts timestamp, value double, i int")


def test_counter_rate_prometheus_reset_semantics(samples):
    out = counter_rate(
        samples, ["series"], ts_col="ts", value_col="value", tiebreaker="i"
    ).orderBy("i").collect()
    deltas = [r["delta"] for r in out]
    rates = [r["rate_per_s"] for r in out]
    # series a: first sample NULL; +20 over 10 s; reset -> increase = new
    # value (4) over 10 s; +5 over 20 s
    assert deltas[:4] == [None, 20.0, 4.0, 5.0]
    assert rates[:4] == [None, 2.0, 0.4, 0.25]
    # series b: flat (0 over 5 s), then same-ts sample: delta 3, rate NULL
    assert deltas[4:] == [None, 0.0, 3.0]
    assert rates[4:] == [None, 0.0, None]


def test_counter_rate_strict_mode_nulls_resets(samples):
    out = counter_rate(
        samples, ["series"], ts_col="ts", value_col="value",
        tiebreaker="i", handle_resets=False,
    ).orderBy("i").collect()
    assert out[2]["delta"] is None and out[2]["rate_per_s"] is None
    assert out[1]["delta"] == 20.0  # non-reset rows unaffected


def test_delta_to_cumulative_running_sum(samples):
    out = delta_to_cumulative(
        samples, ["series"], ts_col="ts", value_col="value", tiebreaker="i"
    ).orderBy("i").collect()
    assert [r["cumulative"] for r in out] == [10.0, 40.0, 44.0, 53.0, 5.0, 10.0, 18.0]


def test_partition_invariance(spark, samples):
    # identical output whether the input arrives as 1 partition or 16
    # shuffled ones — the tiebreaker makes the event-time order total
    base = counter_rate(
        samples.repartition(1), ["series"], ts_col="ts", value_col="value",
        tiebreaker="i",
    ).orderBy("i").collect()
    shuffled = counter_rate(
        samples.repartition(16, F.col("value")), ["series"], ts_col="ts",
        value_col="value", tiebreaker="i",
    ).orderBy("i").collect()
    assert base == shuffled


def test_counter_rate_requires_series_cols(samples):
    with pytest.raises(ValueError):
        counter_rate(samples, [], ts_col="ts", value_col="value")
    with pytest.raises(ValueError):
        delta_to_cumulative(samples, [], ts_col="ts", value_col="value")


def test_roundtrip_delta_cum_rate(spark):
    # deltas -> cumulative -> counter_rate recovers the deltas (no resets)
    rows = [("s", _ts(i * 10), float(d), i) for i, d in enumerate([3, 0, 7, 2, 5])]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double, i int")
    cum = delta_to_cumulative(df, ["series"], ts_col="ts", value_col="value", tiebreaker="i")
    back = counter_rate(
        cum.select("series", "ts", "i", F.col("cumulative").alias("value")),
        ["series"], ts_col="ts", value_col="value", tiebreaker="i",
    ).orderBy("i").collect()
    assert [r["delta"] for r in back] == [None, 0.0, 7.0, 2.0, 5.0]


# ---------------------------------------------------------------------------
# histogram_quantile
# ---------------------------------------------------------------------------

def test_histogram_quantile_interpolation(spark):
    rows = [
        # 10 obs <=1, 20 in (1,5], 5 in (5,+inf)
        (1, [10, 20, 5], [1.0, 5.0]),
        (2, [0, 0, 0], [1.0, 5.0]),     # empty histogram -> NULL
        (3, None, [1.0, 5.0]),          # NULL counts -> NULL
        (4, [3, 0, 9], [1.0, 5.0]),     # rank in +inf bucket -> highest bound
        (5, [4, 4], []),                # no finite bounds -> NULL
    ]
    df = spark.createDataFrame(
        rows, "id int, bucket_counts array<bigint>, explicit_bounds array<double>"
    )
    out = {r["id"]: r["q0_5"] for r in
           __import__("vector_spark.operators", fromlist=["histogram_quantile"])
           .histogram_quantile(df, 0.5).collect()}
    # rank = 17.5: first bucket holds 10, so 7.5/20 into (1, 5]
    assert out[1] == 1.0 + 4.0 * 7.5 / 20
    assert out[2] is None and out[3] is None and out[5] is None
    assert out[4] == 5.0  # +inf bucket clamps to highest finite bound


def test_histogram_quantile_edges(spark):
    from vector_spark.operators import histogram_quantile

    df = spark.createDataFrame(
        [(1, [4, 6], [2.0])],
        "id int, bucket_counts array<bigint>, explicit_bounds array<double>",
    )
    # q=0 -> rank 0 -> first bucket at its very start (lower edge 0)
    assert histogram_quantile(df, 0.0).collect()[0]["q0_0"] == 0.0
    # q=1 -> rank 10 -> lands exactly on the last cumulative: +inf bucket
    assert histogram_quantile(df, 1.0).collect()[0]["q1_0"] == 2.0
    # q=0.25 -> rank 2.5 inside first bucket: 2.0 * 2.5/4
    assert histogram_quantile(df, 0.25).collect()[0]["q0_25"] == 2.0 * 2.5 / 4
    with pytest.raises(ValueError):
        histogram_quantile(df, 1.5)


def test_histogram_quantile_from_otlp_rows(spark):
    # end-to-end: decode an OTLP histogram, then quantile it in-row
    import json
    from vector_spark.operators import histogram_quantile
    from vector_spark.sources.otlp import otlp_metrics_parse

    body = json.dumps({
        "resourceMetrics": [{
            "resource": {"attributes": []},
            "scopeMetrics": [{
                "scope": {"name": "m"},
                "metrics": [{
                    "name": "latency",
                    "unit": "ms",
                    "histogram": {
                        "dataPoints": [{
                            "timeUnixNano": "1700000000000000000",
                            "count": "35",
                            "sum": 99.0,
                            "bucketCounts": ["10", "20", "5"],
                            "explicitBounds": [1.0, 5.0],
                        }],
                        "aggregationTemporality": 2,
                    },
                }],
            }],
        }]
    })
    df = otlp_metrics_parse(spark.createDataFrame([(body,)], "message string"))
    row = histogram_quantile(df, 0.5, out_col="p50").collect()[0]
    assert row["p50"] == 1.0 + 4.0 * 7.5 / 20


def test_range_rate_aligned_windows(spark, samples):
    from vector_spark.operators import range_rate

    out = {
        (r["series"], str(r["window_start"])): r
        for r in range_rate(
            samples, ["series"], 30, ts_col="ts", value_col="value", tiebreaker="i"
        ).collect()
    }
    # series a, window [00:00, 00:30): samples 10, 30, 4(reset) ->
    # increase = 20 + 4 = 24, rate = 24/30
    a0 = out[("a", "2024-01-01 00:00:00")]
    assert a0["n_samples"] == 3
    assert a0["increase"] == 24.0
    assert a0["rate_per_s"] == 24.0 / 30
    # series a, window [00:30, 01:00): single sample (9.0) -> NULL increase
    a1 = out[("a", "2024-01-01 00:00:30")]
    assert a1["n_samples"] == 1 and a1["increase"] is None and a1["rate_per_s"] is None
    # series b, one window: 5 -> 5 -> 8 gives 0 + 3
    b0 = out[("b", "2024-01-01 00:00:00")]
    assert b0["n_samples"] == 3 and b0["increase"] == 3.0
    # no cross-window delta: totals only count in-window pairs
    assert len(out) == 3


def test_range_rate_strict_mode_and_partition_invariance(spark, samples):
    from vector_spark.operators import range_rate

    strict = {
        r["series"]: r["increase"]
        for r in range_rate(
            samples, ["series"], 30, ts_col="ts", value_col="value",
            tiebreaker="i", handle_resets=False,
        ).where(F.col("window_start") == _ts(0)).collect()
    }
    assert strict["a"] == 20.0  # the reset pair is dropped, not counted
    assert strict["b"] == 3.0
    a = sorted(map(tuple, range_rate(
        samples.repartition(1), ["series"], 30,
        ts_col="ts", value_col="value", tiebreaker="i").collect()))
    b = sorted(map(tuple, range_rate(
        samples.repartition(7, "value"), ["series"], 30,
        ts_col="ts", value_col="value", tiebreaker="i").collect()))
    assert a == b


def test_range_rate_validation(samples):
    from vector_spark.operators import range_rate

    with pytest.raises(ValueError):
        range_rate(samples, [], 30)
    with pytest.raises(ValueError):
        range_rate(samples, ["series"], 0)


@pytest.fixture(scope="module")
def histo_points(spark):
    # two services; "api" has two pods' points over the same bounds, plus
    # one point on a DIFFERENT bounds layout that must not merge; "db" has
    # one point and one malformed (empty buckets) that must be dropped
    rows = [
        ("api", [0.5, 1.5], [1, 2, 3], 6, 4.5),
        ("api", [0.5, 1.5], [4, 0, 1], 5, 2.0),
        ("api", [1.0], [7, 7], 14, 9.0),
        ("db", [0.5, 1.5], [2, 2, 2], 6, 3.0),
        ("db", [0.5, 1.5], [], 9, 9.0),
    ]
    return spark.createDataFrame(
        rows,
        "service string, explicit_bounds array<double>, "
        "bucket_counts array<long>, count long, sum double",
    )


def test_sum_histograms_bucketwise_merge(histo_points):
    from vector_spark.operators import sum_histograms

    out = {
        (r["service"], tuple(r["explicit_bounds"])): r
        for r in sum_histograms(histo_points, ["service"]).collect()
    }
    a = out[("api", (0.5, 1.5))]
    assert list(a["bucket_counts"]) == [5, 2, 4]
    assert a["count"] == 11 and a["sum"] == 6.5
    # the different-bounds point stays its own row, never merged
    b = out[("api", (1.0,))]
    assert list(b["bucket_counts"]) == [7, 7] and b["count"] == 14
    # the empty-bucket point is dropped entirely (count/sum not billed)
    d = out[("db", (0.5, 1.5))]
    assert list(d["bucket_counts"]) == [2, 2, 2]
    assert d["count"] == 6 and d["sum"] == 3.0
    assert len(out) == 3


def test_sum_histograms_feeds_quantile_and_is_partition_invariant(histo_points):
    from vector_spark.operators import histogram_quantile, sum_histograms

    merged = sum_histograms(histo_points, ["service"]).where(
        F.size("explicit_bounds") == 2
    )
    q = {r["service"]: r["p50"] for r in
         histogram_quantile(merged, 0.5, out_col="p50").collect()}
    # api merged: [5, 2, 4] over bounds [0.5, 1.5]: total 11, rank 5.5,
    # bucket 2 (0.5, 1.5]: 0.5 + (1.5-0.5) * (5.5-5)/2
    assert q["api"] == 0.5 + 1.0 * 0.5 / 2
    a = sorted(map(tuple, sum_histograms(
        histo_points.repartition(1), ["service"]).collect()))
    b = sorted(map(tuple, sum_histograms(
        histo_points.repartition(5, "sum"), ["service"]).collect()))
    assert a == b


def test_sum_histograms_validation(histo_points):
    from vector_spark.operators import sum_histograms

    with pytest.raises(ValueError):
        sum_histograms(histo_points, [])


def test_histogram_quantile_q0_skips_empty_leading_buckets(spark):
    from vector_spark.operators import histogram_quantile

    df = spark.createDataFrame(
        [(1, [0, 5, 3], [1.0, 2.0]), (2, [2, 2], [1.0])],
        "id int, bucket_counts array<long>, explicit_bounds array<double>",
    )
    out = {r["id"]: r["q0_0"] for r in histogram_quantile(df, 0.0).collect()}
    # rank 0 with an EMPTY first bucket: land in the first non-empty bucket
    # and return its lower edge — not a 0/0 NULL
    assert out[1] == 1.0
    # non-empty first bucket: lower edge 0 by the non-negative convention
    assert out[2] == 0.0


def test_over_time_gauge_aggregates(spark):
    from vector_spark.operators import over_time

    rows = [
        ("g", _ts(1), 1.0, 1),
        ("g", _ts(5), 3.0, 2),
        ("g", _ts(9), 2.0, 3),
        ("g", _ts(12), 7.0, 4),   # second 10 s window
        ("h", _ts(2), 5.0, 5),
        ("h", _ts(2), 6.0, 6),    # same ts — tiebreaker decides last_v
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double, i int")
    out = over_time(
        df, ["series"], 10, ts_col="ts", value_col="value",
        quantiles=(0.5,), tiebreaker="i",
    ).orderBy("series", "window_start")
    got = [
        (r.series, r.avg_v, r.min_v, r.max_v, r.sum_v, r.n_samples, r.last_v, r.q5)
        for r in out.collect()
    ]
    assert got == [
        ("g", 2.0, 1.0, 3.0, 6.0, 3, 2.0, 2.0),
        ("g", 7.0, 7.0, 7.0, 7.0, 1, 7.0, 7.0),
        ("h", 5.5, 5.0, 6.0, 11.0, 2, 6.0, 5.5),
    ]


def test_over_time_partition_invariance(spark):
    from vector_spark.operators import over_time

    rows = [("s", _ts(i % 50), float(i % 13), i) for i in range(300)]
    df = spark.createDataFrame(rows, "series string, ts timestamp, value double, i int")
    a = over_time(df, ["series"], 15, ts_col="ts", quantiles=(0.9,), tiebreaker="i")
    b = over_time(
        df.repartition(11, "i"), ["series"], 15, ts_col="ts",
        quantiles=(0.9,), tiebreaker="i",
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_over_time_validation(spark):
    from vector_spark.operators import over_time

    df = spark.createDataFrame([("s", _ts(0), 1.0)], "series string, ts timestamp, value double")
    with pytest.raises(ValueError, match="series"):
        over_time(df, [], 10)
    with pytest.raises(ValueError, match="window_s"):
        over_time(df, ["series"], 0)
    with pytest.raises(ValueError, match="quantile"):
        over_time(df, ["series"], 10, quantiles=(1.5,))


def test_absent_windows_dead_man(spark):
    from vector_spark.operators import absent_windows

    # series "a" reports in windows 0,1,3 (gap at 2); "b" only in window 0
    rows = [
        ("a", _ts(1)), ("a", _ts(12)), ("a", _ts(31)),
        ("b", _ts(5)),
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp")
    out = absent_windows(df, ["series"], 10, ts_col="ts").orderBy("series", "window_start")
    got = [(r.series, r.window_start.second) for r in out.collect()]
    # domain = windows 0..3; absent: a@2, b@1, b@2, b@3
    assert got == [("a", 20), ("b", 10), ("b", 20), ("b", 30)]


def test_absent_windows_none_absent(spark):
    from vector_spark.operators import absent_windows

    df = spark.createDataFrame(
        [("s", _ts(1)), ("s", _ts(11))], "series string, ts timestamp"
    )
    assert absent_windows(df, ["series"], 10, ts_col="ts").count() == 0
    with pytest.raises(ValueError, match="series"):
        absent_windows(df, [], 10)


def test_over_time_quantile_naming_edges(spark):
    from vector_spark.operators import over_time

    df = spark.createDataFrame(
        [("s", _ts(1), 1.0, 1), ("s", _ts(2), 3.0, 2)],
        "series string, ts timestamp, value double, i int",
    )
    out = over_time(df, ["series"], 10, ts_col="ts",
                    quantiles=(0.0, 0.5, 1.0), tiebreaker="i")
    row = out.collect()[0]
    assert row.q0 == 1.0 and row.q5 == 2.0 and row.q1_0 == 3.0
    with pytest.raises(ValueError, match="duplicate quantile"):
        over_time(df, ["series"], 10, ts_col="ts", quantiles=(0.5, 0.5))
