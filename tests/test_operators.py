"""Per-operator goldens (SURVEY §2.1), in the style of the reference's
validation corpus (validation/mod.rs:423-939) — one test per transform on
deterministic inputs."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vector_spark import operators as O
from vector_spark.synth import sample_log_events


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(pd.DataFrame(sample_log_events(40)))


def test_remap_assignments(ev):
    out = O.remap(ev, {"environment": '"production"', "code": "to_int(.status) ?? 200"})
    row = out.first()
    assert row.environment == "production"
    assert isinstance(row.code, int)


def test_remap_delete_field(ev):
    out = O.remap(ev, {"pid": None})
    assert "pid" not in out.columns


def test_parse_apache_common(spark):
    from vector_spark.sources import demo_logs

    logs = demo_logs(spark, count=50, fmt="apache_common")
    parsed = O.parse_apache_common(logs)
    rows = parsed.collect()
    assert all(r.status is not None for r in rows)
    assert all(r.method in ("GET", "POST", "PUT", "DELETE") for r in rows)
    assert all(r.client_ip.startswith("10.") for r in rows)


def test_parse_json_fields(spark):
    from vector_spark.sources import demo_logs

    logs = demo_logs(spark, count=50, fmt="json")
    parsed = O.parse_json_fields(logs, "message", "method string, path string, status int, bytes long, ip string")
    rows = parsed.collect()
    assert all(r.status is not None for r in rows)
    assert all(isinstance(r.bytes, int) for r in rows)


def test_split_errors(spark):
    df = spark.createDataFrame([("1",), ("x",), ("3",)], "raw string")
    df = df.withColumn("n", F.col("raw").try_cast("int"))
    ok, err = O.split_errors(df, ["n"])
    assert ok.count() == 2 and err.count() == 1  # dropped_count accounting


def test_filter_with_dropped(ev):
    kept, dropped = O.filter_with_dropped(ev, '.level == "error"')
    assert kept.count() == 10
    assert dropped.count() == 30
    assert kept.count() + dropped.count() == ev.count()


def test_route_first_match_wins(ev):
    tagged = O.tag_routes(ev, {
        "errors": '.level == "error"',
        "also_errors": 'contains(string!(.message), "request")',  # matches everything
    })
    counts = {r.route: r.n for r in tagged.groupBy("route").agg(F.count("*").alias("n")).collect()}
    assert counts["errors"] == 10
    assert counts["also_errors"] == 30  # only rows not taken by the first route
    assert O.UNMATCHED not in counts


def test_route_split_ports(ev):
    tagged = O.tag_routes(ev, {"errors": '.level == "error"', "warns": '.level == "warn"'})
    ports = O.split(tagged, ["errors", "warns"], persist=False)
    assert ports["errors"].count() == 10
    assert ports["warns"].count() == 10
    assert ports[O.UNMATCHED].count() == 20
    total = sum(ports[p].count() for p in ports)
    assert total == 40  # routed-row equality: no row lost or duplicated


def test_sample_deterministic(ev):
    a = sorted(r.pid for r in O.sample(ev, 4, key="message").collect())
    b = sorted(r.pid for r in O.sample(ev.repartition(13), 4, key="message").collect())
    assert a == b  # same rows regardless of partitioning
    assert 0 < len(a) < 40


def test_throttle(ev):
    # 40 events over 40s, levels cycling every 4s → each 10s window holds
    # 2-3 events per level; threshold=1 keeps exactly one per (level, window)
    out = O.throttle(ev, "timestamp", threshold=1, window_secs=10, key_field="level", tiebreaker="pid")
    assert out.count() == 16  # 4 levels × 4 windows
    got = out.groupBy("level").count().collect()
    assert all(r["count"] == 4 for r in got)


def test_dedupe_first_wins(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")], "id long, k string, v string"
    )
    out = O.dedupe(df, ["k"], order_by="id").collect()
    assert {(r.k, r.v) for r in out} == {("a", "x"), ("b", "z")}


def test_reduce_merge_strategies(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)], "id long, k string, v double"
    )
    out = O.reduce_events(df, ["k"], {"v": "sum", "id": "max"}).collect()
    got = {r.k: (r.v, r.id, r.events_merged) for r in out}
    assert got == {"a": (30.0, 2, 2), "b": (5.0, 3, 1)}


def test_reduce_ends_when_sessions(spark):
    rows = [
        (1, "u1", "view"), (2, "u1", "purchase"), (3, "u1", "view"), (4, "u1", "view"),
        (5, "u2", "view"),
    ]
    df = spark.createDataFrame(rows, "id long, user string, etype string")
    out = O.reduce_events(
        df, ["user"], {"etype": "array"}, ends_when='.etype == "purchase"', ts_col="id"
    )
    got = sorted((r.user, r.events_merged) for r in out.collect())
    # u1: session [view, purchase] closed by purchase, then [view, view]; u2: [view]
    assert got == [("u1", 2), ("u1", 2), ("u2", 1)]


def test_aggregate_buckets(ev):
    out = O.aggregate(ev, "timestamp", interval="10 seconds", group_by=["level"], mode="auto", value_col="pid")
    rows = out.collect()
    assert sum(r.event_count for r in rows) == 40
    assert all(r.bucket_end > r.bucket_start for r in rows)


def test_log_to_metric_counter(ev):
    m = O.log_to_metric(ev, "events_total", "pid", tags=["level"])
    got = {r.tags["level"]: r.value for r in m.collect()}
    assert got == {"info": 10.0, "debug": 10.0, "warn": 10.0, "error": 10.0}
    assert all(r.kind == "incremental" for r in m.collect())


def test_metric_to_log_roundtrip(ev):
    logs = O.metric_to_log(O.log_to_metric(ev, "events_total", "pid", tags=["level"]))
    row = logs.first()
    assert row.message.startswith("metric events_total incremental")
    assert row.metric_name == "events_total"


def test_tag_cardinality_limit(spark):
    df = spark.createDataFrame(
        [(i, f"tag{i % 5}") for i in range(50)], "id long, tag string"
    )
    out = O.tag_cardinality_limit(df, "tag", value_limit=2, order_by="id")
    vals = {r.tag for r in out.collect()}
    assert vals == {"tag0", "tag1", "__overflow__"}
    dropped = O.tag_cardinality_limit(df, "tag", value_limit=2, order_by="id", action="drop_event")
    assert dropped.count() == 20


def test_enrich_broadcast_left_join(spark):
    from vector_spark import synth

    docs = synth.documents(spark, 200)
    docs = O.parse_url(docs)
    out = O.enrich(docs, synth.host_geo(spark), on="host")
    assert out.count() == 200  # left join keeps all rows
    assert "country" in out.columns
    # ~5% of hosts are absent from the dim → some NULLs expected across a
    # Zipfian draw, but every matched row has a country
    assert out.filter(F.col("country").isNotNull()).count() > 0


def test_salted_join_equals_plain_join(spark):
    from vector_spark import synth

    docs = O.parse_url(synth.documents(spark, 300))
    dim = synth.host_geo(spark)
    plain = {(r.url, r.country) for r in O.enrich(docs, dim, on="host").select("url", "country").collect()}
    salted = {(r.url, r.country) for r in O.salted_join(docs, dim, on="host", salt=8).select("url", "country").collect()}
    assert plain == salted


def test_log_to_metric_summary(spark):
    from vector_spark.operators import log_to_metric_summary

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)] + [("b", 5.0), ("b", 15.0)],
        "tag string, value double",
    )
    rows = {r.tag: r for r in log_to_metric_summary(df, "m", "value", tags=["tag"]).collect()}
    assert rows["a"]["count"] == 100 and rows["a"]["sum"] == 5050.0
    assert rows["a"]["q5"] == 50.5          # exact interpolated median of 1..100
    assert rows["b"]["q9"] == 14.0          # interp between 5 and 15 at 0.9
    assert rows["a"]["kind"] == "absolute"


def test_log_to_metric_histogram(spark):
    from vector_spark.operators import log_to_metric_histogram

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 10.0), ("a", 11.0), ("a", 99.0)], "tag string, value double"
    )
    rows = {
        (r.tag, r.bucket): r["count"]
        for r in log_to_metric_histogram(df, "h", "value", buckets=[10.0, 25.0], tags=["tag"]).collect()
    }
    # upper-bound-inclusive buckets: 1.0,10.0 → le_10.0; 11.0 → le_25.0; 99.0 → le_inf
    assert rows[("a", "le_10.0")] == 2
    assert rows[("a", "le_25.0")] == 1
    assert rows[("a", "le_inf")] == 1


def test_log_to_metric_distribution(spark):
    from vector_spark.operators import log_to_metric_distribution

    df = spark.createDataFrame(
        [("a", 3.0), ("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", None)],
        "tag string, value double",
    )
    rows = {r.tag: r for r in log_to_metric_distribution(df, "m", "value", tags=["tag"]).collect()}
    assert rows["a"].samples == [1.0, 2.0, 3.0]  # sorted → deterministic
    assert rows["a"]["count"] == 3 and rows["a"]["sum"] == 6.0
    assert rows["b"].samples == [5.0] and rows["b"]["count"] == 1  # NULL excluded


def test_log_to_metric_distribution_capped(spark):
    """max_samples bounds the sample list; count/sum stay exact; the kept
    subset is deterministic (hash order) across repeated runs."""
    from vector_spark.operators import log_to_metric_distribution

    data = [("a", float(i)) for i in range(100)] + [("b", 7.0)]
    df = spark.createDataFrame(data, "tag string, value double")
    out = log_to_metric_distribution(df, "m", "value", tags=["tag"], max_samples=10)
    rows = {r.tag: r for r in out.collect()}
    assert len(rows["a"].samples) == 10          # cap kicked in
    assert rows["a"]["count"] == 100             # count over ALL rows
    assert rows["a"]["sum"] == sum(range(100))   # sum over ALL rows
    assert rows["b"].samples == [7.0]            # under-cap group untouched
    # deterministic: a second run keeps the identical subset
    rows2 = {r.tag: r for r in out.collect()}
    assert rows2["a"].samples == rows["a"].samples
    # the kept subset is a real subset of the group's values
    assert set(rows["a"].samples) <= {float(i) for i in range(100)}


def test_log_to_metric_distribution_sketch(spark):
    """percentile_approx sketch variant: exact count/sum, quantiles within
    sketch tolerance of the exact answer."""
    from vector_spark.operators import log_to_metric_distribution_sketch

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 101)], "tag string, value double"
    )
    r = log_to_metric_distribution_sketch(df, "m", "value", tags=["tag"]).collect()[0]
    assert r["count"] == 100 and r["sum"] == 5050.0
    assert abs(r["q5"] - 50.0) <= 1.0
    assert abs(r["q9"] - 90.0) <= 1.0
    assert abs(r["q99"] - 99.0) <= 1.0
    assert r["kind"] == "absolute"


def test_route_all_matches_semantics(spark):
    """Upstream-Vector route: an event lands in EVERY matching output."""
    from vector_spark.operators import route_all_matches

    df = spark.createDataFrame(
        [(1, "error", 50), (2, "error", 5), (3, "info", 50), (4, "info", 5)],
        "id long, level string, value long",
    )
    outs = route_all_matches(
        df, {"errors": '.level == "error"', "high": ".value >= 30"}, persist=False
    )
    assert {r.id for r in outs["errors"].collect()} == {1, 2}
    assert {r.id for r in outs["high"].collect()} == {1, 3}      # id 1 in BOTH
    assert {r.id for r in outs["_unmatched"].collect()} == {4}
    # route flag columns don't leak into outputs
    assert set(outs["errors"].columns) == {"id", "level", "value"}


def test_pipeline_route_all_matches_mode(spark):
    from vector_spark.plans.pipeline import Pipeline

    p = Pipeline.from_dict(
        {
            "sources": {"ev": {"type": "memory", "events": []}},
            "transforms": {
                "r": {
                    "type": "route",
                    "inputs": ["ev"],
                    "mode": "all_matches",
                    "route": {"errors": '.level == "error"', "big": ".value >= 10"},
                }
            },
            "sinks": {
                "e": {"type": "memory", "inputs": ["r.errors"]},
                "b": {"type": "memory", "inputs": ["r.big"]},
            },
        }
    )
    built = p.build(
        spark,
        overrides={"ev": spark.createDataFrame(
            [("error", 20), ("info", 20), ("error", 1)], "level string, value long")},
    )
    from vector_spark.plans.sinks import console_sink

    e_rows = console_sink(built["e"])
    b_rows = console_sink(built["b"])
    assert len(e_rows) == 2      # both error rows
    assert len(b_rows) == 2      # both value>=10 rows (one is ALSO an error)


def test_pipeline_log_to_metric_list(spark):
    from vector_spark.plans.pipeline import Pipeline

    p = Pipeline.from_dict(
        {
            "sources": {"ev": {"type": "memory", "events": []}},
            "transforms": {
                "m": {
                    "type": "log_to_metric",
                    "inputs": ["ev"],
                    "metrics": [
                        {"name": "events_total", "field": "value", "type": "counter"},
                        {"name": "value_sum", "field": "value", "type": "counter",
                         "increment_by_value": True},
                    ],
                }
            },
            "sinks": {"out": {"type": "memory", "inputs": ["m"]}},
        }
    )
    built = p.build(
        spark,
        overrides={"ev": spark.createDataFrame([(1.0,), (2.0,)], "value double")},
    )
    from vector_spark.plans.sinks import console_sink

    rows = {r["name"]: r for r in console_sink(built["out"])}
    assert rows["events_total"]["value"] == 2.0
    assert rows["value_sum"]["value"] == 3.0


def test_reduce_array_merge_strategies(spark):
    """Vector's remaining reduce merge strategies: concat_newline,
    shortest_array, longest_array, flat_unique.  Order-sensitive ones take
    ts_col and follow EVENT-TIME order regardless of partition layout."""
    from vector_spark.operators import reduce_events

    df = spark.createDataFrame(
        [
            ("g", 1, "l1", ["a", "b"]),
            ("g", 2, "l2", ["b"]),
            ("g", 3, "l3", ["c", "a", "d"]),
        ],
        "k string, ts long, line string, tags array<string>",
    ).repartition(4)
    out = reduce_events(
        df, ["k"],
        {"line": "concat_newline", "tags": "flat_unique"},
        ts_col="ts",
    ).collect()[0]
    assert out.line == "l1\nl2\nl3"
    assert out.tags == ["a", "b", "c", "d"]  # first-occurrence in event-time order

    arrs = reduce_events(
        df.withColumnRenamed("tags", "t"),
        ["k"],
        {"t": "shortest_array"},
        ts_col="ts",
    ).collect()[0]
    assert arrs.t == ["b"]
    arrs = reduce_events(
        df.withColumnRenamed("tags", "t"),
        ["k"],
        {"t": "longest_array"},
        ts_col="ts",
    ).collect()[0]
    assert arrs.t == ["c", "a", "d"]


def test_reduce_order_sensitive_requires_ts(spark):
    """first/last/concat/... without ts_col must raise, not silently return
    partition-order-dependent output (the r3 verdict's determinism defect)."""
    import pytest
    from vector_spark.operators import reduce_events

    df = spark.createDataFrame([(1, "a", "x")], "id long, k string, v string")
    for how in ("first", "last", "discard", "retain", "concat", "array", "flat_unique"):
        with pytest.raises(ValueError, match="order-sensitive"):
            reduce_events(df, ["k"], {"v": how})


def test_reduce_first_last_partition_invariant(spark):
    """first/last/discard/retain/concat are identical under repartition(1)
    vs repartition(64) of shuffled input — the property the old
    F.first/F.last/collect_list implementation could not guarantee."""
    import random

    from vector_spark.operators import reduce_events

    rows = [(i % 7, i, i % 13, f"v{i}") for i in range(500)]
    # null values interleaved: first skips them, discard keeps them
    rows += [(k, 1000 + k, 0, None) for k in range(7)]
    random.Random(4).shuffle(rows)
    df = spark.createDataFrame(rows, "k long, eid long, ts long, v string")

    def run(nparts):
        out = reduce_events(
            df.repartition(nparts),
            ["k"],
            {"v": "first"},
            ts_col="ts",
            tiebreaker="eid",
        ).collect()
        return sorted((r.k, r.v, r.events_merged) for r in out)

    assert run(1) == run(64)

    for how in ("last", "discard", "retain", "concat"):
        a = reduce_events(
            df.repartition(1), ["k"], {"v": how}, ts_col="ts", tiebreaker="eid"
        ).collect()
        b = reduce_events(
            df.repartition(64), ["k"], {"v": how}, ts_col="ts", tiebreaker="eid"
        ).collect()
        assert sorted((r.k, r.v) for r in a) == sorted((r.k, r.v) for r in b), how


def test_metric_sketch_options(spark):
    """The 100 TB variants: summary quantiles via percentile_approx and set
    cardinality via HyperLogLog++ — close to exact on a small input, bounded
    state by construction."""
    from vector_spark.operators import log_to_metric, log_to_metric_summary

    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(1000)], "k int, v double"
    )
    exact = log_to_metric_summary(df, "s", "v", tags=["k"]).collect()
    sk = log_to_metric_summary(df, "s", "v", tags=["k"], sketch=True, accuracy=10000).collect()
    e = {r.k: (r.q5, r.q9) for r in exact}
    s = {r.k: (r.q5, r.q9) for r in sk}
    for k in e:
        assert abs(e[k][0] - s[k][0]) <= 3.5 and abs(e[k][1] - s[k][1]) <= 3.5

    sets = log_to_metric(
        df, "uniq", "v", metric_type="set", tags=["k"], approx_set=True
    ).collect()
    for r in sets:
        assert abs(r.value - 334) / 334 < 0.15  # rsd=0.05, generous bound


def test_gauge_metric_deterministic(spark):
    """gauge = value at max (ts, value); partition-invariant and null-skipping."""
    import pytest

    from vector_spark.operators import log_to_metric

    rows = [("cpu", i, float(i % 10)) for i in range(100)] + [("cpu", 200, None)]
    df = spark.createDataFrame(rows, "host string, ts long, reading double")
    for nparts in (1, 32):
        m = log_to_metric(
            df.repartition(nparts), "cpu_gauge", "reading",
            metric_type="gauge", tags=["host"], ts_col="ts",
        ).collect()
        # null at ts=200 is skipped; latest non-null is ts=99 → 9.0
        assert [r.value for r in m] == [9.0]
        assert m[0].kind == "absolute"
    with pytest.raises(ValueError, match="ts_col"):
        log_to_metric(df, "g", "reading", metric_type="gauge")
