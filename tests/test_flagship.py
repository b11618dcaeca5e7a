"""Flagship end-to-end: routed-row equality, per-sink aggregate counts,
metrics, and determinism across parallelism (the north-rule checks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark import synth
from vector_spark.plans import flagship


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("flagship"))
    docs = synth.documents(spark, 3000)
    res = flagship.run(spark, docs, out)
    return res, out


def test_routed_row_equality(result, spark):
    res, out = result
    assert res["docs"] == 3000
    assert sum(res["route_counts"].values()) == 3000
    routed = spark.read.parquet(f"{out}/routed")
    assert routed.count() == 3000
    # every row has exactly one route; routes only from the known set
    assert set(res["route_counts"]) <= {"english", "european", "cjk", "_unmatched"}


def test_per_sink_aggregate_counts(result, spark):
    """agg table recomputation equals a fresh independent recompute — the
    per-sink aggregate-count equality check."""
    res, out = result
    agg = spark.read.parquet(f"{out}/agg")
    routed = spark.read.parquet(f"{out}/routed")
    recomputed = (
        routed.groupBy("route", "lang", "host", F.date_trunc("hour", "warc_ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("event_count"), F.sum("content_bytes").alias("byte_total"))
    )
    a = {tuple(r) for r in agg.select("route", "lang", "host", "bucket", "event_count", "byte_total").collect()}
    b = {tuple(r) for r in recomputed.select("route", "lang", "host", "bucket", "event_count", "byte_total").collect()}
    assert a == b
    assert sum(r[4] for r in a) == 3000


def test_route_predicates_correct(result, spark):
    res, out = result
    routed = spark.read.parquet(f"{out}/routed")
    assert routed.filter((F.col("route") == "english") & (F.col("lang") != "en")).count() == 0
    assert routed.filter((F.col("route") == "cjk") & (F.col("family") != "sinitic")).count() == 0
    # first-match-wins: an 'en' row never lands in 'european' even though
    # germanic would match it
    assert routed.filter((F.col("route") == "european") & (F.col("lang") == "en")).count() == 0


def test_metrics_collected(result):
    res, _ = result
    stages = {m["stage"]: m for m in res["metrics"]}
    assert stages["parse"]["events_out"] == 3000
    assert stages["route"]["events_out"] == 3000
    assert stages["parse"]["bytes_out"] > 0


def test_determinism_across_parallelism(spark, tmp_path_factory):
    """N vs 4N: identical routed rows and aggregates at 2 vs 16 partitions."""
    outs = []
    for parts in (2, 16):
        docs = synth.documents(spark, 800, partitions=parts)
        plan = flagship.build(spark, docs)
        rows = {(r.url, r.route, r.extracted_text) for r in
                plan["routed"].select("url", "route", "extracted_text").collect()}
        aggs = {tuple(r) for r in plan["agg"].collect()}
        outs.append((rows, aggs))
    assert outs[0] == outs[1]


def test_flagship_publishes_atomic_snapshot(result, spark):
    """flagship.run commits ONE table-format snapshot covering both sinks —
    the routed and agg tables become visible together or not at all."""
    from vector_spark.plans.table_format import CommitLog

    res, out = result
    log = CommitLog(out)
    assert log.current_version() >= 1
    snap = log.snapshots()[-1]
    assert set(snap["sinks"]) == {"routed", "agg"}
    assert sum(snap["sinks"]["routed"]["parts"].values()) == res["docs"]
    # each sink's parts record ITS OWN cardinality: the agg table has one row
    # per (route,lang,host,hour) group, far fewer than routed events
    agg_actual = {
        r["route"]: r["n"]
        for r in spark.read.parquet(f"{out}/agg").groupBy("route").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert {k: int(v) for k, v in snap["sinks"]["agg"]["parts"].items()} == {
        k: int(v) for k, v in agg_actual.items()
    }
    assert sum(agg_actual.values()) < res["docs"]


def test_contract_row_extraction_byte_identical(spark):
    """The driver contract pipeline (flagship_routed) must satisfy the
    per-row invariant: extracted_text per url is byte-identical to the
    reference extractor applied to the same html bytes."""
    import __spark_entry__ as entrymod
    from vector_spark.extract import extract_text_bytes

    sf_dir = "/root/testdata/sf0.001"
    pages = {r["url"]: bytes(r["html"])
             for r in entrymod._webpages(spark, sf_dir).collect()}
    routed = entrymod.q_flagship_routed(spark, sf_dir).collect()
    assert len(routed) == len(pages) > 0
    for r in routed:
        expected = extract_text_bytes(pages[r["url"]])
        assert r["extracted_text"].encode() == expected, r["url"]
        assert r["content_bytes"] == len(expected)
