"""Skew handling evidence (SURVEY §7, north_rule "salted repartitioning"):
the generator's Zipfian hosts make one partition ~17x the median under a
plain repartition-by-host; salted repartitioning flattens it while changing
placement only, never content."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from vector_spark import synth
from vector_spark.operators import parse_url, salted_repartition

N = 100_000


def _partition_sizes(df):
    rows = df.withColumn("p", F.spark_partition_id()).groupBy("p").count().collect()
    return sorted(r["count"] for r in rows)


def test_salted_repartition_flattens_hot_hosts(spark):
    docs = parse_url(synth.documents(spark, N), "url")

    plain = _partition_sizes(docs.repartition(32, F.col("host")))
    skew_plain = max(plain) / statistics.median(plain)

    salted = _partition_sizes(salted_repartition(docs, "host", 32, salt=16))
    skew_salted = max(salted) / statistics.median(salted)

    assert skew_plain > 8          # the generator really is skewed
    assert skew_salted < 4         # no task melts after salting
    assert skew_salted < skew_plain / 3
    assert sum(salted) == sum(plain) == N  # placement changed, content didn't


def test_salted_join_matches_broadcast_join(spark):
    """Salting must not change join RESULTS — verify against the broadcast
    reference join on the same keys."""
    from vector_spark.operators import enrich, salted_join

    docs = parse_url(synth.documents(spark, 5_000), "url").select("url", "host")
    dim = synth.host_geo(spark)

    ref = {tuple(r) for r in enrich(docs, dim, on="host").select("url", "country").collect()}
    got = {tuple(r) for r in salted_join(docs, dim, on="host", salt=8).select("url", "country").collect()}
    assert got == ref
