"""Metadata-only COUNT(*) — the Iceberg aggregate-pushdown analog.

Every test pins BOTH halves of the contract: the count equals a real
``read_table(...).where(pred).count()`` (exactness), and the ``audit`` dict
proves HOW it was answered (zero files opened on the metadata paths — the
property that matters at 100 TB, where a dashboard count must be an
O(manifest) fold, not a table scan)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vector_spark import synth
from vector_spark.plans import checkpoint as CP
from vector_spark.plans import table_format as TF


def _docs(spark, n=600):
    return synth.documents(spark, n).drop("html")


def _true_count(spark, base, sink, cond):
    df = TF.read_table(spark, base, sink)
    return df.where(cond).count()


def test_no_predicate_is_pure_metadata(spark, tmp_path):
    docs = CP.with_part_key(_docs(spark), n_parts=4, key_cols=["url"])
    base = str(tmp_path / "t")
    TF.write_multi_sink({"logs": docs.repartition(8)}, base, run_id="r1")

    audit = {}
    n = TF.count_rows(spark, base, "logs", audit=audit)
    assert n == TF.read_table(spark, base, "logs").count() == 600
    assert audit["meta_rows"] == 600
    assert audit["scanned_files"] == 0 and audit["scanned_dirs"] == 0
    assert not audit["fallback"]


def test_both_bounds_none_is_refused(spark, tmp_path):
    docs = CP.with_part_key(_docs(spark, 50), n_parts=2)
    base = str(tmp_path / "t")
    TF.write_multi_sink({"logs": docs}, base, run_id="r1")
    with pytest.raises(ValueError, match="at least one bound"):
        TF.count_rows(spark, base, "logs", prune=("lang", None, None))


def test_hidden_partition_hour_window_counts_from_manifest(spark, tmp_path):
    """An hour-aligned window over an hour(warc_ts) spec is decided entirely
    by partition tokens: zero data files opened."""
    base = str(tmp_path / "t")
    # spread warc_ts deterministically over ~6 hours so several hour
    # partitions exist (the raw fixture clusters inside one hour)
    docs = _docs(spark).withColumn(
        "warc_ts",
        F.expr(
            "warc_ts + make_interval(0, 0, 0, 0, 0, cast(pmod(xxhash64(url), 360) as int), 0)"
        ),
    )
    TF.write_multi_sink({"logs": docs}, base, run_id="r1", spec=[("hour", "warc_ts")])
    hours = (
        TF.read_table(spark, base, "logs")
        .select(F.date_trunc("hour", "warc_ts").alias("h"))
        .groupBy("h").count().orderBy(F.desc("count")).collect()
    )
    assert len(hours) > 2, "fixture must span several hour partitions"
    lo = hours[0]["h"]  # the densest hour — guaranteed non-empty
    hi = lo + dt.timedelta(hours=2) - dt.timedelta(microseconds=1)

    audit = {}
    n = TF.count_rows(spark, base, "logs", prune=("warc_ts", lo, hi), audit=audit)
    assert n == _true_count(
        spark, base, "logs", (F.col("warc_ts") >= F.lit(lo)) & (F.col("warc_ts") <= F.lit(hi))
    )
    assert n > 0, "window must cover rows for the test to mean anything"
    assert audit["scanned_files"] == 0 and audit["scanned_dirs"] == 0
    assert audit["meta_parts"] >= 1 and audit["pruned_parts"] >= 1

    # a misaligned window (half-hour start) makes the edge partition a
    # boundary: it is SCANNED, the interior hours still come from metadata,
    # and the total stays exact
    lo2 = lo + dt.timedelta(minutes=30)
    audit2 = {}
    n2 = TF.count_rows(spark, base, "logs", prune=("warc_ts", lo2, hi), audit=audit2)
    assert n2 == _true_count(
        spark, base, "logs",
        (F.col("warc_ts") >= F.lit(lo2)) & (F.col("warc_ts") <= F.lit(hi)),
    )
    assert audit2["scanned_dirs"] + audit2["scanned_files"] >= 1
    assert audit2["meta_parts"] >= 1


def test_identity_partition_equality_is_metadata_only(spark, tmp_path):
    base = str(tmp_path / "t")
    TF.write_multi_sink(
        {"logs": _docs(spark)}, base, run_id="r1", spec=[("identity", "lang")]
    )
    langs = [
        r["lang"]
        for r in TF.read_table(spark, base, "logs")
        .groupBy("lang").count().orderBy(F.desc("count")).collect()
        if r["lang"] is not None
    ]
    audit = {}
    n = TF.count_rows(spark, base, "logs", prune_eq=("lang", langs[0]), audit=audit)
    assert n == _true_count(spark, base, "logs", F.col("lang") == langs[0])
    assert n > 0
    assert audit["scanned_files"] == 0 and audit["scanned_dirs"] == 0
    assert audit["meta_rows"] == n


def test_file_stats_tier_counts_proven_files_and_scans_boundaries(spark, tmp_path):
    """Flat sink, range-clustered files: a mid-range window is answered from
    per-file ``_rowcount`` stats for interior files, a residual scan for the
    straddlers — never the whole partition."""
    docs = CP.with_part_key(_docs(spark, 800), n_parts=2, key_cols=["url"])
    docs = docs.repartitionByRange(8, "warc_ts")
    base = str(tmp_path / "t")
    TF.write_multi_sink({"logs": docs}, base, run_id="r1")
    TF.collect_file_stats(spark, base, "logs", ["warc_ts"])

    ts = sorted(
        r["warc_ts"]
        for r in TF.read_table(spark, base, "logs").select("warc_ts").collect()
    )
    total_files = sum(
        len(i["files"]) for i in TF.CommitLog(base).manifest()["logs"].values()
    )

    # full range: every file proven from stats, nothing scanned
    audit = {}
    n = TF.count_rows(
        spark, base, "logs", prune=("warc_ts", ts[0], ts[-1]), audit=audit
    )
    assert n == 800
    assert audit["stats_rows"] == 800 and audit["scanned_files"] == 0

    # interior window: exact, and strictly fewer files scanned than exist
    lo, hi = ts[len(ts) // 4], ts[3 * len(ts) // 4]
    audit2 = {}
    n2 = TF.count_rows(spark, base, "logs", prune=("warc_ts", lo, hi), audit=audit2)
    assert n2 == _true_count(
        spark, base, "logs",
        (F.col("warc_ts") >= F.lit(lo)) & (F.col("warc_ts") <= F.lit(hi)),
    )
    assert audit2["scanned_files"] < total_files
    assert audit2["scanned_files"] + audit2["stats_files"] + audit2["pruned_files"] > 0


def test_null_column_never_stats_counted_as_full(spark, tmp_path):
    """min/max ignore NULLs and NULL matches no predicate — a file holding
    NULLs must fall to the scan tier, not be counted whole from stats."""
    docs = CP.with_part_key(_docs(spark, 400), n_parts=1, key_cols=["url"])
    docs = docs.withColumn(
        "lang", F.when(F.xxhash64("url") % 5 == 0, F.lit(None)).otherwise(F.col("lang"))
    ).coalesce(1)
    base = str(tmp_path / "t")
    TF.write_multi_sink({"logs": docs}, base, run_id="r1")
    TF.collect_file_stats(spark, base, "logs", ["lang"])

    mnmx = TF.read_table(spark, base, "logs").agg(
        F.min("lang").alias("mn"), F.max("lang").alias("mx"),
        F.sum(F.col("lang").isNull().cast("long")).alias("nulls"),
    ).collect()[0]
    assert mnmx["nulls"] > 0, "fixture must actually contain NULLs"

    audit = {}
    n = TF.count_rows(
        spark, base, "logs", prune=("lang", mnmx["mn"], mnmx["mx"]), audit=audit
    )
    assert n == 400 - mnmx["nulls"]
    assert audit["stats_rows"] == 0, "a NULL-holding file must not count from stats"
    assert audit["scanned_files"] >= 1


def test_pending_equality_deletes_force_exact_fallback(spark, tmp_path):
    docs = CP.with_part_key(_docs(spark, 300), n_parts=2, key_cols=["url"])
    base = str(tmp_path / "t")
    TF.write_multi_sink({"logs": docs}, base, run_id="r1")
    TF.pin_files(base, "logs")
    victims = TF.read_table(spark, base, "logs").select("url").limit(40)
    TF.delete_keys(spark, base, "logs", victims, key_cols=["url"])

    audit = {}
    n = TF.count_rows(spark, base, "logs", audit=audit)
    assert audit["fallback"], "pending tombstones must disable metadata counts"
    assert n == TF.read_table(spark, base, "logs").count() == 260

    TF.materialize_deletes(spark, base, "logs")
    audit2 = {}
    n2 = TF.count_rows(spark, base, "logs", audit=audit2)
    assert not audit2["fallback"]
    assert n2 == 260 and audit2["meta_rows"] == 260
    assert audit2["scanned_files"] == 0 and audit2["scanned_dirs"] == 0


def test_time_travel_count(spark, tmp_path):
    docs = CP.with_part_key(_docs(spark, 200), n_parts=2, key_cols=["url"])
    base = str(tmp_path / "t")
    TF.write_multi_sink({"logs": docs}, base, run_id="r1")
    v1 = TF.CommitLog(base).current_version()
    more = CP.with_part_key(
        _docs(spark, 500).where(F.length("url") >= 0), n_parts=2, key_cols=["url"]
    ).limit(120)
    TF.pin_files(base, "logs")
    v_pin = TF.CommitLog(base).current_version()
    TF.add_files(spark, base, "logs", more)

    audit = {}
    assert TF.count_rows(spark, base, "logs", version=v_pin, audit=audit) == 200
    assert audit["scanned_files"] == 0 and audit["meta_rows"] == 200
    assert TF.count_rows(spark, base, "logs", version=v1) == 200
    assert TF.count_rows(spark, base, "logs") == 320
