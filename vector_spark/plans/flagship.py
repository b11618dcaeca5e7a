"""The flagship end-to-end job: parse → enrich → route → aggregate.

This is the north-rule pipeline over the Common-Crawl-style documents table
(url, warc_ts, html, text, lang):

  1. parse   — host/path from url (regexp, codegen), byte-identical
               extracted_text from html (the one Arrow pandas UDF),
               content_bytes = octet length of the extracted text
  2. enrich  — broadcast left joins against host_geo (GeoIP-style) and
               lang_dict (reference: enrichment_tables,
               validation/mod.rs:184)
  3. route   — first-match predicate fan-out on the enriched stream
               (reference route semantics, config_panel.rs:1643-1667)
  4. sink    — ONE routed write partitioned by route (single scan) plus
               per-sink aggregates: event counts + byte totals per
               (lang, host, hourly warc_ts bucket)

Scale shape: the only shuffle in the whole job is the aggregate's
(route, lang, host, bucket) hash-agg — parse and enrich are shuffle-free
(map-side + broadcast), and the routed write needs no repartition because
parquet partitionBy splits files per route within each task.  Host skew
(Zipfian hosts) hits only the aggregate, where partial map-side combine
collapses hot hosts before the shuffle; AQE skew handling stays on as the
backstop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark import synth
from vector_spark.operators import enrich, extract_text, parse_url, sink_aggregate, tag_routes
from vector_spark.plans.metrics import MetricsCollector
from vector_spark.plans.sinks import write_routed

# Route table (first-match-wins, declaration order).  Predicates reference
# enriched columns; kept as Column-compiling strings so they stay JVM-side.
FLAGSHIP_ROUTES = {
    "english": '.lang == "en"',
    "european": '.family == "germanic" || .family == "romance" || .family == "slavic"',
    "cjk": '.family == "sinitic"',
}


def parse_stage(docs: DataFrame, extract_jvm: bool | None = None) -> DataFrame:
    docs = parse_url(docs, "url")
    if extract_jvm is None:
        # Two byte-identical extraction paths (see operators/remap.py): the
        # Arrow UDF's Python workers OVERLAP the JVM task cores (a win when
        # executors use a slice of the machine — the production shape), while
        # the pure-codegen chain wins when task slots already saturate the
        # machine and extra Python processes would only contend (local[32]).
        # Pick by that ratio, exactly as a tuned job config would.
        sc = docs.sparkSession.sparkContext
        extract_jvm = sc.defaultParallelism >= 0.75 * (os.cpu_count() or 8)
    docs = extract_text(docs, "html", "extracted_text", use_jvm=extract_jvm)
    return docs.withColumn("content_bytes", F.octet_length("extracted_text"))


def enrich_stage(docs: DataFrame, spark: SparkSession) -> DataFrame:
    docs = enrich(docs, synth.host_geo(spark), on="host", how="left")
    return enrich(docs, synth.lang_dict(spark), on="lang", how="left")


def route_stage(docs: DataFrame) -> DataFrame:
    return tag_routes(docs, FLAGSHIP_ROUTES)


def build(spark: SparkSession, docs: DataFrame, metrics: MetricsCollector | None = None) -> dict[str, DataFrame]:
    """Compile the full lazy plan. Returns {'routed': tagged rows,
    'agg': per-(route,lang,host,hour) aggregate}."""
    parsed = parse_stage(docs)
    if metrics:
        parsed = metrics.instrument(parsed, "parse", bytes_col="extracted_text")
    enriched = enrich_stage(parsed, spark)
    routed = route_stage(enriched)
    if metrics:
        routed = metrics.instrument(routed, "route")
    agg = (
        routed.groupBy(
            "route",
            "lang",
            "host",
            F.date_trunc("hour", "warc_ts").alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum("content_bytes").alias("byte_total"),
        )
    )
    return {"routed": routed, "agg": agg}


def run(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    collect_metrics: bool = True,
) -> dict:
    """Execute end-to-end: routed write (single scan, partitioned by route),
    then aggregates FROM the routed sink table. Returns summary counts.

    Exactly one pass over the raw documents (the expensive pass: html
    extraction UDF + enrich + route), written once.  The per-sink aggregate
    then reads the routed PARQUET back — a column-pruned scan of four small
    columns, no persist/cache of the wide stream, no second UDF pass.
    (``persist()`` of the wide routed stream measured 2x slower at 32
    threads: MemoryStore churn + page-fault pressure; the sink-table re-read
    is also what a real warehouse does — aggregates live downstream of the
    routed tables.)  Route counts fall out of the aggregate for free.
    """
    metrics = MetricsCollector() if collect_metrics else None
    plan = build(spark, docs, metrics)

    write_routed(plan["routed"], f"{out_dir}/routed", drop_binary=["html"])

    routed_tbl = spark.read.parquet(f"{out_dir}/routed")
    agg = (
        routed_tbl.groupBy(
            "route", "lang", "host", F.date_trunc("hour", "warc_ts").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum("content_bytes").alias("byte_total"),
        )
    )
    agg.write.mode("overwrite").partitionBy("route").parquet(f"{out_dir}/agg")

    agg_tbl = spark.read.parquet(f"{out_dir}/agg")
    # One tiny job yields both ledgers: routed-sink row counts (sum of
    # event_count) and the agg sink's OWN per-route row counts — the commit
    # log below must record each sink's real cardinality, not reuse the
    # routed counts for both.
    per_route = agg_tbl.groupBy("route").agg(
        F.sum("event_count").alias("n"), F.count(F.lit(1)).alias("agg_rows")
    ).collect()
    route_counts = {r["route"]: r["n"] for r in per_route}
    agg_counts = {r["route"]: r["agg_rows"] for r in per_route}

    # Publish ONE atomic snapshot covering BOTH sinks (table_format commit
    # log — the Iceberg-analog metadata swap).  Both data writes above are
    # restartable/idempotent; visibility flips here, all-or-nothing, so a
    # crash anywhere before this line leaves no torn multi-sink state.  Cost:
    # one small json write + rename — the same commit profile Iceberg has —
    # reusing the route counts the job already computed (no extra Spark job).
    if out_dir.startswith("/") or out_dir.startswith("file:"):
        from vector_spark.plans.table_format import CommitLog

        # strip the scheme: os.path on "file:/tmp/out" would treat it as a
        # RELATIVE path and drop the log in $CWD/file:/... where no reader
        # looks
        local_dir = out_dir.removeprefix("file:")
        CommitLog(local_dir).commit(
            {
                "operation": "flagship_run",
                "sinks": {
                    "routed": {"parts": {r: int(n) for r, n in route_counts.items()}},
                    "agg": {"parts": {r: int(n) for r, n in agg_counts.items()}},
                },
            }
        )

    result = {
        "docs": sum(route_counts.values()),
        "route_counts": route_counts,
        "out_dir": out_dir,
    }
    if metrics:
        result["metrics"] = metrics.harvest()
    return result
