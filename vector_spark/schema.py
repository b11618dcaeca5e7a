"""Canonical schemas for the engine.

The reference models events as schemaless JSON maps
(shared/src/messages.rs:126-141 LogEvent; :145-183 MetricEvent).  We fix the
primary table to the typed Common-Crawl-style document schema and keep a
MapType overflow column for grok captures that don't warrant promotion — a
typed column beats a map at parquet-scan time (column pruning + stats).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The primary input table: Common-Crawl-style web pages.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Parse-derived columns added by the remap/parse stage.
PARSED_EXTRA_FIELDS = [
    T.StructField("host", T.StringType(), True),
    T.StructField("path", T.StringType(), True),
    T.StructField("status", T.IntegerType(), True),
    T.StructField("extracted_text", T.StringType(), True),
    T.StructField("fields", T.MapType(T.StringType(), T.StringType()), True),
]

# Log-event schema for the functional-test harness (mirrors the sample-event
# shape in the reference's Layer-4 tester: functional_test.rs:26-37 and the UI
# generator fields ui/src/components/pipeline/view.rs:786-792).
LOG_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("level", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("service", T.StringType(), True),
        T.StructField("pid", T.LongType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)

# Metric-event schema (shared/src/messages.rs:145-183: MetricEvent
# {name, namespace, kind, value, tags, timestamp}).
METRIC_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("namespace", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),  # incremental | absolute
        T.StructField("value", T.DoubleType(), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)

# Enrichment tables (reference: `enrichment_tables` top-level config key,
# vectorize-cli/src/validation/mod.rs:184; GeoIP-style lookup semantics).
HOST_GEO_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("country", T.StringType(), True),
        T.StructField("asn", T.IntegerType(), True),
        T.StructField("tld_class", T.StringType(), True),
    ]
)

LANG_DICT_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType(), False),
        T.StructField("lang_name", T.StringType(), True),
        T.StructField("family", T.StringType(), True),
    ]
)

# Per-stage metrics rows (≙ NodeMetrics {events_in, events_out, bytes_in,
# bytes_out, errors}, shared/src/config.rs:278-293).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("events_in", T.LongType(), True),
        T.StructField("events_out", T.LongType(), True),
        T.StructField("bytes_in", T.LongType(), True),
        T.StructField("bytes_out", T.LongType(), True),
        T.StructField("errors", T.LongType(), True),
    ]
)

# Checkpoint/lineage rows: which (sink, partition) commits have landed, so a
# killed run resumes without reprocessing (analog of Vector's
# acknowledgement/buffer semantics).
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("sink", T.StringType(), False),
        T.StructField("part_key", T.StringType(), False),
        T.StructField("rows_written", T.LongType(), True),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)
