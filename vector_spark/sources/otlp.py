"""`opentelemetry` source — OTLP/JSON log decoding.

Reference: the `opentelemetry` source (config_panel.rs:1290-1415 palette row).
The wire format is the public OpenTelemetry protocol's JSON mapping of
`LogsData` (opentelemetry-proto logs.proto + the proto3 JSON mapping:
int64s as decimal strings, bytes as base64/hex strings): a resourceLogs →
scopeLogs → logRecords nesting where every attribute value is an `AnyValue`
oneof.

Spark mapping: one `from_json` with the LogsData schema, then two
`explode`s — all JVM-side, whole-stage-codegen friendly, no Python UDF.
One input row (one OTLP export request body) becomes one output row per
log record, flattened to the repo's log-event shape with the resource and
record attributes as string maps (AnyValue scalars stringified; nested
array/kvlist values are out of scope and yield NULL entries rather than
silently wrong ones).

The transport (HTTP POST bodies) rides the existing http_server /
socket sources; this module is the decode stage, mirroring how
statsd_source = socket_source ∘ statsd_parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: AnyValue scalar arms (proto3 JSON: intValue is a decimal STRING).
_ANY = "struct<stringValue:string,boolValue:boolean,intValue:string,doubleValue:double,bytesValue:string>"
_KV = f"array<struct<key:string,value:{_ANY}>>"
_LOG_RECORD = (
    "struct<timeUnixNano:string,observedTimeUnixNano:string,"
    "severityNumber:int,severityText:string,"
    f"body:{_ANY},attributes:{_KV},traceId:string,spanId:string>"
)
OTLP_LOGS_SCHEMA = (
    "struct<resourceLogs:array<struct<"
    f"resource:struct<attributes:{_KV}>,"
    "scopeLogs:array<struct<scope:struct<name:string,version:string>,"
    f"logRecords:array<{_LOG_RECORD}>>>"
    ">>>"
)


def _any_to_string(v) -> F.Column:
    """AnyValue → string: first non-null scalar arm, proto3-JSON faithful
    (booleans render true/false; intValue is already a string)."""
    return F.coalesce(
        v.getField("stringValue"),
        v.getField("intValue"),
        F.when(v.getField("boolValue").isNotNull(), v.getField("boolValue").cast("string")),
        v.getField("doubleValue").cast("string"),
        v.getField("bytesValue"),
    )


def _attr_entries(attrs) -> F.Column:
    """KeyValue list → (key, stringified value) struct array.  Kept
    separate from :func:`_entries_to_map_last` so callers can materialize
    the entries as a REAL column between the two: the dedup filter's
    lambda closes over the entries expression, and a HOF lambda re-runs a
    closed-over tree once per ELEMENT — fine for an attribute reference,
    O(n²) stringify work for this transform."""
    return F.transform(
        attrs,
        lambda kv: F.struct(
            kv.getField("key").alias("key"),
            _any_to_string(kv.getField("value")).alias("value"),
        ),
    )


def _entries_to_map_last(ents) -> F.Column:
    # OTLP allows a repeated attribute key on the wire (buggy exporters do
    # emit them); map_from_entries under the default
    # spark.sql.mapKeyDedupPolicy=EXCEPTION would fail the whole task on
    # one such record.  Keep the LAST occurrence (proto3 merge semantics)
    # with an in-row filter — attribute lists are tiny, the O(n²) exists
    # is per-row and allocation-free.  ``ents`` should be a materialized
    # column (see _attr_entries).
    deduped = F.filter(
        ents,
        lambda e, i: ~F.exists(
            F.slice(ents, i + 2, F.greatest(F.size(ents) - i - 1, F.lit(0))),
            lambda e2: e2.getField("key") == e.getField("key"),
        ),
    )
    return F.map_from_entries(deduped)


def _nanos_to_ts(nanos) -> F.Column:
    # proto3 JSON int64 = decimal string; epoch nanos ≈ 1.7e18 exceed
    # double's 2^53 integer range, so the divide-to-micros goes through
    # decimal (exact), never long/long → double division.
    return F.timestamp_micros(
        F.floor(nanos.try_cast("decimal(20,0)") / 1000).cast("long")
    )


def otlp_logs_parse(df: DataFrame, message_col: str = "message") -> DataFrame:
    """OTLP/JSON `LogsData` bodies → one flattened row per log record.

    Output: timestamp, observed_timestamp, severity_number, severity_text,
    body (stringified AnyValue), attributes + resource (map<string,string>),
    scope_name, trace_id, span_id — plus the input's other columns.
    Malformed JSON yields zero records for that input row (from_json → NULL,
    explode of NULL drops it); route raw bodies through a filter on
    ``from_json IS NULL`` first if a dead-letter output is needed."""
    keep = [c for c in df.columns if c != message_col]
    parsed = df.select(*keep, F.from_json(F.col(message_col), OTLP_LOGS_SCHEMA).alias("_ld"))
    rl = parsed.select(*keep, F.explode("_ld.resourceLogs").alias("_rl"))
    sl = rl.select(
        *keep,
        # materialize the entries, THEN dedup: the dedup lambda closes over
        # its input and a lambda re-runs closed-over trees per element
        _attr_entries(F.col("_rl.resource.attributes")).alias("_res_ents"),
        F.explode("_rl.scopeLogs").alias("_sl"),
    ).select(
        *keep,
        _entries_to_map_last(F.col("_res_ents")).alias("resource"),
        "_sl",
    )
    rec = sl.select(
        *keep,
        "resource",
        F.col("_sl.scope.name").alias("scope_name"),
        F.explode("_sl.logRecords").alias("_r"),
    ).withColumn("_rec_ents", _attr_entries(F.col("_r.attributes")))
    return rec.select(
        *keep,
        _nanos_to_ts(F.col("_r.timeUnixNano")).alias("timestamp"),
        _nanos_to_ts(F.col("_r.observedTimeUnixNano")).alias("observed_timestamp"),
        F.col("_r.severityNumber").alias("severity_number"),
        F.col("_r.severityText").alias("severity_text"),
        _any_to_string(F.col("_r.body")).alias("body"),
        _entries_to_map_last(F.col("_rec_ents")).alias("attributes"),
        "resource",
        "scope_name",
        F.col("_r.traceId").alias("trace_id"),
        F.col("_r.spanId").alias("span_id"),
    )
