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


# ---------------------------------------------------------------------------
# TracesData — the second OTLP signal (opentelemetry-proto trace.proto, same
# proto3 JSON mapping).  Reference: the `opentelemetry` source palette row
# covers all three signals; Vector's `is_trace` filter condition
# (config_panel.rs:1461-1467) is what consumes these rows downstream.
# ---------------------------------------------------------------------------

_SPAN = (
    "struct<traceId:string,spanId:string,parentSpanId:string,name:string,"
    "kind:int,startTimeUnixNano:string,endTimeUnixNano:string,"
    f"attributes:{_KV},"
    "status:struct<code:int,message:string>,"
    f"events:array<struct<timeUnixNano:string,name:string,attributes:{_KV}>>>"
)
OTLP_TRACES_SCHEMA = (
    "struct<resourceSpans:array<struct<"
    f"resource:struct<attributes:{_KV}>,"
    "scopeSpans:array<struct<scope:struct<name:string,version:string>,"
    f"spans:array<{_SPAN}>>>"
    ">>>"
)


def otlp_traces_parse(df: DataFrame, message_col: str = "message") -> DataFrame:
    """OTLP/JSON ``TracesData`` bodies → one flattened row per span.

    Output: trace_id, span_id, parent_span_id (NULL for root spans — proto3
    renders an absent parent as empty string), name, kind (the proto enum
    int: 1=INTERNAL … 5=CONSUMER), start/end timestamps, duration_us
    (decimal-exact from the nano strings, same as :func:`_nanos_to_ts`),
    status_code/status_message, n_events (span events counted, not
    exploded — explode them separately if event-level rows are needed),
    attributes + resource maps, scope_name, plus the input's other columns.
    Same plan shape as :func:`otlp_logs_parse`: one ``from_json`` + three
    explodes, all JVM-side."""
    keep = [c for c in df.columns if c != message_col]
    parsed = df.select(
        *keep, F.from_json(F.col(message_col), OTLP_TRACES_SCHEMA).alias("_td")
    )
    rs = parsed.select(*keep, F.explode("_td.resourceSpans").alias("_rs"))
    ss = rs.select(
        *keep,
        _attr_entries(F.col("_rs.resource.attributes")).alias("_res_ents"),
        F.explode("_rs.scopeSpans").alias("_ss"),
    ).select(
        *keep,
        _entries_to_map_last(F.col("_res_ents")).alias("resource"),
        "_ss",
    )
    sp = ss.select(
        *keep,
        "resource",
        F.col("_ss.scope.name").alias("scope_name"),
        F.explode("_ss.spans").alias("_s"),
    ).withColumn("_sp_ents", _attr_entries(F.col("_s.attributes")))
    start_ns = F.col("_s.startTimeUnixNano").try_cast("decimal(20,0)")
    end_ns = F.col("_s.endTimeUnixNano").try_cast("decimal(20,0)")
    return sp.select(
        *keep,
        F.col("_s.traceId").alias("trace_id"),
        F.col("_s.spanId").alias("span_id"),
        F.nullif(F.col("_s.parentSpanId"), F.lit("")).alias("parent_span_id"),
        F.col("_s.name").alias("name"),
        F.col("_s.kind").alias("kind"),
        _nanos_to_ts(F.col("_s.startTimeUnixNano")).alias("start_timestamp"),
        _nanos_to_ts(F.col("_s.endTimeUnixNano")).alias("end_timestamp"),
        F.floor((end_ns - start_ns) / 1000).cast("long").alias("duration_us"),
        F.col("_s.status.code").alias("status_code"),
        F.col("_s.status.message").alias("status_message"),
        F.coalesce(F.size("_s.events"), F.lit(0)).alias("n_events"),
        _entries_to_map_last(F.col("_sp_ents")).alias("attributes"),
        "resource",
        "scope_name",
    )


# ---------------------------------------------------------------------------
# MetricsData — the third OTLP signal (metrics.proto).  Gauge / Sum /
# Histogram points are normalized into ONE row shape so downstream
# log_to_metric / aggregate operators consume them uniformly (the
# metrics-shaped DataFrame of operators/metrics_conv.py).
# ---------------------------------------------------------------------------

_NUM_DP = (
    f"struct<attributes:{_KV},startTimeUnixNano:string,timeUnixNano:string,"
    "asDouble:double,asInt:string>"
)
_HIST_DP = (
    f"struct<attributes:{_KV},startTimeUnixNano:string,timeUnixNano:string,"
    "count:string,sum:double,bucketCounts:array<string>,"
    "explicitBounds:array<double>>"
)
_SUMM_DP = (
    f"struct<attributes:{_KV},startTimeUnixNano:string,timeUnixNano:string,"
    "count:string,sum:double,"
    "quantileValues:array<struct<quantile:double,value:double>>>"
)
_EXPH_BUCKETS = "struct<offset:int,bucketCounts:array<string>>"
_EXPH_DP = (
    f"struct<attributes:{_KV},startTimeUnixNano:string,timeUnixNano:string,"
    "count:string,sum:double,scale:int,zeroCount:string,"
    f"positive:{_EXPH_BUCKETS},negative:{_EXPH_BUCKETS}>"
)
OTLP_METRICS_SCHEMA = (
    "struct<resourceMetrics:array<struct<"
    f"resource:struct<attributes:{_KV}>,"
    "scopeMetrics:array<struct<scope:struct<name:string,version:string>,"
    "metrics:array<struct<name:string,description:string,unit:string,"
    f"gauge:struct<dataPoints:array<{_NUM_DP}>>,"
    f"sum:struct<dataPoints:array<{_NUM_DP}>,aggregationTemporality:int,"
    "isMonotonic:boolean>,"
    f"histogram:struct<dataPoints:array<{_HIST_DP}>,aggregationTemporality:int>,"
    f"exponentialHistogram:struct<dataPoints:array<{_EXPH_DP}>,"
    "aggregationTemporality:int>,"
    f"summary:struct<dataPoints:array<{_SUMM_DP}>>"
    ">>>>"
    ">>>"
)

#: the normalized per-point struct all five metric kinds map onto before
#: the single explode (field order must match across the five transforms)
_POINT = (
    f"struct<mtype:string,attrs:{_KV},ts:string,start:string,vd:double,"
    "vi:string,cnt:string,msum:double,bkts:array<string>,"
    "bnds:array<double>,temporality:int,monotonic:boolean,"
    "qs:array<struct<quantile:double,value:double>>,"
    "scale:int,zero_cnt:string,pos_off:int,pos_bkts:array<string>,"
    "neg_off:int,neg_bkts:array<string>>"
)


def otlp_metrics_parse(df: DataFrame, message_col: str = "message") -> DataFrame:
    """OTLP/JSON ``MetricsData`` bodies → one flattened row per DATA POINT,
    normalized across all FIVE point kinds of metrics.proto:

      * gauge     — ``value`` from asDouble/asInt, histogram fields NULL;
      * sum       — same, plus temporality + is_monotonic;
      * histogram — ``count``/``sum``/``bucket_counts``/``explicit_bounds``,
        ``value`` NULL, temporality carried;
      * exponential histogram — ``scale``/``zero_count`` plus
        positive/negative ``(offset, bucket_counts)`` (base-2 buckets:
        bucket i covers ``(b^(offset+i), b^(offset+i+1)]`` with
        ``b = 2^(2^-scale)``) — feed
        :func:`vector_spark.operators.metric_rate.exp_histogram_quantile`;
      * summary   — ``count``/``sum`` plus the pre-computed ``quantiles``
        (quantile, value) structs.

    One ``from_json``, the five per-metric point arrays mapped onto one
    common struct and concatenated IN-ROW (``F.transform`` + ``F.concat``),
    then a single explode — no per-kind scans, no union of five plans,
    no Python."""
    m = F.col("_m")

    # every point kind maps onto the SAME struct shape (field order fixed
    # by _FIELDS); unset fields are typed NULLs so F.concat type-checks
    _FIELDS = [
        ("mtype", "string"), ("attrs", _KV), ("ts", "string"),
        ("start", "string"), ("vd", "double"), ("vi", "string"),
        ("cnt", "string"), ("msum", "double"), ("bkts", "array<string>"),
        ("bnds", "array<double>"), ("temporality", "int"),
        ("monotonic", "boolean"),
        ("qs", "array<struct<quantile:double,value:double>>"),
        ("scale", "int"), ("zero_cnt", "string"), ("pos_off", "int"),
        ("pos_bkts", "array<string>"), ("neg_off", "int"),
        ("neg_bkts", "array<string>"),
    ]

    def _point(dp, mtype, **given):
        cols = [F.lit(mtype).alias("mtype"),
                dp.getField("attributes").alias("attrs"),
                dp.getField("timeUnixNano").alias("ts"),
                dp.getField("startTimeUnixNano").alias("start")]
        for name, typ in _FIELDS[4:]:
            c = given.get(name, F.lit(None).cast(typ))
            cols.append(c.alias(name))
        return F.struct(*cols)

    def _kind(arr, dp_type, mtype, point_kw):
        return F.transform(
            F.coalesce(arr, F.array().cast(f"array<{dp_type}>")),
            lambda dp: _point(dp, mtype, **point_kw(dp)),
        )

    num_kw = lambda dp: {"vd": dp.getField("asDouble"), "vi": dp.getField("asInt")}  # noqa: E731
    gauge_points = _kind(
        m.getField("gauge").getField("dataPoints"), _NUM_DP, "gauge", num_kw
    )
    sum_points = _kind(
        m.getField("sum").getField("dataPoints"), _NUM_DP, "sum",
        lambda dp: {
            **num_kw(dp),
            "temporality": m.getField("sum").getField("aggregationTemporality"),
            "monotonic": m.getField("sum").getField("isMonotonic"),
        },
    )
    hist_points = _kind(
        m.getField("histogram").getField("dataPoints"), _HIST_DP, "histogram",
        lambda dp: {
            "cnt": dp.getField("count"),
            "msum": dp.getField("sum"),
            "bkts": dp.getField("bucketCounts"),
            "bnds": dp.getField("explicitBounds"),
            "temporality": m.getField("histogram").getField("aggregationTemporality"),
        },
    )
    exph = m.getField("exponentialHistogram")
    exph_points = _kind(
        exph.getField("dataPoints"), _EXPH_DP, "exp_histogram",
        lambda dp: {
            "cnt": dp.getField("count"),
            "msum": dp.getField("sum"),
            "temporality": exph.getField("aggregationTemporality"),
            "scale": dp.getField("scale"),
            "zero_cnt": dp.getField("zeroCount"),
            "pos_off": dp.getField("positive").getField("offset"),
            "pos_bkts": dp.getField("positive").getField("bucketCounts"),
            "neg_off": dp.getField("negative").getField("offset"),
            "neg_bkts": dp.getField("negative").getField("bucketCounts"),
        },
    )
    summ_points = _kind(
        m.getField("summary").getField("dataPoints"), _SUMM_DP, "summary",
        lambda dp: {
            "cnt": dp.getField("count"),
            "msum": dp.getField("sum"),
            "qs": dp.getField("quantileValues"),
        },
    )

    keep = [c for c in df.columns if c != message_col]
    parsed = df.select(
        *keep, F.from_json(F.col(message_col), OTLP_METRICS_SCHEMA).alias("_md")
    )
    rm = parsed.select(*keep, F.explode("_md.resourceMetrics").alias("_rm"))
    sm = rm.select(
        *keep,
        _attr_entries(F.col("_rm.resource.attributes")).alias("_res_ents"),
        F.explode("_rm.scopeMetrics").alias("_sm"),
    ).select(
        *keep,
        _entries_to_map_last(F.col("_res_ents")).alias("resource"),
        "_sm",
    )
    met = sm.select(
        *keep,
        "resource",
        F.col("_sm.scope.name").alias("scope_name"),
        F.explode("_sm.metrics").alias("_m"),
    )
    pts = met.select(
        *keep,
        "resource",
        "scope_name",
        m.getField("name").alias("metric_name"),
        m.getField("unit").alias("unit"),
        F.explode(
            F.concat(
                gauge_points, sum_points, hist_points, exph_points, summ_points
            )
        ).alias("_p"),
    ).withColumn("_pt_ents", _attr_entries(F.col("_p.attrs")))
    p = F.col("_p")
    return pts.select(
        *keep,
        "metric_name",
        "unit",
        p.getField("mtype").alias("metric_type"),
        _nanos_to_ts(p.getField("ts")).alias("timestamp"),
        _nanos_to_ts(p.getField("start")).alias("start_timestamp"),
        F.coalesce(
            p.getField("vd"), p.getField("vi").try_cast("double")
        ).alias("value"),
        p.getField("cnt").try_cast("long").alias("count"),
        p.getField("msum").alias("sum"),
        F.transform(p.getField("bkts"), lambda x: x.try_cast("long")).alias(
            "bucket_counts"
        ),
        p.getField("bnds").alias("explicit_bounds"),
        p.getField("temporality").alias("temporality"),
        p.getField("monotonic").alias("is_monotonic"),
        p.getField("qs").alias("quantiles"),
        p.getField("scale").alias("scale"),
        p.getField("zero_cnt").try_cast("long").alias("zero_count"),
        p.getField("pos_off").alias("positive_offset"),
        F.transform(p.getField("pos_bkts"), lambda x: x.try_cast("long")).alias(
            "positive_bucket_counts"
        ),
        p.getField("neg_off").alias("negative_offset"),
        F.transform(p.getField("neg_bkts"), lambda x: x.try_cast("long")).alias(
            "negative_bucket_counts"
        ),
        _entries_to_map_last(F.col("_pt_ents")).alias("attributes"),
        "resource",
        "scope_name",
    )
