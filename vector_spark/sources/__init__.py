"""Sources — scans and generators (SURVEY §2.2).

Reference source palette: palette.rs:70-122 (35 sources).  The
semantics-bearing ones map to Spark scans:

  demo_logs  (config_panel.rs:775-900)  → synthetic generators (demo_logs())
  stdin      (functional_test.rs:247-256) → memory_source() — the test entry
  file       (config_panel.rs:918-930)  → spark.read (text/json/csv/parquet)
  aws_s3 etc (palette.rs:95-98)         → the same spark.read against object
                                          storage URIs (s3a:// …)
  kafka      (config_panel.rs:1020-1040)→ streaming module (readStream kafka)

Everything returns a lazy DataFrame; Catalyst handles pushdown/pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark import synth
from vector_spark.schema import LOG_EVENT_SCHEMA


def parquet_source(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def file_source(
    spark: SparkSession,
    path: str,
    codec: str = "text",
    schema=None,
    framing: str | None = None,
    framing_delimiter: str = ",",
) -> DataFrame:
    """`file` source: include-glob → lines (framing=newline_delimited is the
    default text behavior) or typed rows (decoding.codec=json/csv).

    A non-default ``framing`` (character_delimited / length_delimited /
    octet_counting) reads whole files as byte streams (``binaryFile``) and
    splits events per codecs.frame_stream; the decoded `message` column then
    goes through codecs.decode_events when a decoding codec is given."""
    if framing and framing not in ("bytes", "newline_delimited"):
        from vector_spark.sources import codecs as codecs_mod

        raw = (
            spark.read.format("binaryFile")
            .load(path)
            .select(F.col("content").alias("value"))
        )
        framed = codecs_mod.frame_stream(raw, framing, delimiter=framing_delimiter)
        if codec in ("text", "bytes"):
            return framed
        return codecs_mod.decode_events(framed, codec, schema=schema)
    if codec == "text":
        return spark.read.text(path).withColumnRenamed("value", "message")
    if codec == "json":
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(path)
    if codec == "csv":
        return spark.read.csv(path, header=True, schema=schema)
    if codec == "parquet":
        return spark.read.parquet(path)
    raise ValueError(f"unknown codec {codec!r}")


def memory_source(spark: SparkSession, events: list[dict], schema=None) -> DataFrame:
    """The `stdin` analog used by the functional tester: a literal list of
    events becomes the source (functional_test.rs:247-256)."""
    if schema is None and events and set(events[0]) <= set(LOG_EVENT_SCHEMA.fieldNames()):
        schema = LOG_EVENT_SCHEMA
    pdf = pd.DataFrame(events)
    if schema is not None:
        for f in schema.fieldNames():
            if f not in pdf.columns:
                pdf[f] = None
        pdf = pdf[list(schema.fieldNames())]
        return spark.createDataFrame(pdf, schema)
    return spark.createDataFrame(pdf)


# --- demo_logs: deterministic fake-log generator -----------------------------

_METHODS = ["GET", "GET", "GET", "POST", "PUT", "DELETE"]
_PATHS = ["/", "/index.html", "/api/v1/items", "/login", "/static/app.js", "/health"]
_STATUS = [200, 200, 200, 201, 301, 404, 500, 503]


_ERR_LEVELS = ["error", "warn", "notice", "crit"]
_ERR_MSGS = [
    "File does not exist",
    "client denied by server configuration",
    "script timed out before returning headers",
    "upstream prematurely closed connection",
]

DEMO_FORMATS = ("json", "apache_common", "apache_error", "syslog", "bsd_syslog", "shuffle")


def _format_lines(
    ids: np.ndarray,
    fmt: str,
    lines: list[str] | None = None,
    sequence: bool = False,
) -> list[str]:
    """One line per id in the reference's demo_logs formats
    (config_panel.rs:795-806): json / apache_common / apache_error /
    syslog (RFC 5424) / bsd_syslog (RFC 3164) / shuffle (pick from custom
    `lines`, optional incrementing `sequence` prefix)."""
    h = synth._splitmix64(ids.astype(np.uint64) + np.uint64(synth.SEED * 13))
    h2 = synth._splitmix64(h)
    out = []
    for i, a, b in zip(ids, h, h2):
        ip = f"10.{int(a) % 256}.{int(a >> np.uint64(8)) % 256}.{int(a >> np.uint64(16)) % 256}"
        method = _METHODS[int(a >> np.uint64(24)) % len(_METHODS)]
        path = _PATHS[int(a >> np.uint64(32)) % len(_PATHS)]
        status = _STATUS[int(b) % len(_STATUS)]
        size = 100 + int(b >> np.uint64(8)) % 5000
        ts = pd.Timestamp("2026-01-01T00:00:00Z") + pd.Timedelta(seconds=int(i))
        host = f"host-{int(a) % 20:04d}"
        app = "app"
        pid = 1000 + int(b) % 9000
        pri = int(a) % 192
        if fmt == "apache_common":
            out.append(
                f'{ip} - frank [{ts.strftime("%d/%b/%Y:%H:%M:%S +0000")}] '
                f'"{method} {path} HTTP/1.1" {status} {size}'
            )
        elif fmt == "apache_error":
            level = _ERR_LEVELS[int(b >> np.uint64(16)) % len(_ERR_LEVELS)]
            msg = _ERR_MSGS[int(b >> np.uint64(24)) % len(_ERR_MSGS)]
            out.append(
                f'[{ts.strftime("%a %b %d %H:%M:%S %Y")}] [{level}] '
                f"[client {ip}] {msg}: {path}"
            )
        elif fmt == "syslog":
            # RFC 5424: <pri>1 TIMESTAMP HOST APP PROCID MSGID [SD] MSG
            out.append(
                f"<{pri}>1 {ts.strftime('%Y-%m-%dT%H:%M:%S.000Z')} {host} {app} "
                f'{pid} ID{int(b) % 1000} [exampleSDID@32473 iut="3"] '
                f"{method} {path} -> {status}"
            )
        elif fmt == "bsd_syslog":
            # RFC 3164: <pri>Mmm dd hh:mm:ss host app[pid]: MSG
            out.append(
                f"<{pri}>{ts.strftime('%b %d %H:%M:%S')} {host} "
                f"{app}[{pid}]: {method} {path} -> {status}"
            )
        elif fmt == "json":
            out.append(
                '{"method": "%s", "path": "%s", "status": %d, "bytes": %d, "ip": "%s"}'
                % (method, path, status, size, ip)
            )
        elif fmt == "shuffle":
            pool = lines or ["demo line"]
            line = pool[int(a) % len(pool)]
            out.append(f"{int(i)} {line}" if sequence else line)
        else:
            raise ValueError(f"unknown demo_logs format {fmt!r}")
    return out


def demo_logs(
    spark: SparkSession,
    count: int = 10_000,
    fmt: str = "json",
    partitions: int | None = None,
    lines: list[str] | None = None,
    sequence: bool = False,
    decoding_codec: str = "bytes",
    decoding_schema: str | None = None,
) -> DataFrame:
    """`demo_logs` source: deterministic fake log lines in ALL the
    reference's formats (config_panel.rs:795-806 — json / apache_common /
    apache_error / syslog RFC 5424 / bsd_syslog RFC 3164 / shuffle with
    custom ``lines`` + ``sequence``), generated distributed.

    Returns (id long, timestamp, message string) — message is the raw line,
    exactly as Vector's demo_logs emits into `.message`.  A non-default
    ``decoding.codec`` (bytes/json/syslog/gelf/native_json) additionally
    parses the line into typed event columns (codecs.decode_events).
    Framing does not apply here — the generator emits one event per row
    already (framing belongs to byte-stream sources; see codecs.frame_stream).
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            ts = pd.Series(pd.Timestamp("2026-01-01T00:00:00Z") + pd.to_timedelta(ids, unit="s"))
            yield pd.DataFrame(
                {"id": ids, "timestamp": ts, "message": _format_lines(ids, fmt, lines, sequence)}
            )

    out = spark.range(0, count, numPartitions=partitions).mapInPandas(
        gen, "id long, timestamp timestamp, message string"
    )
    if decoding_codec != "bytes":
        from vector_spark.sources import codecs

        if decoding_codec == "json" and decoding_schema is None:
            decoding_schema = "method string, path string, status int, bytes int, ip string"
        out = codecs.decode_events(out, decoding_codec, schema=decoding_schema)
    return out


def documents_source(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """The Common-Crawl-style primary table (BASELINE input_hint shape)."""
    return synth.documents(spark, n_rows, partitions)


# --- socket-family sources ---------------------------------------------------

def socket_source(
    spark: SparkSession,
    address: str = "0.0.0.0:9000",
    mode: str = "tcp",
    codec: str = "bytes",
    schema: str | None = None,
) -> DataFrame:
    """`socket` source (config_panel.rs: SocketSourceForm — mode tcp/udp/unix,
    address default 0.0.0.0:9000) → Structured Streaming's socket source.

    Spark's socket source is TCP-only; udp/unix raise a clear error rather
    than silently degrading.  Lines decode per ``codec`` (codecs module)."""
    if mode != "tcp":
        raise ValueError(
            f"socket mode {mode!r}: Spark's socket source is TCP-only "
            "(udp/unix need a host agent in front, e.g. socat → tcp)"
        )
    host, _, port = address.rpartition(":")
    stream = (
        spark.readStream.format("socket")
        .option("host", host or "127.0.0.1")
        .option("port", int(port))
        .load()
        .withColumnRenamed("value", "message")
    )
    if codec != "bytes":
        from vector_spark.sources import codecs as codecs_mod

        stream = codecs_mod.decode_events(stream, codec, schema=schema)
    return stream


def syslog_source(spark: SparkSession, address: str = "0.0.0.0:514", mode: str = "tcp") -> DataFrame:
    """`syslog` source (SyslogSourceForm, default 0.0.0.0:514): socket lines
    decoded with the syslog codec (RFC 5424 with 3164 fallback)."""
    return socket_source(spark, address, mode, codec="syslog")


def vector_source(spark: SparkSession, address: str = "0.0.0.0:9000", mode: str = "tcp") -> DataFrame:
    """`vector` source: Vector-to-Vector transport; the JSON rendering of the
    native event envelope decodes with the native_json codec (the protobuf
    variant is documented out of scope in codecs.py)."""
    return socket_source(spark, address, mode, codec="native_json")


#: statsd wire format: name:value|type[|@sample_rate]
_STATSD_RE = r"^([^:|]+):([-+]?[0-9.]+)\|(c|g|ms|s|h)(?:\|@([0-9.]+))?$"


def statsd_parse(df: DataFrame, message_col: str = "message") -> DataFrame:
    """statsd lines → metric rows (name, value, metric_type, sample_rate) —
    pure regexp_extract, codegen.  Non-matching lines yield NULL name (route
    them to an error output with filter_with_dropped)."""
    msg = F.col(message_col)
    return df.select(
        *[c for c in df.columns if c != message_col],
        F.nullif(F.regexp_extract(msg, _STATSD_RE, 1), F.lit("")).alias("name"),
        F.regexp_extract(msg, _STATSD_RE, 2).try_cast("double").alias("value"),
        F.nullif(F.regexp_extract(msg, _STATSD_RE, 3), F.lit("")).alias("metric_type"),
        F.coalesce(
            F.nullif(F.regexp_extract(msg, _STATSD_RE, 4), F.lit("")).try_cast("double"),
            F.lit(1.0),
        ).alias("sample_rate"),
    )


def statsd_source(spark: SparkSession, address: str = "0.0.0.0:8125", mode: str = "tcp") -> DataFrame:
    """`statsd` source (StatsdSourceForm, default 0.0.0.0:8125; reference
    default mode is udp — Spark is TCP-only, so pass mode='tcp' and front
    udp with an agent)."""
    return statsd_parse(socket_source(spark, address, mode))


#: Prometheus exposition format (text/plain version 0.0.4, public spec):
#:   metric_name{label="value",...} value [timestamp_ms]
# The label block uses [\s\S] instead of `.`: a RAW carriage return is legal
# inside an exposition label value (only \\ \" \n are escape-mandated), but
# Java-regex `.` excludes ALL line terminators — \r included — so `.` would
# reject such lines wholesale.
_PROM_SAMPLE_RE = r'^([a-zA-Z_:][a-zA-Z0-9_:]*)(\{[\s\S]*\})?\s+(\S+)(?:\s+(-?\d+))?\s*$'
_PROM_LABEL_RE = r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:\\.|[^"\\])*)"'
_PROM_TYPE_RE = r"^# TYPE ([a-zA-Z_:][a-zA-Z0-9_:]*) (counter|gauge|histogram|summary|untyped)\s*$"


def _prom_unescape(v):
    """Label-value unescape per the exposition spec: backslash-backslash →
    backslash, backslash-quote → quote, backslash-n → newline.  The
    backslash pair is routed through a private-use placeholder first so a
    literal backslash followed by 'n' does NOT decode to a newline."""
    ph = "\ue000"  # private-use codepoint; cannot appear in scraped ASCII text
    v = F.regexp_replace(v, r"\\\\", ph)
    v = F.regexp_replace(v, r'\\"', '"')
    v = F.regexp_replace(v, r"\\n", "\n")
    return F.regexp_replace(v, ph, r"\\")


def prometheus_parse(df: DataFrame, message_col: str = "message") -> DataFrame:
    """Prometheus exposition lines → metric sample rows
    (name, labels map, value, timestamp_ms) — pure regexp/codegen, the
    statsd_parse shape.

    Comment (`# HELP`/`# TYPE`) and blank lines are DROPPED (they are
    metadata, not samples — recover TYPE associations with
    :func:`prometheus_types`); any other non-matching line yields NULL name
    so callers can route malformed input instead of losing it.  `+Inf` /
    `-Inf` / `NaN` sample values map to their IEEE doubles per spec."""
    msg = F.col(message_col)
    keep = [c for c in df.columns if c != message_col]
    df = df.filter(~F.trim(msg).startswith("#") & (F.trim(msg) != ""))
    # Stage every regex group as a REAL column before anything reuses it:
    # each reference to regexp_extract(msg, RE, g) re-runs the match, so the
    # value's 4-branch when-chain alone was 4 matches/row, and the label-map
    # dedup lambda (which closes over the entries expression) re-ran the
    # label regexp_extract_all once per label ELEMENT.  Staged, the sample
    # regex runs exactly 4×/row (once per group), the label regex 2×, and
    # the dedup lambda reads an O(1) attribute — measured ~4× faster at 1M
    # lines with zero semantic change.
    staged = df.select(
        *keep,
        F.regexp_extract(msg, _PROM_SAMPLE_RE, 1).alias("_p_name"),
        F.regexp_extract(msg, _PROM_SAMPLE_RE, 2).alias("_p_lblk"),
        F.regexp_extract(msg, _PROM_SAMPLE_RE, 3).alias("_p_rawv"),
        F.regexp_extract(msg, _PROM_SAMPLE_RE, 4).alias("_p_ts"),
    ).withColumn(
        "_p_ents",
        F.zip_with(
            F.regexp_extract_all(F.col("_p_lblk"), F.lit(_PROM_LABEL_RE), F.lit(1)),
            F.transform(
                F.regexp_extract_all(F.col("_p_lblk"), F.lit(_PROM_LABEL_RE), F.lit(2)),
                _prom_unescape,
            ),
            lambda k, v: F.struct(k.alias("key"), v.alias("value")),
        ),
    )
    raw_v = F.col("_p_rawv")
    value = (
        F.when(raw_v == "+Inf", F.lit(float("inf")))
        .when(raw_v == "-Inf", F.lit(float("-inf")))
        .when(raw_v == "NaN", F.lit(float("nan")))
        .otherwise(raw_v.try_cast("double"))
    )
    # keep the LAST occurrence of a repeated label name: a repeated name is
    # invalid exposition text, but map_from_entries under the default
    # mapKeyDedupPolicy=EXCEPTION would fail the whole scrape job on one bad
    # line — one misbehaving target must degrade, not take down the fleet
    # scrape.  Label lists are tiny; the in-row exists is O(n²), n ≤ a dozen.
    ents = F.col("_p_ents")
    deduped = F.filter(
        ents,
        lambda e, i: ~F.exists(
            F.slice(ents, i + 2, F.greatest(F.size(ents) - i - 1, F.lit(0))),
            lambda e2: e2.getField("key") == e.getField("key"),
        ),
    )
    return staged.select(
        *keep,
        F.nullif(F.col("_p_name"), F.lit("")).alias("name"),
        F.map_from_entries(deduped).alias("labels"),
        value.alias("value"),
        F.nullif(F.col("_p_ts"), F.lit("")).try_cast("long").alias("timestamp_ms"),
    )


def prometheus_types(df: DataFrame, message_col: str = "message") -> DataFrame:
    """`# TYPE family type` lines → (name, metric_type) rows, for a
    broadcast join back onto the samples (histogram/summary series carry
    the family name plus _bucket/_sum/_count suffixes — joining is the
    caller's policy choice, as in a real scraper)."""
    msg = F.col(message_col)
    return (
        df.select(
            F.nullif(F.regexp_extract(msg, _PROM_TYPE_RE, 1), F.lit("")).alias("name"),
            F.nullif(F.regexp_extract(msg, _PROM_TYPE_RE, 2), F.lit("")).alias("metric_type"),
        )
        .filter(F.col("name").isNotNull())
        .distinct()
    )


def prometheus_scrape_source(
    spark: SparkSession,
    endpoints: list[str],
    timeout_s: float = 5.0,
    partitions: int | None = None,
) -> DataFrame:
    """`prometheus_scrape` source (PrometheusScrapeSourceForm: endpoint
    list + scrape interval; this is the batch analog of one scrape tick).

    Scale shape: the ENDPOINT LIST parallelizes — each executor task
    fetches its own slice of targets over HTTP (mapInPandas; thousands of
    scrape targets is a small DataFrame, one GET per row), splits the body
    into lines, and the sample parse is the same codegen regex as
    prometheus_parse.  Unreachable targets become rows with
    `scrape_error` set, not task failures — a fleet scrape must tolerate
    down instances.  Returns (endpoint, name, labels, value, timestamp_ms,
    scrape_error)."""
    n_parts = partitions or min(len(endpoints), spark.sparkContext.defaultParallelism) or 1
    edf = spark.createDataFrame([(e,) for e in endpoints], "endpoint string").repartition(n_parts)

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from urllib.request import urlopen

        for pdf in batches:
            out = {"endpoint": [], "message": [], "scrape_error": []}
            for ep in pdf["endpoint"]:
                try:
                    with urlopen(ep, timeout=timeout_s) as r:
                        body = r.read().decode("utf-8", errors="replace")
                    for line in body.splitlines():
                        out["endpoint"].append(ep)
                        out["message"].append(line)
                        out["scrape_error"].append(None)
                except Exception as e:  # noqa: BLE001 — any target failure is data
                    out["endpoint"].append(ep)
                    out["message"].append("")
                    out["scrape_error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    lines = edf.mapInPandas(fetch, "endpoint string, message string, scrape_error string")
    ok = prometheus_parse(lines.filter(F.col("scrape_error").isNull()), "message")
    failed = lines.filter(F.col("scrape_error").isNotNull()).select(
        "endpoint",
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("map<string,string>").alias("labels"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("long").alias("timestamp_ms"),
        "scrape_error",
    )
    # `ok` rows already carry a NULL scrape_error (they were filtered on it)
    return ok.unionByName(failed)
