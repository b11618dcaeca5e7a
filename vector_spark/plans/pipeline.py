"""Pipeline: config → validated stage DAG → lazy DataFrame plan per sink.

Mirrors the reference's pipeline model end to end:

  * PipelineConfig {sources, transforms, sinks}, components = `type` +
    free-form options, transforms/sinks carry `inputs`
    (shared/src/config.rs:12-24, :60-68, :86-97, :116-127)
  * TOML round-trip: the same `[sources.x] type=…` / `[transforms.y]
    inputs=[…]` shape loads here (config.rs:48-56)
  * route multi-output ports: an input "router.errors" selects the named
    output, ≙ Connection.from_port (config.rs:224-226)
  * validation error codes: MISSING_TYPE / INVALID_INPUT / NO_SOURCES /
    NO_SINKS / UNKNOWN_KEY / MISSING_INPUTS, matching
    vectorize-cli/src/validation/mod.rs:170-345; plus BAD_HOOK (ours) for
    unresolvable lua/map_events hooks
  * functional-test mode: replace the source with literal sample events and
    every sink with one collecting output, ≙ generate_test_config
    (functional_test.rs:221-296)

Execution model: compilation produces ONE lazy DataFrame per sink; Spark's
Catalyst sees the whole plan (filters push into scans across stage
boundaries).  Multi-consumer nodes (route, or any stage feeding >1 sink) are
persisted once so the fan-out shares a single materialized scan.
"""

from __future__ import annotations

import re
import tomllib
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from vector_spark import sources as src_mod
from vector_spark.operators import (
    aggregate,
    dedupe,
    enrich,
    extract_text,
    filter_events,
    log_to_metric,
    metric_to_log,
    parse_apache_common,
    parse_grok,
    parse_json_fields,
    parse_url,
    reduce_events,
    remap,
    sample,
    sample_mod,
    sink_aggregate,
    split,
    tag_cardinality_limit,
    tag_routes,
    throttle,
)
from vector_spark.plans import sinks as sink_mod

KNOWN_TOP_KEYS = {"api", "sources", "transforms", "sinks", "tests", "enrichment_tables", "secret"}


@dataclass
class ValidationIssue:
    code: str
    message: str
    component: str | None = None
    severity: str = "error"  # error | warning


@dataclass
class Stage:
    name: str
    kind: str  # source | transform | sink
    type: str | None
    options: dict[str, Any] = field(default_factory=dict)
    inputs: list[str] = field(default_factory=list)


class PipelineError(ValueError):
    def __init__(self, issues: list[ValidationIssue]):
        self.issues = issues
        super().__init__("; ".join(f"{i.code}: {i.message}" for i in issues))


class Pipeline:
    def __init__(self, stages: dict[str, Stage], enrichment_tables: dict[str, Any] | None = None):
        self.stages = stages
        self.enrichment_tables = enrichment_tables or {}

    # ------------------------------------------------------------------ load
    @classmethod
    def from_dict(cls, cfg: dict) -> "Pipeline":
        stages: dict[str, Stage] = {}
        for kind_key, kind in (("sources", "source"), ("transforms", "transform"), ("sinks", "sink")):
            for name, c in (cfg.get(kind_key) or {}).items():
                c = dict(c)
                typ = c.pop("type", None)
                inputs = c.pop("inputs", [])
                if isinstance(inputs, str):
                    inputs = [inputs]
                stages[name] = Stage(name=name, kind=kind, type=typ, options=c, inputs=list(inputs))
        return cls(stages, cfg.get("enrichment_tables"))

    @classmethod
    def from_toml(cls, text: str) -> "Pipeline":
        return cls.from_dict(tomllib.loads(text))

    # -------------------------------------------------------------- validate
    def validate(self, raw_cfg: dict | None = None) -> list[ValidationIssue]:
        """Graph validation with the reference's error codes
        (validation/mod.rs:170-345)."""
        issues: list[ValidationIssue] = []
        if raw_cfg:
            for k in raw_cfg:
                if k not in KNOWN_TOP_KEYS:
                    issues.append(ValidationIssue("UNKNOWN_KEY", f"unknown top-level key '{k}'", severity="warning"))
        sources = [s for s in self.stages.values() if s.kind == "source"]
        sinks = [s for s in self.stages.values() if s.kind == "sink"]
        if not sources:
            issues.append(ValidationIssue("NO_SOURCES", "pipeline has no sources", severity="warning"))
        if not sinks:
            issues.append(ValidationIssue("NO_SINKS", "pipeline has no sinks", severity="warning"))
        names = set(self.stages)
        for s in self.stages.values():
            if s.type is None:
                issues.append(ValidationIssue("MISSING_TYPE", f"component '{s.name}' has no type", s.name))
            if s.kind in ("transform", "sink"):
                if not s.inputs:
                    issues.append(ValidationIssue("MISSING_INPUTS", f"component '{s.name}' has no inputs", s.name, severity="warning"))
                for inp in s.inputs:
                    base = inp.split(".", 1)[0]
                    if base not in names:
                        issues.append(ValidationIssue("INVALID_INPUT", f"component '{s.name}' references unknown input '{inp}'", s.name))
                    elif self.stages[base].kind == "sink":
                        issues.append(ValidationIssue("INVALID_INPUT", f"component '{s.name}' cannot read from sink '{inp}'", s.name))
        return issues

    def validate_or_raise(self, raw_cfg: dict | None = None) -> None:
        errors = [i for i in self.validate(raw_cfg) if i.severity == "error"]
        if errors:
            raise PipelineError(errors)

    # ----------------------------------------------------------------- build
    def build(self, spark: SparkSession, overrides: dict[str, DataFrame] | None = None) -> dict[str, DataFrame]:
        """Compile to {sink_name: DataFrame}. ``overrides`` maps a source
        name to a ready DataFrame (the functional-test entry, and how driver
        testdata is injected)."""
        self.validate_or_raise()
        outputs: dict[str, DataFrame | dict[str, DataFrame]] = {}
        order = self._topo_order()
        consumers = self._consumer_counts()
        for name in order:
            st = self.stages[name]
            if st.kind == "source":
                df = overrides[name] if overrides and name in overrides else self._build_source(spark, st)
                outputs[name] = df
            elif st.kind == "transform":
                df = self._resolve_inputs(st, outputs)
                outputs[name] = self._build_transform(spark, st, df)
                if not isinstance(outputs[name], dict) and consumers.get(name, 0) > 1:
                    outputs[name] = outputs[name].persist()
            else:  # sink: record the input DataFrame under the sink's name
                outputs[name] = self._resolve_inputs(st, outputs)
        return {name: outputs[name] for name, st in self.stages.items() if st.kind == "sink"}

    def run(self, spark: SparkSession, overrides: dict[str, DataFrame] | None = None) -> dict[str, Any]:
        """Build then execute every sink; returns {sink: result}."""
        built = self.build(spark, overrides)
        results: dict[str, Any] = {}
        for name, df in built.items():
            st = self.stages[name]
            results[name] = self._run_sink(st, df)
        return results

    def test(self, spark: SparkSession, sample_events: list[dict], source_id: str | None = None) -> dict[str, Any]:
        """Functional-test mode (≙ generate_test_config,
        functional_test.rs:221-296): inject sample events at the (first or
        named) source, collect every sink's rows into one __test_output list,
        report output/dropped counts."""
        src_names = [s.name for s in self.stages.values() if s.kind == "source"]
        target = source_id or (src_names[0] if src_names else None)
        if target is None:
            raise PipelineError([ValidationIssue("NO_SOURCES", "no source to inject into")])
        injected = src_mod.memory_source(spark, sample_events)
        built = self.build(spark, overrides={target: injected})
        out_rows: list[dict] = []
        for df in built.values():
            out_rows.extend(sink_mod.console_sink(df))
        return {
            "output_events": out_rows,
            "output_count": len(out_rows),
            "dropped_count": len(sample_events) - len(out_rows),
        }

    # ------------------------------------------------------------- internals
    def _topo_order(self) -> list[str]:
        """Kahn BFS (≙ auto_layout topo sort, ui/src/client/direct.rs:292-372)."""
        indeg = {n: 0 for n in self.stages}
        deps: dict[str, list[str]] = {n: [] for n in self.stages}
        for s in self.stages.values():
            for inp in s.inputs:
                base = inp.split(".", 1)[0]
                deps[base].append(s.name)
                indeg[s.name] += 1
        queue = sorted(n for n, d in indeg.items() if d == 0)
        order = []
        while queue:
            n = queue.pop(0)
            order.append(n)
            for m in sorted(deps[n]):
                indeg[m] -= 1
                if indeg[m] == 0:
                    queue.append(m)
        if len(order) != len(self.stages):
            cyc = set(self.stages) - set(order)
            raise PipelineError([ValidationIssue("INVALID_INPUT", f"cycle involving {sorted(cyc)}")])
        return order

    def _consumer_counts(self) -> dict[str, int]:
        counts: dict[str, int] = {}
        for s in self.stages.values():
            for inp in s.inputs:
                base = inp.split(".", 1)[0]
                counts[base] = counts.get(base, 0) + 1
        return counts

    def _resolve_inputs(self, st: Stage, outputs: dict) -> DataFrame:
        dfs: list[DataFrame] = []
        for inp in st.inputs:
            if "." in inp:
                base, port = inp.split(".", 1)
                node = outputs[base]
                if not isinstance(node, dict) or port not in node:
                    raise PipelineError([ValidationIssue("INVALID_INPUT", f"'{inp}': no output port '{port}'", st.name)])
                dfs.append(node[port])
            else:
                node = outputs[inp]
                if isinstance(node, dict):
                    raise PipelineError([ValidationIssue("INVALID_INPUT", f"'{inp}' is multi-output; select a port", st.name)])
                dfs.append(node)
        df = dfs[0]
        for other in dfs[1:]:  # implicit union on multi-input (validation/mod.rs:874)
            df = df.unionByName(other, allowMissingColumns=True)
        return df

    def _build_source(self, spark: SparkSession, st: Stage) -> DataFrame:
        o = st.options
        t = st.type
        if t == "demo_logs":
            decoding = o.get("decoding") or {}
            return src_mod.demo_logs(
                spark,
                count=int(o.get("count", 10_000)),
                fmt=o.get("format", "json"),
                lines=o.get("lines"),
                sequence=bool(o.get("sequence", False)),
                decoding_codec=decoding.get("codec", "bytes"),
                decoding_schema=o.get("decoding_schema"),
            )
        if t == "documents":
            return src_mod.documents_source(spark, n_rows=int(o.get("count", 10_000)))
        if t in ("file", "aws_s3", "gcp_cloud_storage"):
            if t != "file" and "bucket" in o:
                from vector_spark.sources.object_store import object_source

                decoding = o.get("decoding") or {}
                return object_source(
                    spark, o["bucket"], prefix=o.get("key_prefix", o.get("prefix", "")),
                    suffix=o.get("suffix", ""), codec=decoding.get("codec", o.get("codec", "text")),
                    schema=o.get("decoding_schema"), framing=(o.get("framing") or {}).get("method"),
                )
            return src_mod.file_source(spark, o.get("include", o.get("path")), codec=o.get("codec", "parquet"))
        if t == "parquet":
            return src_mod.parquet_source(spark, o["path"])
        if t == "warc":
            # Common-Crawl-style WARC segments; optional HTTP head/body split.
            from vector_spark.sources.warc import http_response_parts, warc_source

            df = warc_source(spark, o.get("include", o.get("path")))
            if o.get("http_split", True):
                df = http_response_parts(df)
            return df
        if t in ("stdin", "memory"):
            return src_mod.memory_source(spark, o.get("events", []))
        if t in ("socket", "syslog", "statsd", "vector"):
            fn = {
                "socket": src_mod.socket_source,
                "syslog": src_mod.syslog_source,
                "statsd": src_mod.statsd_source,
                "vector": src_mod.vector_source,
            }[t]
            kwargs = {"mode": o.get("mode", "tcp")}
            if "address" in o:
                kwargs["address"] = o["address"]
            if t == "socket":
                decoding = o.get("decoding") or {}
                kwargs["codec"] = decoding.get("codec", "bytes")
                kwargs["schema"] = o.get("decoding_schema")
            return fn(spark, **kwargs)
        if t == "host_metrics":
            from vector_spark.sources.host_metrics import COLLECTORS, host_metrics_source

            return host_metrics_source(
                spark,
                collectors=tuple(o.get("collectors", COLLECTORS)),
                proc_root=o.get("proc_root", "/proc"),
                mounts=tuple(o.get("mounts", ("/",))),
            )
        if t == "prometheus_scrape":
            endpoints = o.get("endpoints") or []
            if not endpoints:
                raise PipelineError([ValidationIssue(
                    "INVALID_INPUT",
                    f"prometheus_scrape source '{st.name}' needs a non-empty endpoints list",
                    st.name,
                )])
            return src_mod.prometheus_scrape_source(
                spark, list(endpoints), timeout_s=float(o.get("scrape_timeout_secs", 5.0))
            )
        if t == "opentelemetry":
            # The reference's OTLP listener; here the decode stage over either
            # spooled request bodies (path glob, one body per file) or inline
            # bodies (events) — the live-ingest transport is http_server.
            # `signal` picks the OTLP signal the endpoint carried (the three
            # /v1/{logs,traces,metrics} routes of the real listener).
            from vector_spark.sources import otlp as otlp_mod

            sig = o.get("signal", "logs")
            parsers = {
                "logs": otlp_mod.otlp_logs_parse,
                "traces": otlp_mod.otlp_traces_parse,
                "metrics": otlp_mod.otlp_metrics_parse,
            }
            if sig not in parsers:
                raise PipelineError([ValidationIssue(
                    "INVALID_INPUT",
                    f"opentelemetry source '{st.name}': signal must be one of "
                    f"{sorted(parsers)}, got {sig!r}",
                    st.name,
                )])
            if o.get("path"):
                bodies = (
                    spark.read.option("wholetext", True)
                    .text(o["path"])
                    .withColumnRenamed("value", "message")
                )
            else:
                bodies = spark.createDataFrame(
                    [(b,) for b in o.get("events", [])], "message string"
                )
            return parsers[sig](bodies)
        if t == "fluent":
            # Fluent Forward frames (msgpack).  Live TCP transport is not
            # line-delimited, so Spark's socket source cannot carry it;
            # the decode stage runs over spooled frame files (binaryFile,
            # one frame per file) or inline `frames` bytes — the same
            # spooled-body convention as the opentelemetry source.
            from pyspark.sql import functions as F

            from vector_spark.sources.fluent import fluent_parse

            if o.get("path"):
                frames = (
                    spark.read.format("binaryFile").load(o["path"])
                    .select(F.col("content").alias("payload"))
                )
            else:
                frames = spark.createDataFrame(
                    [(bytes(b),) for b in o.get("frames", [])], "payload binary"
                )
            return fluent_parse(frames)
        if t == "kafka":
            from vector_spark.streaming import kafka as kafka_mod

            plan = kafka_mod.source_plan_from_options(o)
            try:
                return plan.load(spark, streaming=not o.get("batch", False))
            except Exception as e:  # connector jar / broker absent
                raise PipelineError([ValidationIssue(
                    "INVALID_INPUT",
                    f"kafka source '{st.name}' compiled (topics={plan.topics!r}, "
                    f"servers={plan.bootstrap_servers!r}) but the connector is "
                    f"unavailable: {e.__class__.__name__}",
                    st.name,
                )]) from e
        raise PipelineError([ValidationIssue("MISSING_TYPE", f"unsupported source type {t!r}", st.name)])

    def _build_transform(self, spark: SparkSession, st: Stage, df: DataFrame):
        o = dict(st.options)
        t = st.type
        if t == "remap":
            out = df
            if o.get("parse_url"):
                out = parse_url(out, o.get("url_col", "url"))
            if o.get("extract_text"):
                out = extract_text(out, o.get("html_col", "html"))
            if o.get("parse_apache_common"):
                out = parse_apache_common(out, o.get("source_col", "message"))
            if o.get("parse_json"):
                out = parse_json_fields(out, o.get("source_col", "message"), o["parse_json"])
            if o.get("grok_pattern"):
                out = parse_grok(out, o.get("source_col", "message"), o["grok_pattern"], o["grok_fields"])
            if o.get("assignments") or o.get("source"):
                out = remap(out, o.get("assignments") or _parse_remap_source(o["source"]))
            return out
        if t == "filter":
            # is_log/is_metric/is_trace condition types carry no source text
            return filter_events(
                df, o.get("condition", ""), condition_type=o.get("condition_type", "vrl")
            )
        if t == "route":
            if o.get("mode", "first_match") == "all_matches":
                # upstream-Vector semantics: event → every matching output
                from vector_spark.operators import route_all_matches

                return route_all_matches(df, o["route"])
            tagged = tag_routes(df, o["route"])
            return split(tagged, list(o["route"].keys()))
        if t == "sample":
            if o.get("id_col"):
                return sample_mod(df, int(o.get("rate", 10)), o["id_col"])
            return sample(df, int(o.get("rate", 10)), o.get("key"))
        if t == "throttle":
            return throttle(
                df, o.get("ts_col", "timestamp"), threshold=int(o.get("threshold", 10)),
                window_secs=float(o.get("window_secs", 1.0)), key_field=o.get("key_field"),
                tiebreaker=o.get("tiebreaker"),
            )
        if t == "dedupe":
            fields = o.get("fields", {}).get("match") if isinstance(o.get("fields"), dict) else o.get("fields")
            return dedupe(df, fields or ["timestamp", "host", "message"], order_by=o.get("order_by"))
        if t == "reduce":
            # Vector's merge strategies follow ARRIVAL order; the batch
            # analog is event time, so order-sensitive strategies need a ts
            # column.  TOML configs rarely name one — default to the
            # pipeline's `timestamp` column when present (the decoder
            # always emits it), else let reduce_events raise loudly.
            ts_col = o.get("ts_col") or ("timestamp" if "timestamp" in df.columns else None)
            return reduce_events(
                df, o.get("group_by", []), o.get("merge", {}),
                ends_when=o.get("ends_when"), ts_col=ts_col,
                tiebreaker=o.get("tiebreaker"),
            )
        if t == "aggregate":
            interval = f"{int(o.get('interval_ms', 10_000)) // 1000} seconds"
            return aggregate(df, o.get("ts_col", "timestamp"), interval=interval,
                             group_by=o.get("group_by"), mode=o.get("mode", "auto"),
                             value_col=o.get("value_col", "value"))
        if t == "sink_aggregate":
            return sink_aggregate(df, ts_col=o.get("ts_col", "warc_ts"),
                                  interval=o.get("interval", "1 hour"),
                                  keys=tuple(o.get("keys", ("lang", "host"))),
                                  bytes_col=o.get("bytes_col", "content_bytes"))
        if t == "log_to_metric":
            # Vector's form takes a LIST of metric configs; the outputs are a
            # union of metrics-shaped rows (all share METRIC_EVENT_SCHEMA)
            out = None
            for m in o.get("metrics", [o]):
                one = log_to_metric(df, m.get("name", "events_total"), m.get("field", "message"),
                                    metric_type=m.get("type", "counter"),
                                    increment_by_value=bool(m.get("increment_by_value", False)),
                                    tags=m.get("tags"),
                                    # gauge = latest-by-event-time; default
                                    # to the decoder's timestamp column
                                    ts_col=m.get("ts_col")
                                    or ("timestamp" if "timestamp" in df.columns else None))
                out = one if out is None else out.unionByName(one)
            return out
        if t == "metric_to_log":
            return metric_to_log(df)
        if t == "tag_cardinality_limit":
            return tag_cardinality_limit(df, o["tag_col"], value_limit=int(o.get("value_limit", 500)),
                                         order_by=o.get("order_by"), action=o.get("action", "drop_tag"))
        if t == "enrich":
            table = self._load_enrichment(spark, o["table"])
            return enrich(df, table, on=o["on"], how=o.get("how", "left"))
        if t in ("lua", "map_events"):
            # Vector's lua slot → pandas-batch hook (NOT a Lua interpreter —
            # see operators/map_events.py).  `hook` takes a registered name
            # or "module:function"; a raw Lua `source` fails loudly here.
            from vector_spark.operators.map_events import map_events

            spec = o.get("hook") or o.get("source")
            if spec is None:
                raise PipelineError([ValidationIssue(
                    "BAD_HOOK", f"lua/map_events stage '{st.name}' needs a `hook`", st.name)])
            try:
                return map_events(df, spec, schema=o.get("schema"))
            except ValueError as e:
                raise PipelineError([ValidationIssue("BAD_HOOK", str(e), st.name)]) from e
        if t == "multiline":
            # upstream Vector exposes multiline on the file source
            # (start_pattern / condition_pattern / mode); as a transform
            # stage ANY line-bearing input assembles.  Default order column
            # is the sources' deterministic `id`.
            from vector_spark.operators import assemble_multiline

            start_p, cond_p = o.get("start_pattern"), o.get("condition_pattern")
            if not start_p and not cond_p:
                raise PipelineError([ValidationIssue(
                    "INVALID_INPUT",
                    f"multiline stage '{st.name}' needs start_pattern or "
                    "condition_pattern",
                    st.name,
                )])
            mode = o.get("mode")
            if mode is None:
                if start_p and cond_p:
                    # both patterns without an explicit mode is ambiguous —
                    # guessing would silently invert segmentation
                    raise PipelineError([ValidationIssue(
                        "INVALID_INPUT",
                        f"multiline stage '{st.name}' sets both "
                        "start_pattern and condition_pattern — add "
                        "mode = 'start_pattern' or 'continuation' to pick",
                        st.name,
                    )])
                mode = "continuation" if cond_p else "start_pattern"
            pattern = cond_p if mode == "continuation" else start_p
            if not pattern:
                raise PipelineError([ValidationIssue(
                    "INVALID_INPUT",
                    f"multiline stage '{st.name}': mode '{mode}' needs "
                    f"{'condition_pattern' if mode == 'continuation' else 'start_pattern'}",
                    st.name,
                )])
            stream_by = o.get("stream_by") or []
            if isinstance(stream_by, str):
                stream_by = [stream_by]
            return assemble_multiline(
                df, pattern, mode=mode, stream_by=stream_by,
                order_by=o.get("order_by", "id"),
                text_col=o.get("text_col", "message"),
                joiner=o.get("joiner", "\n"),
            )
        if t == "test_basic":
            return df
        raise PipelineError([ValidationIssue("MISSING_TYPE", f"unsupported transform type {t!r}", st.name)])

    def _load_enrichment(self, spark: SparkSession, name: str) -> DataFrame:
        from vector_spark import synth

        spec = self.enrichment_tables.get(name, {"type": name})
        t = spec.get("type", name)
        if t == "host_geo":
            return synth.host_geo(spark)
        if t == "lang_dict":
            return synth.lang_dict(spark)
        if t == "file":
            # Vector's enrichment-table shape: [enrichment_tables.x] type="file",
            # file.path + file.encoding.type (csv is Vector's standard format)
            f = spec.get("file") or {}
            path = f.get("path") or spec.get("path")
            enc = (f.get("encoding") or {}).get("type", spec.get("encoding", "csv"))
            if enc == "csv":
                return spark.read.csv(path, header=True, schema=spec.get("schema"),
                                      inferSchema=spec.get("schema") is None)
            if enc == "parquet":
                return spark.read.parquet(path)
            raise PipelineError([ValidationIssue(
                "INVALID_INPUT", f"enrichment table {name!r}: unknown encoding {enc!r}")])
        if t == "parquet":
            return spark.read.parquet(spec["path"])
        raise PipelineError([ValidationIssue("INVALID_INPUT", f"unknown enrichment table {name!r}")])

    def _run_sink(self, st: Stage, df: DataFrame):
        o = st.options
        t = st.type
        if t == "console":
            return sink_mod.console_sink(df, limit=o.get("limit"), codec=o.get("codec", "json"))
        if t == "elasticsearch":
            sink_mod.elasticsearch_sink(
                df, o["path"], index_template=o.get("index", "vector-%Y.%m.%d"),
                ts_col=o.get("ts_col", "timestamp"), mode=o.get("mode", "overwrite"),
            )
            return o["path"]
        if t == "loki":
            sink_mod.loki_sink(df, o["path"], labels=o.get("labels"), mode=o.get("mode", "overwrite"))
            return o["path"]
        if t in ("file", "parquet", "aws_s3"):
            sink_mod.file_sink(df, o["path"], codec=o.get("codec", "parquet"),
                               partition_by=o.get("partition_by"), mode=o.get("mode", "overwrite"))
            return o["path"]
        if t == "blackhole":
            return sink_mod.blackhole_sink(df)
        if t == "memory":
            return sink_mod.console_sink(df)
        if t == "kafka":
            from vector_spark.streaming import kafka as kafka_mod

            plan = kafka_mod.sink_plan_from_options(o)
            return plan.start(df, checkpoint_dir=o.get("checkpoint_dir"))
        if t == "http":
            from vector_spark.plans import http_sink

            plan = http_sink.plan_from_options(o)
            if df.isStreaming:
                return plan.writer(df, checkpoint_dir=o.get("checkpoint_dir"))
            plan.run_batch(df)
            return o["uri"]
        raise PipelineError([ValidationIssue("MISSING_TYPE", f"unsupported sink type {t!r}", st.name)])

    def describe(self) -> str:
        """Topology introspection (≙ Topology/ComponentKind,
        shared/src/messages.rs:71-100)."""
        lines = []
        for name in self._topo_order():
            s = self.stages[name]
            arrow = f" ← {', '.join(s.inputs)}" if s.inputs else ""
            lines.append(f"[{s.kind}] {name} ({s.type}){arrow}")
        return "\n".join(lines)


def _parse_remap_source(source: str) -> dict[str, str]:
    """Parse a simple VRL remap program `.field = <expr>` per line into
    assignments (the observed remap shapes in dev/configs/*.toml:26-30)."""
    assignments: dict[str, str] = {}
    for line in source.replace(";", "\n").splitlines():
        line = line.strip()
        if not line or line.startswith("#"):  # VRL comments (production/vector.toml:27)
            continue
        m = re.match(r"^del\(\s*\.([A-Za-z_][A-Za-z0-9_]*)\s*\)$", line)
        if m:  # VRL del(.field) → drop the column (remap maps None to drop)
            assignments[m.group(1)] = None
            continue
        if "=" not in line or not line.startswith("."):
            raise PipelineError([ValidationIssue("INVALID_INPUT", f"unsupported remap statement {line!r}")])
        lhs, rhs = line.split("=", 1)
        assignments[lhs.strip().lstrip(".")] = rhs.strip()
    return assignments
