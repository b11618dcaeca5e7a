"""Pipeline compiler tests — config round-trip, validation error codes,
functional-test mode, routed-row equality: the reference's test strategy
(SURVEY §5) re-expressed."""

from __future__ import annotations

import pytest

from vector_spark.plans.pipeline import Pipeline, PipelineError
from vector_spark.synth import sample_log_events

VALID_TOML = """
[sources.logs]
type = "demo_logs"
format = "json"
count = 100

[transforms.parse]
type = "remap"
inputs = ["logs"]
parse_json = "method string, path string, status int, bytes long, ip string"

[transforms.router]
type = "route"
inputs = ["parse"]
[transforms.router.route]
errors = ".status >= 500"
client_errors = ".status >= 400 && .status < 500"

[sinks.errors_out]
type = "console"
inputs = ["router.errors"]

[sinks.rest]
type = "console"
inputs = ["router._unmatched", "router.client_errors"]
"""


def test_toml_load_and_describe():
    p = Pipeline.from_toml(VALID_TOML)
    assert len(p.stages) == 5
    d = p.describe()
    assert "[source] logs (demo_logs)" in d
    assert "router.errors" in d


def test_valid_pipeline_no_issues():
    assert Pipeline.from_toml(VALID_TOML).validate() == []


def test_missing_type_error():
    p = Pipeline.from_dict({"sources": {"s": {}}, "sinks": {"o": {"type": "console", "inputs": ["s"]}}})
    codes = [i.code for i in p.validate()]
    assert "MISSING_TYPE" in codes


def test_invalid_input_error():
    p = Pipeline.from_dict({
        "sources": {"s": {"type": "demo_logs"}},
        "transforms": {"t": {"type": "filter", "condition": "true", "inputs": ["nope"]}},
        "sinks": {"o": {"type": "console", "inputs": ["t"]}},
    })
    codes = [i.code for i in p.validate()]
    assert "INVALID_INPUT" in codes


def test_sink_as_input_invalid():
    p = Pipeline.from_dict({
        "sources": {"s": {"type": "demo_logs"}},
        "sinks": {
            "o": {"type": "console", "inputs": ["s"]},
            "o2": {"type": "console", "inputs": ["o"]},
        },
    })
    assert any(i.code == "INVALID_INPUT" for i in p.validate())


def test_warnings_no_sources_no_sinks_unknown_key():
    p = Pipeline.from_dict({})
    codes = {i.code for i in p.validate({"bogus": 1})}
    assert {"NO_SOURCES", "NO_SINKS", "UNKNOWN_KEY"} <= codes
    assert all(i.severity == "warning" for i in p.validate({"bogus": 1}))


def test_cycle_detection(spark):
    p = Pipeline.from_dict({
        "sources": {"s": {"type": "demo_logs", "count": 1}},
        "transforms": {
            "a": {"type": "test_basic", "inputs": ["s", "b"]},
            "b": {"type": "test_basic", "inputs": ["a"]},
        },
        "sinks": {"o": {"type": "console", "inputs": ["a"]}},
    })
    with pytest.raises(PipelineError):
        p.build(spark)


def test_functional_test_mode(spark):
    """≙ Layer-4: sample events in → counted outputs + dropped_count
    (functional_test.rs:114-197)."""
    p = Pipeline.from_dict({
        "sources": {"in": {"type": "stdin"}},
        "transforms": {"f": {"type": "filter", "condition": '.level == "error"', "inputs": ["in"]}},
        "sinks": {"out": {"type": "console", "inputs": ["f"]}},
    })
    r = p.test(spark, sample_log_events(20))
    assert r["output_count"] == 5
    assert r["dropped_count"] == 15
    assert all(e["level"] == "error" for e in r["output_events"])


def test_routed_row_equality(spark):
    """Every input row lands in exactly one route output (the reference's
    routed-row equality check)."""
    p = Pipeline.from_toml(VALID_TOML)
    res = p.run(spark)
    total = sum(len(v) for v in res.values())
    assert total == 100
    ids = sorted(e["id"] for v in res.values() for e in v)
    assert ids == list(range(100))


def test_multi_input_union(spark):
    p = Pipeline.from_dict({
        "sources": {
            "a": {"type": "demo_logs", "count": 10, "format": "json"},
            "b": {"type": "demo_logs", "count": 5, "format": "json"},
        },
        "sinks": {"o": {"type": "console", "inputs": ["a", "b"]}},
    })
    assert len(p.run(spark)["o"]) == 15


def test_source_override_injection(spark):
    """Driver-testdata injection point: a named source can be replaced by an
    arbitrary DataFrame (the stdin-swap rewrite, functional_test.rs:247-256)."""
    p = Pipeline.from_dict({
        "sources": {"in": {"type": "demo_logs", "count": 999}},
        "sinks": {"o": {"type": "console", "inputs": ["in"]}},
    })
    df = spark.range(3).toDF("x")
    res = p.run(spark, overrides={"in": df})
    assert len(res["o"]) == 3


def test_elasticsearch_sink_index_template(spark, tmp_path):
    from vector_spark.plans.pipeline import Pipeline

    p = Pipeline.from_dict(
        {
            "sources": {"gen": {"type": "demo_logs", "count": 30, "format": "json"}},
            "sinks": {
                "es": {
                    "type": "elasticsearch",
                    "inputs": ["gen"],
                    "path": str(tmp_path / "es"),
                    "index": "vector-%Y.%m.%d",
                }
            },
        }
    )
    p.run(spark)
    got = spark.read.parquet(str(tmp_path / "es"))
    assert got.count() == 30
    # per-day index partitions with the literal prefix preserved
    assert {r._index for r in got.select("_index").distinct().collect()} == {"vector-2026.01.01"}
    import os

    assert any(d.startswith("_index=vector-") for d in os.listdir(tmp_path / "es"))


def test_loki_sink_labels_become_partitions(spark, tmp_path):
    from vector_spark.plans.pipeline import Pipeline

    p = Pipeline.from_dict(
        {
            "sources": {"gen": {"type": "demo_logs", "count": 10, "format": "json"}},
            "sinks": {
                "lk": {
                    "type": "loki",
                    "inputs": ["gen"],
                    "path": str(tmp_path / "lk"),
                    "labels": {"env": "prod", "app": "web"},
                }
            },
        }
    )
    p.run(spark)
    got = spark.read.parquet(str(tmp_path / "lk"))
    assert got.count() == 10
    assert {(r.env, r.app) for r in got.select("env", "app").distinct().collect()} == {("prod", "web")}
    # label columns ARE the partition spec → pruning on the stream selector
    pruned = got.filter("env = 'prod'")
    assert pruned.count() == 10


def test_enrichment_table_from_csv_file(spark, tmp_path):
    from vector_spark.plans.pipeline import Pipeline

    csv = tmp_path / "geo.csv"
    csv.write_text("ip,country\n10.0.0.1,DE\n10.0.0.2,FR\n")
    p = Pipeline.from_dict(
        {
            "enrichment_tables": {
                "geo": {"type": "file", "file": {"path": str(csv), "encoding": {"type": "csv"}}}
            },
            "sources": {"ev": {"type": "memory", "events": []}},
            "transforms": {
                "enriched": {"type": "enrich", "inputs": ["ev"], "table": "geo", "on": "ip"}
            },
            "sinks": {"out": {"type": "memory", "inputs": ["enriched"]}},
        }
    )
    assert p.validate() == []
    res = p.test(
        spark,
        [{"ip": "10.0.0.1", "msg": "x"}, {"ip": "10.9.9.9", "msg": "y"}],
    )
    by_ip = {e["ip"]: e for e in res["output_events"]}
    assert by_ip["10.0.0.1"]["country"] == "DE"
    assert by_ip["10.9.9.9"]["country"] is None  # lookup miss → NULL, like Vector


def test_filter_condition_type_is_kind_checks(spark):
    """is_log/is_metric/is_trace condition types carry no source text; the
    filter IS the event-kind predicate (config_panel.rs:1461-1467)."""
    from vector_spark.plans.pipeline import Pipeline

    p = Pipeline.from_dict(
        {
            "sources": {"ev": {"type": "memory", "events": []}},
            "transforms": {
                "logs_only": {"type": "filter", "inputs": ["ev"], "condition_type": "is_log"},
                "metrics_only": {"type": "filter", "inputs": ["ev"], "condition_type": "is_metric"},
            },
            "sinks": {
                "l": {"type": "memory", "inputs": ["logs_only"]},
                "m": {"type": "memory", "inputs": ["metrics_only"]},
            },
        }
    )
    built = p.build(
        spark, overrides={"ev": spark.createDataFrame([("a",), ("b",)], "message string")}
    )
    from vector_spark.plans.sinks import console_sink

    assert len(console_sink(built["l"])) == 2  # log events pass is_log
    assert console_sink(built["m"]) == []      # and fail is_metric


def test_remap_del_statement(spark):
    """VRL `del(.field)` in a remap source drops the column."""
    from vector_spark.plans.pipeline import Pipeline

    p = Pipeline.from_dict(
        {
            "sources": {"ev": {"type": "memory", "events": []}},
            "transforms": {
                "clean": {
                    "type": "remap",
                    "inputs": ["ev"],
                    "source": '.env = "prod"\ndel(.secret)',
                }
            },
            "sinks": {"out": {"type": "memory", "inputs": ["clean"]}},
        }
    )
    res = p.test(spark, [{"message": "m", "secret": "hunter2"}])
    ev = res["output_events"][0]
    assert ev["env"] == "prod"
    assert "secret" not in ev


def test_lua_stage_compiles_to_map_events(spark):
    """`type = "lua"` builds via the map_events pandas-batch hook (NOT a Lua
    interpreter) — the palette's last transform type compiles."""
    from vector_spark.operators import register_map_hook

    def upper_msg(pdf):
        pdf = pdf.copy()
        pdf["message"] = pdf["message"].str.upper()
        return pdf

    register_map_hook("upper_msg", upper_msg)
    p = Pipeline.from_dict(
        {
            "sources": {"ev": {"type": "memory", "events": []}},
            "transforms": {
                "shout": {"type": "lua", "inputs": ["ev"], "hook": "upper_msg"}
            },
            "sinks": {"out": {"type": "memory", "inputs": ["shout"]}},
        }
    )
    res = p.test(spark, [{"message": "hello"}, {"message": "world"}])
    assert sorted(e["message"] for e in res["output_events"]) == ["HELLO", "WORLD"]


def test_lua_stage_rejects_raw_lua_source(spark):
    """An actual Lua script fails loudly at build time instead of being
    silently skipped or mangled."""
    p = Pipeline.from_dict(
        {
            "sources": {"ev": {"type": "memory", "events": []}},
            "transforms": {
                "script": {
                    "type": "lua",
                    "inputs": ["ev"],
                    "source": 'function process(event)\n  return event\nend',
                }
            },
            "sinks": {"out": {"type": "memory", "inputs": ["script"]}},
        }
    )
    with pytest.raises(PipelineError, match="[Ll]ua"):
        p.test(spark, [{"message": "x"}])


def test_console_sink_encoding_codecs(spark):
    """console sink encoding.codec ∈ {json, text, logfmt} — logfmt quotes
    values with spaces/quotes/equals and omits NULL fields."""
    from vector_spark.plans.sinks import console_sink

    df = spark.createDataFrame(
        [("hello world", "error", 7, None)],
        "message string, level string, n int, extra string",
    )
    js = console_sink(df)
    assert js[0]["message"] == "hello world"
    txt = console_sink(df, codec="text")
    assert txt == ["hello world"]
    lf = console_sink(df, codec="logfmt")
    assert lf == ['message="hello world" level=error n=7']


def test_logfmt_escapes_and_unknown_codec(spark):
    """logfmt quotes any whitespace (incl. newlines — one event stays one
    line), escapes backslashes before quotes; unknown codec raises."""
    from vector_spark.plans.sinks import console_sink

    df = spark.createDataFrame(
        [("line1\nline2", 'a "b\\', "plain")], "m string, q string, p string"
    )
    (line,) = console_sink(df, codec="logfmt")
    assert "\n" not in line                       # folded to \n escape
    assert line == 'm="line1\\nline2" q="a \\"b\\\\" p=plain'
    with pytest.raises(ValueError, match="unknown console encoding"):
        console_sink(df, codec="logmft")


def test_file_sink_logfmt_codec(spark, tmp_path):
    from vector_spark.plans.sinks import file_sink

    df = spark.createDataFrame(
        [("hello world", "error", "a")], "message string, level string, part string"
    )
    out = str(tmp_path / "lf")
    file_sink(df, out, codec="logfmt", partition_by=["part"])
    lines = [r.value for r in spark.read.text(f"{out}/part=a").collect()]
    assert lines == ['message="hello world" level=error']


def test_telemetry_source_types_compile(spark, tmp_path):
    """host_metrics / prometheus_scrape / opentelemetry source types compile
    from TOML and produce typed rows (config_panel.rs:1290-1415 palette)."""
    import json

    (tmp_path / "loadavg").write_text("0.10 0.20 0.30 1/2 3\n")
    (tmp_path / "uptime").write_text("100.0 200.0\n")
    otlp_body = json.dumps({
        "resourceLogs": [{
            "resource": {"attributes": []},
            "scopeLogs": [{
                "scope": {"name": "s"},
                "logRecords": [{
                    "timeUnixNano": "1700000000000000000",
                    "severityText": "Info",
                    "body": {"stringValue": "hi"},
                    "attributes": [],
                }],
            }],
        }]
    })
    toml = f"""
[sources.host]
type = "host_metrics"
collectors = ["load", "uptime"]
proc_root = "{tmp_path}"

[sources.otel]
type = "opentelemetry"
events = ['{otlp_body.replace("'", "''")}']

[sinks.host_out]
type = "console"
inputs = ["host"]

[sinks.otel_out]
type = "console"
inputs = ["otel"]
"""
    outs = Pipeline.from_toml(toml).build(spark)
    host_rows = {r["name"]: r["value"] for r in outs["host_out"].collect()}
    assert host_rows["load5"] == pytest.approx(0.20)
    assert host_rows["uptime_seconds"] == pytest.approx(100.0)
    otel_rows = outs["otel_out"].collect()
    assert len(otel_rows) == 1 and otel_rows[0]["body"] == "hi"


def test_opentelemetry_source_signal_option(spark):
    """signal = traces|metrics routes the body to the right OTLP parser;
    an unknown signal is a validation error, not a silent logs parse."""
    import json

    trace_body = json.dumps({
        "resourceSpans": [{
            "resource": {"attributes": []},
            "scopeSpans": [{
                "scope": {"name": "t"},
                "spans": [{
                    "traceId": "0af7651916cd43dd8448eb211c80319c",
                    "spanId": "b7ad6b7169203331",
                    "name": "GET /x",
                    "kind": 2,
                    "startTimeUnixNano": "1700000000000000000",
                    "endTimeUnixNano": "1700000000500000000",
                }],
            }],
        }]
    })
    toml = f"""
[sources.otel]
type = "opentelemetry"
signal = "traces"
events = ['{trace_body}']

[sinks.out]
type = "console"
inputs = ["otel"]
"""
    rows = Pipeline.from_toml(toml).build(spark)["out"].collect()
    assert len(rows) == 1
    assert rows[0]["span_id"] == "b7ad6b7169203331"
    assert rows[0]["duration_us"] == 500_000

    bad = toml.replace('signal = "traces"', 'signal = "profiles"')
    with pytest.raises(PipelineError, match="signal"):
        Pipeline.from_toml(bad).build(spark)


def test_prometheus_scrape_source_requires_endpoints():
    toml = """
[sources.prom]
type = "prometheus_scrape"

[sinks.out]
type = "console"
inputs = ["prom"]
"""
    import vector_spark.session as sess

    with pytest.raises(PipelineError, match="endpoints"):
        Pipeline.from_toml(toml).build(sess.get_spark())


def test_console_csv_codec(spark):
    from vector_spark.plans.sinks import console_sink

    df = spark.createDataFrame(
        [(1, 'say "hi", ok'), (2, "plain")], "id int, msg string"
    )
    lines = console_sink(df.orderBy("id"), codec="csv")
    assert lines == ['1,"say \\"hi\\", ok"', "2,plain"]


def test_multiline_stage_rejects_ambiguous_patterns(spark):
    """Both start_pattern and condition_pattern without an explicit mode is
    ambiguous — refused, never guessed (guessing inverts segmentation)."""
    import pytest

    from vector_spark.plans.pipeline import Pipeline, PipelineError

    toml = """
[sources.s]
type = "demo_logs"
format = "shuffle"
lines = ["2024-01-01 head", "  tail"]
count = 10

[transforms.m]
type = "multiline"
inputs = ["s"]
start_pattern = '^\\d{4}-'
condition_pattern = '^\\s'

[sinks.out]
type = "console"
inputs = ["m"]
"""
    p = Pipeline.from_toml(toml)
    with pytest.raises(PipelineError, match="mode"):
        p.run(spark)
    # explicit mode resolves it — and picks the MATCHING pattern
    ok = Pipeline.from_toml(toml.replace(
        "condition_pattern = '^\\s'", "condition_pattern = '^\\s'\nmode = 'start_pattern'"
    ))
    assert ok.run(spark)["out"]
