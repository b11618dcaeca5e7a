"""The shipped example pipelines run verbatim (docs that cannot rot)."""

from __future__ import annotations

import shutil

from vector_spark.plans.pipeline import Pipeline


def test_observability_example_runs(spark):
    shutil.rmtree("/tmp/vector_spark_example", ignore_errors=True)
    p = Pipeline.from_toml(open("examples/observability.toml").read())
    assert [i for i in p.validate() if i.severity == "error"] == []
    res = p.run(spark)

    es = spark.read.parquet("/tmp/vector_spark_example/es")
    assert es.count() > 0
    assert all(r._index.startswith("errors-") for r in es.select("_index").distinct().collect())
    assert es.filter("status < 500").count() == 0

    loki = spark.read.parquet("/tmp/vector_spark_example/loki")
    assert loki.count() > 0
    assert loki.filter("status >= 500 or status < 400").count() == 0
    assert {r.env for r in loki.select("env").distinct().collect()} == {"demo"}

    metrics = {r["name"]: r for r in res["metrics_out"]}
    assert any(k == "errors_total" for k in metrics)
    assert any(k == "error_bytes" for k in metrics)


def test_edge_parse_example_runs(spark):
    """Round-3 surface as one runnable pipeline: grok remap + lua-slot hook
    + logfmt console sink."""
    from vector_spark.operators import register_map_hook

    register_map_hook(
        "edge_tag_batch", lambda pdf: pdf.assign(message=pdf.message.str.lower())
    )
    p = Pipeline.from_toml(open("examples/edge_parse.toml").read())
    assert [i for i in p.validate() if i.severity == "error"] == []
    res = p.run(spark)

    lines = res["out"]
    assert lines and all(isinstance(l, str) for l in lines)
    # the grok map rendered through logfmt, and the lua-slot hook really ran
    # (messages lowercased batch-wise before the filter)
    assert all("req=" in l for l in lines)
    assert all(("status -> 5" in l) or ("status -> 4" in l) for l in lines)
    # hook ran: the raw message is lowercased ("delete /login" etc.), while
    # the grok map (extracted before the hook) keeps the original case
    assert any('\\"delete' in l or '\\"post' in l or '\\"get' in l for l in lines)


def test_webcorpus_curation_example_runs(spark):
    """The end-to-end curation walkthrough executes and the funnel is
    sane: quality filtering and sampling shrink the corpus, survivors
    carry metadata + feature columns."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "examples", "webcorpus_curation.py")
    spec = importlib.util.spec_from_file_location("webcorpus_curation", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    stages = mod.curate(spark, 400)
    n0 = stages["url_canonical"].count()
    nq = stages["quality_filtered"].count()
    nf = stages["final"].count()
    assert n0 == 400 and 0 < nq <= n0 and 0 < nf <= nq
    cols = set(stages["final"].columns)
    assert {"doc_id", "url", "lang", "lang_pred", "n_tokens", "dup_line_frac"} <= cols


def test_multiline_example_runs(spark):
    """Round-5 multiline transform as config: demo_logs line pool →
    assemble → whole-event filter → logfmt console."""
    p = Pipeline.from_toml(open("examples/multiline_logs.toml").read())
    assert [i for i in p.validate() if i.severity == "error"] == []
    out = p.run(spark)["out"]
    assert out, "no assembled events"
    # logfmt lines carry the assembled whole-event message: every emitted
    # event is headed by an ERROR line, and any continuation frames rode
    # along inside the same event (newline-folded by the logfmt encoder)
    assert all("ERROR" in line for line in out)
    assert any(r"\n  at frame." in line for line in out)


def test_telemetry_walkthrough_runs(spark):
    """The telemetry walkthrough executes end to end and each stage's
    output is sane."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "telemetry_walkthrough.py"
    )
    spec = importlib.util.spec_from_file_location("telemetry_walkthrough", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.run(spark, 2000)
    n_parsed = out["parsed"].count()
    assert n_parsed == 2000  # every raw event survives assembly+parse
    # stack traces folded: 1/5 of events carry 3 lines
    assert out["events"].filter("n_lines = 3").count() == 400
    assert out["latency"].count() > 0
    assert out["daily_users"].count() > 0
    # distinct-user estimate is exact at this cardinality (97 users spread
    # over 20 hosts; each host sees eids ≡ host (mod 20))
    import pyspark.sql.functions as F

    total = out["daily_users"].agg(F.sum("n")).collect()[0][0]
    assert total == 2000
    assert out["slo"].count() > 0  # keep_all backtest rows exist
    # same level-shapes on both halves → nothing emerges
    assert out["emerging"].count() == 0
