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
