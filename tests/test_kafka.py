"""Kafka source/sink: config → plan compilation, wire-schema decode/encode.

The sandbox has no broker and no spark-sql-kafka jar, so connector `.load()`
/`.start()` calls are exercised only when $KAFKA_BOOTSTRAP is set; everything
with data semantics (option resolution from the reference's config forms,
value decode, key_field encode + repartition) runs against static frames.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from vector_spark.plans.pipeline import Pipeline
from vector_spark.streaming import kafka as K


def _wire_df(spark, payloads, topic="logs"):
    """Static frame in the documented kafka source wire schema."""
    rows = [
        (
            None,
            json.dumps(p).encode(),
            topic,
            0,
            i,
            dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc),
            0,
        )
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int",
    )


def test_source_plan_from_reference_form_defaults():
    plan = K.source_plan_from_options({})
    assert plan.bootstrap_servers == "localhost:9092"  # config_panel.rs:1023
    assert plan.topics == "logs"
    assert plan.group_id == "vector"  # config_panel.rs:1036
    assert plan.options["subscribe"] == "logs"
    assert plan.options["kafka.bootstrap.servers"] == "localhost:9092"


def test_source_plan_topics_list_joined():
    plan = K.source_plan_from_options(
        {"topics": ["logs", "events"], "bootstrap_servers": "b:9092", "group_id": "g1"}
    )
    assert plan.options == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "logs,events",
        "kafka.group.id": "g1",
        "startingOffsets": "earliest",
    }


def test_sink_plan_from_reference_form():
    plan = K.sink_plan_from_options(
        {
            "bootstrap_servers": "b:9092",
            "topic": "out",
            "key_field": ".host",
            "encoding": {"codec": "json"},
        }
    )
    assert plan.options == {"kafka.bootstrap.servers": "b:9092", "topic": "out"}
    assert plan.key_field == ".host"
    assert plan.codec == "json"


def test_decode_json_value(spark):
    raw = _wire_df(spark, [{"message": "hello", "level": "info"}, {"message": "x", "level": "warn"}])
    out = K.decode_kafka_value(raw, "json", "message string, level string")
    rows = out.orderBy("_offset").collect()
    assert [r.message for r in rows] == ["hello", "x"]
    assert [r.level for r in rows] == ["info", "warn"]
    assert rows[0]._topic == "logs" and rows[0]._offset == 0


def test_decode_text_value(spark):
    raw = _wire_df(spark, ["plain"])  # json.dumps("plain") → "\"plain\""
    out = K.decode_kafka_value(raw, "text")
    assert out.collect()[0].message == '"plain"'


def test_encode_key_field_partitions_by_key(spark):
    df = spark.createDataFrame(
        [("h1", "a"), ("h2", "b"), ("h1", "c")], "host string, message string"
    )
    wire = K.encode_kafka_records(df, key_field=".host", codec="json")
    assert wire.columns == ["key", "value"]
    rows = wire.collect()
    assert {r.key for r in rows} == {"h1", "h2"}
    assert all(json.loads(r.value)["host"] == r.key for r in rows)
    # key_field ⇒ hash-partitioned on key: equal keys share a partition
    parts = (
        wire.withColumn("pid", F.spark_partition_id())
        .groupBy("key")
        .agg(F.count_distinct("pid").alias("n"))
        .collect()
    )
    assert all(r.n == 1 for r in parts)
    # and the plan really contains the repartition exchange
    assert "hashpartitioning(key" in wire._jdf.queryExecution().toString().lower()


def test_encode_without_key_is_round_robin_null_key(spark):
    df = spark.createDataFrame([("a",)], "message string")
    wire = K.encode_kafka_records(df, key_field=None, codec="text")
    r = wire.collect()[0]
    assert r.key is None and r.value == "a"


def test_pipeline_toml_with_kafka_builds_and_validates(spark):
    toml_text = """
[sources.ingest]
type = "kafka"
bootstrap_servers = "broker:9092"
topics = ["logs", "events"]
group_id = "vector"

[transforms.errors_only]
type = "filter"
inputs = ["ingest"]
condition = '.level == "error"'

[sinks.out]
type = "kafka"
inputs = ["errors_only"]
bootstrap_servers = "broker:9092"
topic = "errors"
key_field = ".host"
"""
    p = Pipeline.from_toml(toml_text)
    assert p.validate() == []  # full kafka config: no warnings, no errors
    # functional-test mode: source overridden with sample events, sinks
    # collected — the kafka config compiles into the DAG without a broker
    res = p.test(
        spark,
        [
            {"host": "h1", "level": "error", "message": "boom"},
            {"host": "h2", "level": "info", "message": "ok"},
        ],
    )
    assert res["output_count"] == 1
    assert res["dropped_count"] == 1
    assert res["output_events"][0]["host"] == "h1"


def test_pipeline_kafka_source_without_connector_raises_clearly(spark):
    p = Pipeline.from_dict(
        {
            "sources": {"k": {"type": "kafka", "topics": "logs"}},
            "sinks": {"c": {"type": "console", "inputs": ["k"]}},
        }
    )
    assert p.validate() == []
    from vector_spark.plans.pipeline import PipelineError

    with pytest.raises(PipelineError, match="kafka source 'k' compiled"):
        p.build(spark)


@pytest.mark.skipif(
    not os.environ.get("KAFKA_BOOTSTRAP"),
    reason="integration: needs a reachable broker + spark-sql-kafka jar",
)
def test_kafka_roundtrip_integration(spark):
    servers = os.environ["KAFKA_BOOTSTRAP"]
    src = K.KafkaSourcePlan(bootstrap_servers=servers, topics="vs_it", value_schema="message string")
    sink = K.KafkaSinkPlan(bootstrap_servers=servers, topic="vs_it", key_field="message")
    df = spark.createDataFrame([("hello",)], "message string")
    sink.start(df)
    got = src.load(spark, streaming=False).select("message").collect()
    assert ("hello",) in {tuple(r) for r in got}
