"""Kafka source + sink — compiled from the reference's config forms.

Reference semantics:
  * source form (ui/src/components/pipeline/config_panel.rs:1020-1040):
    ``bootstrap_servers`` (default localhost:9092), ``topics`` (comma list,
    placeholder "logs,events"), ``group_id`` (default "vector").
  * sink form (config_panel.rs:2040-2084): ``bootstrap_servers``, ``topic``,
    ``key_field`` — "Event field to use as partition key (optional)"
    (:2068-2073) — and ``encoding.codec`` ∈ {json, text}.

Spark mapping:
  * source → ``spark.readStream.format("kafka")`` with ``subscribe`` +
    ``kafka.bootstrap.servers`` + ``kafka.group.id``; the value bytes decode
    via :func:`decode_kafka_value` (the ``decoding.codec = json`` analog).
  * sink → project to (key, value) wire columns via
    :func:`encode_kafka_records` — ``key_field`` becomes the Kafka message
    key, which IS the partition key under Kafka's default partitioner — then
    ``repartition(key)`` so one Spark task produces each key's records
    (per-key ordering preserved end to end), and
    ``writeStream.format("kafka")``.

The sandbox ships no Kafka broker and no spark-sql-kafka connector jar, so
``load()``/``start()`` would fail at ANALYSIS time here.  The public API
therefore splits compile from launch: :class:`KafkaSourcePlan` /
:class:`KafkaSinkPlan` hold the fully-resolved format + options (unit-testable,
and what the pipeline compiler validates), while ``.load()`` / ``.start()``
perform the real connector calls — gated behind a reachable broker
($KAFKA_BOOTSTRAP in integration runs).

The wire-schema projections (decode/encode) are plain DataFrame transforms
over the documented Kafka source schema (key/value binary, topic, partition,
offset, timestamp) and are tested against static frames — the part with data
semantics has full coverage; only the socket to a broker is deferred.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: the fixed schema ``spark.read.format("kafka")`` produces (Spark docs —
#: Structured Streaming + Kafka integration guide); decode/encode are written
#: (and tested) against this shape.
KAFKA_WIRE_COLUMNS = [
    "key", "value", "topic", "partition", "offset", "timestamp", "timestampType",
]


# ----------------------------------------------------------------- decode

def decode_kafka_value(
    raw: DataFrame,
    codec: str = "json",
    schema: str | None = None,
) -> DataFrame:
    """Kafka wire rows → event rows (source-side ``decoding.codec`` analog).

    codec="json": parse the value bytes as a JSON object into typed columns
    (``schema`` is the DDL string, e.g. ``"message string, level string"``);
    kafka metadata survives as _topic/_partition/_offset/_kafka_ts.
    codec="bytes"/"text": value as one string ``message`` column.
    """
    meta = [
        F.col("topic").alias("_topic"),
        F.col("partition").alias("_partition"),
        F.col("offset").alias("_offset"),
        F.col("timestamp").alias("_kafka_ts"),
    ]
    val = F.col("value").cast("string")
    if codec == "json":
        if not schema:
            raise ValueError("codec='json' needs a DDL schema for the value object")
        parsed = F.from_json(val, schema)
        return raw.select(parsed.alias("_e"), *meta).select(
            "_e.*", "_topic", "_partition", "_offset", "_kafka_ts"
        )
    if codec in ("bytes", "text"):
        return raw.select(val.alias("message"), *meta)
    raise ValueError(f"unsupported decoding codec {codec!r}")


# ----------------------------------------------------------------- encode

def encode_kafka_records(
    df: DataFrame,
    key_field: str | None = None,
    codec: str = "json",
    text_field: str = "message",
) -> DataFrame:
    """Event rows → Kafka (key, value) wire rows (sink-side encoding).

    ``key_field`` (reference :2068-2073) becomes the message key — Kafka's
    default partitioner hashes it, so equal keys land on one Kafka partition;
    we additionally ``repartition`` on it so each key is produced by a single
    Spark task and per-key order is preserved.  No key_field → round-robin
    (null key), no repartition needed.
    """
    key_col: Column | None = None
    if key_field:
        key_col = F.col(key_field.lstrip(".")).cast("string")
    if codec == "json":
        value = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    elif codec == "text":
        value = F.col(text_field).cast("string")
    else:
        raise ValueError(f"unsupported encoding codec {codec!r}")
    if key_col is not None:
        out = df.select(key_col.alias("key"), value.alias("value"))
        return out.repartition(F.col("key"))
    return df.select(F.lit(None).cast("string").alias("key"), value.alias("value"))


# ------------------------------------------------------------------- plans

@dataclass
class KafkaSourcePlan:
    """Fully-resolved source config; ``.load(spark)`` does the connector call."""

    bootstrap_servers: str = "localhost:9092"
    topics: str = "logs"
    group_id: str = "vector"
    starting_offsets: str = "earliest"
    codec: str = "json"
    value_schema: str | None = None
    format: str = field(default="kafka", init=False)

    @property
    def options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": self.topics,
            "kafka.group.id": self.group_id,
            "startingOffsets": self.starting_offsets,
        }

    def load(self, spark: SparkSession, streaming: bool = True) -> DataFrame:
        reader = (spark.readStream if streaming else spark.read).format(self.format)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        raw = reader.load()
        return decode_kafka_value(raw, self.codec, self.value_schema)


@dataclass
class KafkaSinkPlan:
    """Fully-resolved sink config; ``.start(df)`` does the connector call."""

    bootstrap_servers: str = "localhost:9092"
    topic: str = ""
    key_field: str | None = None
    codec: str = "json"
    format: str = field(default="kafka", init=False)

    @property
    def options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "topic": self.topic,
        }

    def encode(self, df: DataFrame) -> DataFrame:
        return encode_kafka_records(df, self.key_field, self.codec)

    def start(self, df: DataFrame, checkpoint_dir: str | None = None):
        """Streaming df → writeStream.start(); batch df → write.save()."""
        wire = self.encode(df)
        if df.isStreaming:
            writer = wire.writeStream.format(self.format)
            for k, v in self.options.items():
                writer = writer.option(k, v)
            if checkpoint_dir:
                writer = writer.option("checkpointLocation", checkpoint_dir)
            return writer.start()
        writer = wire.write.format(self.format)
        for k, v in self.options.items():
            writer = writer.option(k, v)
        return writer.save()


# --------------------------------------------------------- config front-end

def source_plan_from_options(options: dict) -> KafkaSourcePlan:
    """Reference source form → plan (defaults per config_panel.rs:1020-1040)."""
    topics = options.get("topics", "logs")
    if isinstance(topics, (list, tuple)):
        topics = ",".join(topics)
    decoding = options.get("decoding") or {}
    return KafkaSourcePlan(
        bootstrap_servers=options.get("bootstrap_servers", "localhost:9092"),
        topics=topics,
        group_id=options.get("group_id", "vector"),
        starting_offsets=options.get("starting_offsets", "earliest"),
        codec=decoding.get("codec", options.get("codec", "json")),
        value_schema=options.get("value_schema"),
    )


def sink_plan_from_options(options: dict) -> KafkaSinkPlan:
    """Reference sink form → plan (defaults per config_panel.rs:2040-2084)."""
    encoding = options.get("encoding") or {}
    return KafkaSinkPlan(
        bootstrap_servers=options.get("bootstrap_servers", "localhost:9092"),
        topic=options.get("topic", ""),
        key_field=options.get("key_field") or None,
        codec=encoding.get("codec", options.get("codec", "json")),
    )
