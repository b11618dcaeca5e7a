"""Object-store ingest: prefix scans, gzip transparency, per-object
metadata, and the SQS-notification at-least-once loop — all through the
Hadoop FileSystem API on file:// (the same code path an s3a:// bucket
takes on a cluster)."""

from __future__ import annotations

import gzip
import json

import pytest

from vector_spark.sources.object_store import (
    NotificationQueue,
    list_objects,
    object_source,
    s3_sqs_source,
)


@pytest.fixture(scope="module")
def bucket(tmp_path_factory):
    """A 'bucket' of gzipped + plain ndjson objects under dated prefixes."""
    root = tmp_path_factory.mktemp("bucket")
    (root / "logs/2026/01").mkdir(parents=True)
    (root / "logs/2026/02").mkdir(parents=True)
    (root / "other").mkdir()
    rows1 = [{"k": i, "msg": f"jan-{i}"} for i in range(10)]
    rows2 = [{"k": 100 + i, "msg": f"feb-{i}"} for i in range(5)]
    with gzip.open(root / "logs/2026/01/a.ndjson.gz", "wt") as f:
        f.writelines(json.dumps(r) + "\n" for r in rows1)
    (root / "logs/2026/02/b.ndjson").write_text(
        "".join(json.dumps(r) + "\n" for r in rows2)
    )
    (root / "other/ignore.txt").write_text("nope\n")
    return str(root)


def test_list_objects_prefix_suffix(spark, bucket):
    objs = list_objects(spark, bucket, prefix="logs")
    assert [o["key"] for o in objs] == [
        "logs/2026/01/a.ndjson.gz", "logs/2026/02/b.ndjson",
    ]
    assert all(o["size"] > 0 and o["mtime_ms"] > 0 for o in objs)
    gz = list_objects(spark, bucket, prefix="logs", suffix=".gz")
    assert [o["key"] for o in gz] == ["logs/2026/01/a.ndjson.gz"]
    assert list_objects(spark, bucket, prefix="nosuch") == []


def test_object_source_gzip_json_metadata(spark, bucket):
    df = object_source(
        spark, bucket, prefix="logs", codec="json", schema="k int, msg string"
    )
    rows = df.orderBy("k").collect()
    # gzip object decompressed transparently, both objects decoded
    assert [r["k"] for r in rows] == list(range(10)) + [100 + i for i in range(5)]
    jan = [r for r in rows if r["k"] < 100]
    assert {r["key"] for r in jan} == {"logs/2026/01/a.ndjson.gz"}
    assert all(r["bucket"] == bucket for r in rows)
    assert all(r["object_size"] > 0 and r["last_modified"] is not None for r in rows)


def test_object_source_missing_prefix_raises(spark, bucket):
    with pytest.raises(FileNotFoundError):
        object_source(spark, bucket, prefix="nosuch")


def test_sqs_notification_loop_at_least_once(spark, bucket, tmp_path_factory):
    queue_dir = str(tmp_path_factory.mktemp("queue"))
    q = NotificationQueue(spark, queue_dir)
    # producer: S3 notifies per created object (keys URL-encoded on the wire)
    q.send(bucket, ["logs/2026/01/a.ndjson.gz"], "msg-001")
    q.send(bucket, ["logs/2026/02/b.ndjson"], "msg-002")

    df, notes, queue = s3_sqs_source(
        spark, bucket, queue_dir, codec="json", schema="k int, msg string"
    )
    assert len(notes) == 2
    got = sorted(r["k"] for r in df.collect())
    assert got == list(range(10)) + [100, 101, 102, 103, 104]

    # un-acked messages are redelivered (visibility-timeout semantics)
    df2, notes2, _ = s3_sqs_source(
        spark, bucket, queue_dir, codec="json", schema="k int, msg string"
    )
    assert {n.handle for n in notes2} == {n.handle for n in notes}

    # ack after successful delivery → queue drains, next poll is empty
    queue.ack(notes)
    df3, notes3, _ = s3_sqs_source(spark, bucket, queue_dir, codec="json")
    assert df3 is None and notes3 == []


def test_url_encoded_keys_decode(spark, bucket, tmp_path_factory):
    import gzip as _g
    import os

    root = str(tmp_path_factory.mktemp("enc_bucket"))
    os.makedirs(f"{root}/a=b")
    with open(f"{root}/a=b/x y.ndjson", "w") as f:
        f.write('{"k": 7}\n')
    queue_dir = str(tmp_path_factory.mktemp("enc_queue"))
    q = NotificationQueue(spark, queue_dir)
    q.send(root, ["a=b/x y.ndjson"], "m1")  # sent URL-encoded on the wire
    raw = json.loads(open(f"{queue_dir}/m1.json").read())
    assert raw["Records"][0]["s3"]["object"]["key"] == "a%3Db/x+y.ndjson"
    df, notes, _ = s3_sqs_source(spark, root, queue_dir, codec="json", schema="k int")
    assert [r["k"] for r in df.collect()] == [7]


def test_toml_pipeline_dispatch(spark, bucket, tmp_path):
    """[sources.s3] type=aws_s3 bucket=… key_prefix=… flows through the
    pipeline compiler like any other source."""
    from vector_spark.plans.pipeline import Pipeline

    toml = f"""
[sources.s3]
type = "aws_s3"
bucket = "{bucket}"
key_prefix = "logs"
decoding_schema = "k int, msg string"

[sources.s3.decoding]
codec = "json"

[transforms.big]
type = "filter"
inputs = ["s3"]
condition = ".k >= 100"

[sinks.out]
type = "memory"
inputs = ["big"]
"""
    df = Pipeline.from_toml(toml).build(spark)["out"]
    assert sorted(r["k"] for r in df.collect()) == [100, 101, 102, 103, 104]


def test_sqs_cross_bucket_and_traversal_keys(spark, bucket, tmp_path_factory):
    """Notifications for ANOTHER bucket are skipped (never read a same-named
    key from ours); traversal keys are refused loudly; a legal
    leading-slash key stays inside the bucket."""
    queue_dir = str(tmp_path_factory.mktemp("queue_x"))
    q = NotificationQueue(spark, queue_dir)
    q.send("some-other-bucket", ["logs/2026/01/a.ndjson.gz"], "msg-x1")
    df, notes, queue = s3_sqs_source(
        spark, bucket, queue_dir, codec="json", schema="k int, msg string"
    )
    assert df is None and len(notes) == 1  # polled, nothing of ours to read
    queue.ack(notes)

    # leading-slash key: resolves INSIDE the bucket (S3 allows such keys)
    q.send(bucket, ["/logs/2026/02/b.ndjson"], "msg-x2")
    df2, notes2, queue = s3_sqs_source(
        spark, bucket, queue_dir, codec="json", schema="k int, msg string"
    )
    assert sorted(r["k"] for r in df2.collect()) == [100, 101, 102, 103, 104]
    queue.ack(notes2)

    q.send(bucket, ["../../etc/passwd"], "msg-x3")
    with pytest.raises(ValueError, match="traversal"):
        s3_sqs_source(spark, bucket, queue_dir, codec="json")
