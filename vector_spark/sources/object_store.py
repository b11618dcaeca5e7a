"""Object-store sources: aws_s3 / gcp_cloud_storage scans and the
SQS-event-notification ingest loop.

Reference surface: the `aws_s3` component (bucket + key_prefix,
ui/src/components/pipeline/config_panel.rs:2088-2123) and the `aws_sqs`
source ("Receive from SQS queues", ui/src/components/pipeline/
palette.rs:96).  Vector's canonical S3 ingest couples the two: S3 emits
`s3:ObjectCreated:*` event notifications to an SQS queue; the source polls
the queue, fetches each referenced object, splits it into events
(decompressing by extension), and deletes the message only after the events
are delivered — at-least-once end to end.

Spark-first shape:

  * Listing goes through the JVM Hadoop FileSystem API, so ONE code path
    serves file://, hdfs://, s3a://, gs://… — locally it is exercised on
    file:// (no object store in this sandbox), on a cluster the same calls
    hit the real store.  Listing is driver-side (exactly like Spark's own
    InMemoryFileIndex); the data read is fully distributed.
  * Reads use `spark.read.text`/`binaryFile` over the explicit object list:
    one task per file split, gzip decompressed transparently by the codec
    inference Spark already ships, per-object metadata (bucket / key /
    size / last-modified) taken from the `_metadata` struct so it costs
    nothing when unused (column pruning drops it at the scan).
  * The queue is a directory of S3 event-notification JSON documents (the
    public, stable AWS schema — Records[].s3.bucket.name / object.key with
    URL-encoded keys).  `poll` is bounded (`max_messages`), `ack` deletes
    through the same FileSystem API; a message that fails before ack is
    re-polled next cycle, which is exactly SQS visibility-timeout redelivery
    at-least-once semantics.

At 10^12-document scale the SQS path is the right shape: each poll handles a
bounded batch of new objects (no full-bucket relist), and the full-scan path
(`object_source` over a prefix) remains a single distributed Spark scan.
"""

from __future__ import annotations

import json
import logging
import posixpath
from dataclasses import dataclass
from urllib.parse import unquote_plus

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)


# --- Hadoop FileSystem plumbing (scheme-agnostic) ---------------------------

def _fs_and_path(spark: SparkSession, uri: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(uri)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def list_objects(
    spark: SparkSession,
    root: str,
    prefix: str = "",
    suffix: str = "",
    recursive: bool = True,
) -> list[dict]:
    """Bounded driver-side listing: [{path,key,size,mtime_ms}] under
    root/prefix.  `key` is the bucket-relative object key (S3 vocabulary)."""
    base = root.rstrip("/")
    fs, p = _fs_and_path(spark, base + ("/" + prefix.lstrip("/") if prefix else ""))
    out: list[dict] = []
    if not fs.exists(p):
        return out
    it = fs.listFiles(p, recursive)
    base_uri = fs.makeQualified(_fs_and_path(spark, base)[1]).toString()
    while it.hasNext():
        st = it.next()
        path = st.getPath().toString()
        if suffix and not path.endswith(suffix):
            continue
        key = path[len(base_uri):].lstrip("/") if path.startswith(base_uri) else path
        out.append(
            {"path": path, "key": key, "size": st.getLen(), "mtime_ms": st.getModificationTime()}
        )
    out.sort(key=lambda o: o["path"])
    return out


def _read_objects(
    spark: SparkSession,
    paths: list[str],
    bucket: str,
    codec: str = "text",
    schema=None,
    framing: str | None = None,
    framing_delimiter: str = ",",
) -> DataFrame:
    """Distributed read of an explicit object list with per-object metadata
    columns (bucket, key, object_size, last_modified)."""
    from vector_spark.sources import codecs as codecs_mod

    bucket_uri = bucket.rstrip("/")
    meta = [
        F.lit(bucket_uri).alias("bucket"),
        F.regexp_replace(
            F.col("_metadata.file_path"), F.lit(_qualified_prefix_re(spark, bucket_uri)), ""
        ).alias("key"),
        F.col("_metadata.file_size").alias("object_size"),
        F.col("_metadata.file_modification_time").alias("last_modified"),
    ]
    if framing and framing not in ("bytes", "newline_delimited"):
        raw = (
            spark.read.format("binaryFile")
            .load(paths)
            .select(F.col("content").alias("value"), *meta)
        )
        framed = codecs_mod.frame_stream(raw, framing, delimiter=framing_delimiter)
        if codec in ("text", "bytes"):
            return framed
        return codecs_mod.decode_events(framed, codec, schema=schema)
    lines = spark.read.text(paths).select(
        F.col("value").alias("message"), *meta
    )
    if codec in ("text", "bytes"):
        return lines
    return codecs_mod.decode_events(lines, codec, schema=schema)


def _qualified_prefix_re(spark: SparkSession, bucket_uri: str) -> str:
    """Regex matching the fully-qualified bucket prefix in _metadata.file_path
    (which is always scheme-qualified, e.g. file:/tmp/b/ for /tmp/b)."""
    import re as _re

    fs, p = _fs_and_path(spark, bucket_uri)
    q = fs.makeQualified(p).toString()
    return "^" + _re.escape(q) + "/?"


def object_source(
    spark: SparkSession,
    bucket: str,
    prefix: str = "",
    suffix: str = "",
    codec: str = "text",
    schema=None,
    framing: str | None = None,
    framing_delimiter: str = ",",
) -> DataFrame:
    """Full-prefix scan of an object-store bucket (aws_s3 / gcp analog):
    lists under bucket/prefix, reads distributed, gzip transparent."""
    objs = list_objects(spark, bucket, prefix=prefix, suffix=suffix)
    if not objs:
        raise FileNotFoundError(f"no objects under {bucket}/{prefix}")
    return _read_objects(
        spark, [o["path"] for o in objs], bucket,
        codec=codec, schema=schema, framing=framing,
        framing_delimiter=framing_delimiter,
    )


# --- SQS event-notification ingest ------------------------------------------

@dataclass(frozen=True)
class Notification:
    """One queue message: its handle (for ack), the object keys it names,
    and the bucket each key belongs to (parallel to ``keys``; "" when the
    message omits it)."""

    handle: str
    keys: tuple[str, ...]
    buckets: tuple[str, ...] = ()


class NotificationQueue:
    """Directory-of-JSON-documents analog of an SQS queue carrying S3 event
    notifications.  Messages are the public AWS schema; keys arrive
    URL-encoded and are decoded with unquote_plus (the S3 quirk)."""

    def __init__(self, spark: SparkSession, queue_dir: str):
        self.spark = spark
        self.queue_dir = queue_dir.rstrip("/")

    def send(self, bucket_name: str, keys: list[str], message_id: str) -> None:
        """Test/producer helper: enqueue an ObjectCreated notification."""
        from urllib.parse import quote_plus

        body = {
            "Records": [
                {
                    "eventName": "ObjectCreated:Put",
                    "s3": {
                        "bucket": {"name": bucket_name},
                        "object": {"key": quote_plus(k, safe="/")},
                    },
                }
                for k in keys
            ]
        }
        fs, _ = _fs_and_path(self.spark, self.queue_dir)
        path = f"{self.queue_dir}/{message_id}.json"
        out = fs.create(_fs_and_path(self.spark, path)[1], True)
        try:
            out.write(bytearray(json.dumps(body).encode()))
        finally:
            out.close()

    def poll(self, max_messages: int = 10) -> list[Notification]:
        """Read up to max_messages notifications (oldest first).  Does NOT
        remove them — redelivery until ack, like SQS visibility timeout."""
        msgs = list_objects(self.spark, self.queue_dir, suffix=".json")
        msgs.sort(key=lambda m: (m["mtime_ms"], m["path"]))
        out: list[Notification] = []
        from vector_spark.functions.similarity import _hadoop_read_text

        for m in msgs[:max_messages]:
            doc = json.loads(_hadoop_read_text(self.spark, m["path"]))
            recs = [
                r for r in doc.get("Records", [])
                if str(r.get("eventName", "")).startswith("ObjectCreated")
            ]
            keys = tuple(unquote_plus(r["s3"]["object"]["key"]) for r in recs)
            buckets = tuple(
                str(r["s3"].get("bucket", {}).get("name", "")) for r in recs
            )
            if keys:
                out.append(Notification(handle=m["path"], keys=keys, buckets=buckets))
        return out

    def ack(self, notifications: list[Notification]) -> None:
        """Delete processed messages (the post-delivery SQS DeleteMessage)."""
        for n in notifications:
            fs, p = _fs_and_path(self.spark, n.handle)
            fs.delete(p, False)


def s3_sqs_source(
    spark: SparkSession,
    bucket: str,
    queue_dir: str,
    codec: str = "text",
    schema=None,
    max_messages: int = 10,
):
    """Vector's aws_s3-with-SQS flow: poll notifications, read exactly the
    referenced objects (distributed), return (DataFrame, notifications,
    queue).  Caller acks AFTER its sink write succeeds — at-least-once.

    Returns (None, [], queue) when the queue is empty."""
    queue = NotificationQueue(spark, queue_dir)
    notes = queue.poll(max_messages=max_messages)
    if not notes:
        return None, [], queue
    bucket_uri = bucket.rstrip("/")
    expected = posixpath.basename(bucket_uri)

    def _ours(b: str) -> bool:
        # notifications may carry the bare bucket name or a full URI
        return b in ("", expected, bucket_uri) or posixpath.basename(b.rstrip("/")) == expected

    paths = []
    for n in notes:
        buckets = n.buckets or ("",) * len(n.keys)
        for b, k in zip(buckets, n.keys):
            if not _ours(b):
                # a shared/misconfigured queue can carry events for another
                # bucket — reading a same-named key from OUR bucket would
                # silently ingest the wrong object, so skip it loudly
                _log.warning(
                    "s3_sqs_source: skipping key %r for bucket %r "
                    "(this source reads bucket %r)", k, b, expected,
                )
                continue
            kk = k.lstrip("/")  # S3 keys may legally start with '/'
            if ".." in kk.split("/"):
                # never let a queue message walk out of the bucket
                raise ValueError(f"s3_sqs_source: refusing traversal key {k!r}")
            paths.append(bucket_uri + "/" + kk)
    if not paths:
        return None, notes, queue
    df = _read_objects(spark, sorted(set(paths)), bucket_uri, codec=codec, schema=schema)
    return df, notes, queue
