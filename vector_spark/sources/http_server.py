"""`http_server` source (HttpServerSourceForm: address default 0.0.0.0:8080,
path "/" — ui/src/components/pipeline/config_panel.rs).

Spark has no built-in HTTP-server streaming source, so this maps the
component to the standard landing-zone pattern a Spark shop actually runs:

    HTTP POST (ndjson body) → spool directory (one file per request,
    atomic rename) → ``spark.readStream`` file source

The ingest server is a stdlib ThreadingHTTPServer living OUTSIDE the Spark
plan (on the driver host here; in production any fleet of receivers writing
to object storage).  Each accepted request body lands as
``<spool>/<uuid>.ndjson`` via write-to-tmp + rename, so the file stream
never observes partial files.  Offsets/exactly-once then come from the file
source + checkpoint, identical to every other file-fed pipeline here.

Non-matching paths get 404; non-POST gets 405 — mirroring the form's
single-path contract.  Tested live in tests/test_http_server_source.py.
"""

from __future__ import annotations

import os
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession


class HttpIngestServer:
    """Threaded ingest endpoint writing request bodies to the spool dir."""

    def __init__(self, spool_dir: str, address: str = "127.0.0.1:0", path: str = "/"):
        os.makedirs(spool_dir, exist_ok=True)
        self.spool_dir = spool_dir
        self.path = path
        host, _, port = address.rpartition(":")
        spool = spool_dir
        accept_path = path

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                if self.path != accept_path:
                    self.send_response(404)
                    self.end_headers()
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                name = uuid.uuid4().hex
                tmp = os.path.join(spool, f".{name}.tmp")
                final = os.path.join(spool, f"{name}.ndjson")
                with open(tmp, "wb") as fh:
                    fh.write(body if body.endswith(b"\n") else body + b"\n")
                os.rename(tmp, final)  # atomic: the file stream never sees partials
                self.send_response(200)
                self.end_headers()

            def do_GET(self):
                self.send_response(405)
                self.end_headers()

            def log_message(self, *a):
                pass

        self._srv = ThreadingHTTPServer((host or "127.0.0.1", int(port)), Handler)
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)
        self._thread.start()

    @property
    def port(self) -> int:
        return self._srv.server_port

    @property
    def url(self) -> str:
        host, port = self._srv.server_address[:2]
        return f"http://{host}:{port}{self.path}"

    def stop(self) -> None:
        self._srv.shutdown()


def http_server_source(
    spark: SparkSession,
    spool_dir: str,
    schema: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The Spark half: a schema'd json file stream over the spool dir.
    (``.tmp`` files are hidden-dotted, so the glob never matches them.)"""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(spool_dir)
