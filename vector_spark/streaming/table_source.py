"""Structured-Streaming READ of the table-format shim — the Iceberg
streaming-source analog (Spark's ``spark.readStream.format("iceberg")``),
built on PySpark 4's Python DataSource API.

Reference parity: Vector's sources tail a durable buffer and acknowledge
offsets only after downstream flush (SURVEY §2.2); Iceberg's Spark streaming
source does the same over snapshot history — each micro-batch is the rows of
a contiguous snapshot window, and the engine's checkpoint pins the last
consumed snapshot so a restart resumes exactly after it.  This module gives
the shim's commit log (plans/table_format.py) that contract:

  * OFFSET = snapshot version.  ``latestOffset`` reads
    ``CommitLog.current_version()`` — one ``listdir``, no data I/O.
  * A micro-batch over ``(start, end]`` is planned by the SAME metadata fold
    batch incremental reads use (:func:`~vector_spark.plans.table_format.
    _plan_changes`), so the streaming rows are BY CONSTRUCTION the rows
    ``read_table_changes`` returns for that window — inserts carry
    ``_change_type='insert'``, equality-delete tombstones
    ``_change_type='delete'`` (key columns populated, payload NULL), both
    stamped with ``_commit_version``.
  * ONE InputPartition PER DATA FILE: the planner expands dir-mode
    partitions driver-side and executors read single parquet files via
    pyarrow, yielding Arrow record batches (never per-row Python) — the
    batch-size/parallelism story survives a 1000-executor cluster because a
    micro-batch's task count equals its file count, exactly like Iceberg's
    file-per-split streaming scan.
  * Exactly-once: the engine checkpoints offsets and replays the pending
    window's ``partitions(start, end)`` after a crash; planning is a pure
    fold of immutable snapshot JSON, so the replayed batch is byte-identical
    (rewrites keep original files until vacuum — the changelog horizon).

Refusal, not wrongness (the shim-wide contract): a copy-on-write ``delete``/
``merge`` or merge-on-read positional delete inside the window has no
key-addressable pre-image, so planning raises ``IncrementalUnavailable`` and
the STREAM fails with that message rather than emitting a wrong changelog.
``skip_unreadable=true`` opts into Iceberg's
``streaming-skip-delete-snapshots`` semantics: those snapshots are skipped
whole (their row effects silently absent), appends still flow.  Rollbacks
always fail the stream — state moved backwards; no forward-only reading is
sound.

``max_versions_per_batch`` caps how many snapshots one micro-batch drains
(Iceberg's ``max-files-per-micro-batch`` admission control, keyed on
versions here because the commit log's unit of atomicity is the snapshot):
a stream catching up on a long backlog processes it in bounded chunks
instead of one giant batch.

Usage::

    spark.dataSource.register(TableChangesDataSource)
    (spark.readStream.format("table_changes")
          .option("base", base).option("sink", "events")
          .load()
          .writeStream...)
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from vector_spark.plans.checkpoint import PART_COL
from vector_spark.plans.table_format import CommitLog, _plan_changes

__all__ = ["TableChangesDataSource"]


def _arrow_type(spark_type):
    """Spark schema-JSON type → pyarrow type.  Covers every type the
    pipeline's tables use (the input_hint shape url/warc_ts/html/text/lang
    plus the metric/agg columns); anything fancier fails loudly rather than
    miscasting."""
    import pyarrow as pa

    atomic = {
        "string": pa.string(),
        "long": pa.int64(),
        "integer": pa.int32(),
        "short": pa.int16(),
        "byte": pa.int8(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
        "date": pa.date32(),
        # Spark TimestampType is microsecond instants normalized to UTC
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    if isinstance(spark_type, str):
        if spark_type in atomic:
            return atomic[spark_type]
        if spark_type.startswith("decimal"):
            import re as _re

            m = _re.match(r"decimal\((\d+),(\d+)\)", spark_type)
            if m:
                return pa.decimal128(int(m.group(1)), int(m.group(2)))
    elif isinstance(spark_type, dict) and spark_type.get("type") == "array":
        return pa.list_(_arrow_type(spark_type["elementType"]))
    raise ValueError(
        f"table_changes source cannot map Spark type {spark_type!r} to Arrow"
    )


def _target_arrow_schema(schema_json: str):
    """Arrow schema of the STREAM's pinned schema (the StructType Spark
    handed ``streamReader`` at open — includes ``_change_type`` /
    ``_commit_version``).  Batches align to THIS, never to the schema at
    the batch's snapshot window: a column added to the table after the
    stream opened is ignored, a dropped one reads NULL — a running stream's
    shape never shifts under the consumer."""
    import pyarrow as pa

    return pa.schema(
        pa.field(f["name"], _arrow_type(f["type"]))
        for f in json.loads(schema_json)["fields"]
    )


class _ChangeSplit(InputPartition):
    """One parquet file of one snapshot — insert data file or equality-
    delete tombstone (``key_cols`` non-empty marks a tombstone)."""

    def __init__(self, path, version, key_cols, schema_json):
        self.path = path
        self.version = version
        self.key_cols = tuple(key_cols)
        self.schema_json = schema_json


class _TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema_json: str):
        self.schema_json = schema_json  # pinned at stream open
        self.base = options.get("base")
        self.sink = options.get("sink")
        if not self.base or not self.sink:
            raise ValueError(
                "table_changes needs .option('base', …) and .option('sink', …)"
            )
        self.part_col = options.get("part_col", PART_COL)
        self.from_version = int(options.get("from_version", 0))
        self.skip_unreadable = str(
            options.get("skip_unreadable", "false")
        ).lower() in ("true", "1")
        mv = options.get("max_versions_per_batch")
        self.max_versions = int(mv) if mv is not None else None
        self._last_end: int | None = None
        self._fresh = False  # set by initialOffset (only called w/o checkpoint)

    # -- offsets ---------------------------------------------------------
    def initialOffset(self) -> dict:
        # the engine consults this ONLY when no checkpoint exists — which is
        # exactly when from_version is a safe admission-control floor
        self._fresh = True
        return {"version": self.from_version}

    def latestOffset(self) -> dict:
        cur = CommitLog(self.base).current_version()
        if self.max_versions is not None:
            # The floor must never sit BELOW the engine's committed offset:
            # returning a smaller latest than the checkpoint would plan a
            # rewound batch, re-emitting already-delivered versions and
            # breaking exactly-once.  The full-API latestOffset takes no
            # start, so the committed offset is unknowable here — the safe
            # floors are (a) the last end THIS instance planned, and (b) on a
            # FRESH stream (initialOffset was consulted ⇒ no checkpoint
            # exists) from_version itself.  A cleanly-restarted stream's
            # first batch is therefore uncapped (best-effort admission
            # control, never a correctness trade); every later batch is
            # bounded as configured.
            floor = self._last_end if self._last_end is not None else (
                self.from_version if self._fresh else None
            )
            if floor is not None:
                cur = min(cur, floor + self.max_versions)
        return {"version": cur}

    # -- planning (driver) ------------------------------------------------
    def partitions(self, start: dict, end: dict):
        from_v, to_v = int(start["version"]), int(end["version"])
        # never let the admission floor regress below the engine's own start
        # (a rolled-back table can put to_v below from_v)
        self._last_end = max(to_v, from_v)
        if to_v <= from_v:
            return [_ChangeSplit(None, 0, (), None)]  # empty batch marker
        log = CommitLog(self.base)
        _, file_inserts, dir_inserts, deletes = _plan_changes(
            log,
            self.base,
            self.sink,
            from_v,
            to_v,
            self.part_col,
            skip_unreadable=self.skip_unreadable,
        )
        sj = self.schema_json
        splits: list[_ChangeSplit] = []
        for v, paths in file_inserts.items():
            splits.extend(_ChangeSplit(p, v, (), sj) for p in paths)
        for v, dirs in dir_inserts.items():
            for d in dirs:
                splits.extend(
                    _ChangeSplit(os.path.join(d, n), v, (), sj)
                    for n in sorted(os.listdir(d))
                    if n.endswith(".parquet")
                )
        for v, (key_cols, paths) in deletes.items():
            splits.extend(_ChangeSplit(p, v, key_cols, sj) for p in paths)
        return splits or [_ChangeSplit(None, 0, (), None)]

    # -- reading (executors) ----------------------------------------------
    def read(self, split: _ChangeSplit):
        if split.path is None:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = _target_arrow_schema(split.schema_json)
        raw = pq.read_table(split.path)
        n = raw.num_rows
        is_delete = bool(split.key_cols)
        cols = []
        for field in target:
            if field.name == "_change_type":
                cols.append(
                    pa.array(["delete" if is_delete else "insert"] * n, pa.string())
                )
            elif field.name == "_commit_version":
                cols.append(pa.array([split.version] * n, pa.int32()))
            elif (is_delete and field.name not in split.key_cols) or (
                field.name not in raw.column_names
            ):
                # tombstones carry only key columns; schema evolution leaves
                # pre-evolution files without later columns — both read NULL
                cols.append(pa.nulls(n, field.type))
            else:
                cols.append(raw.column(field.name).cast(field.type))
        yield from pa.table(cols, schema=target).to_batches()

    def commit(self, end: dict) -> None:
        pass  # the engine's checkpoint is the source of truth

    def stop(self) -> None:
        pass


class TableChangesDataSource(DataSource):
    """``spark.readStream.format("table_changes")`` over a shim table."""

    @classmethod
    def name(cls) -> str:
        return "table_changes"

    def schema(self) -> StructType:
        base, sink = self.options.get("base"), self.options.get("sink")
        if not base or not sink:
            raise ValueError(
                "table_changes needs .option('base', …) and .option('sink', …)"
            )
        schema_json = CommitLog(base).schemas().get(sink)
        if schema_json is None:
            raise ValueError(
                f"sink {sink!r} has no committed schema at {base!r} — "
                "write at least one snapshot before opening the stream"
            )
        struct = StructType.fromJson(json.loads(schema_json))
        out = StructType()
        for f in struct.fields:
            # tombstone rows null-pad every non-key column, and schema
            # evolution leaves pre-evolution files without later columns —
            # the STREAM's columns are all nullable regardless of what the
            # writer's DataFrame schema recorded
            out = out.add(f.name, f.dataType, nullable=True)
        return (
            out.add("_change_type", "string", nullable=False)
            .add("_commit_version", "integer", nullable=False)
        )

    def streamReader(self, schema: StructType) -> _TableChangesStreamReader:
        return _TableChangesStreamReader(self.options, json.dumps(schema.jsonValue()))
