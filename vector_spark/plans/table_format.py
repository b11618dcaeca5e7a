"""Table-format shim — the Iceberg analog for this sandbox (no Iceberg jars).

SURVEY's design calls for "N Iceberg sink tables" (§2.3, §7); what Iceberg
actually provides for the data plane is (1) readers that see only COMMITTED
snapshots, (2) an atomic metadata swap that makes a multi-file write visible
all-or-nothing, and (3) snapshot history for incremental/resume logic.  This
module reproduces exactly those three properties over plain parquet:

  * every pipeline output directory carries a ``_commits/`` log of numbered
    snapshot files ``v{N}.json`` (monotonic, like Iceberg's metadata.json
    sequence);
  * a snapshot is published by writing ``.tmp`` + fsync + ``os.rename`` —
    atomic on POSIX, the same swap-primitive Iceberg uses via its catalog
    (swap to a real Iceberg catalog = delete this file, keep the call sites);
  * ONE snapshot covers EVERY sink of the pipeline run: a crash between two
    sink writes leaves no commit, so readers see neither sink's partial
    output — no torn multi-sink state (Vector analog: offsets acknowledge
    only after all sinks flushed);
  * commits record per-sink written partitions, which is the same lineage
    the checkpoint table tracks (plans/checkpoint.py) — ``committed()`` here
    IS the resume source, so a restarted run skips committed partitions and
    rewrites only uncommitted ones (idempotent via dynamic partition
    overwrite).

Readers (`read_table`) enumerate the committed partition directories from
the log and read only those paths — uncommitted/torn data files are
invisible, and the path list gives partition pruning for free.

At 100 TB the same structure holds: data files land on the object store
(the expensive, restartable part), and the commit is one small atomic
metadata operation — identical cost profile to Iceberg's commit.
"""

from __future__ import annotations

import json
import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.plans.checkpoint import PART_COL

_VERSION_RE = re.compile(r"^v(\d+)\.json$")


class CommitConflict(RuntimeError):
    pass


class CommitLog:
    """Numbered-snapshot commit log under ``<base>/_commits/``."""

    def __init__(self, base: str):
        self.base = base
        self.dir = os.path.join(base, "_commits")
        os.makedirs(self.dir, exist_ok=True)

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.dir):
            m = _VERSION_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def current_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def snapshots(self) -> list[dict]:
        out = []
        for v in self.versions():
            with open(os.path.join(self.dir, f"v{v}.json")) as fh:
                out.append(json.load(fh))
        return out

    def commit(self, meta: dict) -> int:
        """Publish a snapshot atomically (tmp + fsync + rename).  The rename
        is the all-or-nothing point: before it, readers see the previous
        snapshot; after it, the new one — never a partial state."""
        version = self.current_version() + 1
        meta = {"version": version, **meta}
        final = os.path.join(self.dir, f"v{version}.json")
        if os.path.exists(final):
            raise CommitConflict(f"snapshot v{version} already exists")
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(meta, fh, indent=1)
                fh.flush()
                os.fsync(fh.fileno())
            os.rename(tmp, final)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return version

    def committed(self) -> dict[str, dict[str, int]]:
        """Fold all snapshots → {sink: {part_key: rows}} of committed parts."""
        state: dict[str, dict[str, int]] = {}
        for snap in self.snapshots():
            for sink, info in (snap.get("sinks") or {}).items():
                state.setdefault(sink, {}).update(info.get("parts", {}))
        return state


def write_multi_sink(
    sinks: dict[str, DataFrame],
    base: str,
    part_col: str = PART_COL,
    run_id: str | None = None,
    on_event=None,
) -> dict[str, dict[str, int]]:
    """Resumable, atomically-committed multi-sink write.

    1. read the commit log → per-sink committed part keys
    2. per sink: filter committed parts OUT, write the rest with dynamic
       partition overwrite (idempotent redo after any crash)
    3. publish ONE snapshot covering every sink — the atomic rename is the
       only point where anything becomes visible

    Returns {sink: {part_key: rows}} written in THIS invocation.

    ``on_event`` is a fault-injection hook for chaos tests: it is called
    with "before_write:<sink>" / "after_write:<sink>" / "before_commit" at
    the corresponding points; a hook that raises simulates a crash there.
    Production callers leave it None — the protocol's correctness must not
    depend on anything the hook does.
    """
    notify = on_event or (lambda _evt: None)
    log = CommitLog(base)
    done = log.committed()
    written: dict[str, dict[str, int]] = {}
    # NULL part keys: Spark writes them under this directory name; we commit
    # them under the same key so read_table finds the data, and the resume
    # filter is NULL-safe (a bare `~isin(...)` is NULL for NULL keys, which
    # would silently drop those rows from every rerun).
    null_key = "__HIVE_DEFAULT_PARTITION__"
    for name, df in sinks.items():
        committed_keys = set(done.get(name, {}))
        todo = df
        if committed_keys:
            key = F.coalesce(F.col(part_col).cast("string"), F.lit(null_key))
            todo = df.filter(~key.isin(*committed_keys))
        counts = {
            (null_key if r[part_col] is None else str(r[part_col])): r["n"]
            for r in todo.groupBy(part_col).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        if counts:
            notify(f"before_write:{name}")
            todo.write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy(part_col).parquet(os.path.join(base, name))
            notify(f"after_write:{name}")
        written[name] = counts
    if any(written.values()):
        notify("before_commit")
        log.commit(
            {
                "operation": "append",
                "run_id": run_id,
                "sinks": {name: {"parts": parts} for name, parts in written.items()},
            }
        )
    return written


def read_table(
    spark: SparkSession, base: str, sink: str, part_col: str = PART_COL
) -> DataFrame | None:
    """Snapshot-isolated read: only partitions recorded in committed
    snapshots are visible (None when nothing is committed).  The explicit
    path list doubles as partition pruning."""
    log = CommitLog(base)
    parts = sorted(log.committed().get(sink, {}))
    if not parts:
        return None
    paths = [os.path.join(base, sink, f"{part_col}={k}") for k in parts]
    return spark.read.option("basePath", os.path.join(base, sink)).parquet(*paths)
