"""Checkpoint / lineage — resume a killed job without reprocessing.

Reference analog: Vector's acknowledgement/buffer semantics (north_star) —
a sink acknowledges delivered batches so a restart re-sends only
unacknowledged data.  Vectorize itself persists deployment state through
git + SQLite (git_store/mod.rs:213-226, db/models.rs:46-55); the data-plane
analog here is a lineage table of committed (sink, partition) pairs.

Spark design: work is chunked by a PART KEY — a deterministic function of the
data (e.g. `pmod(xxhash64(url), n_parts)` or a date bucket).  For each sink:

  1. read the checkpoint table → set of already-committed part keys
  2. filter them OUT of the input (partition pruning if the key is a
     partition column of the source table)
  3. write remaining parts with dynamic partition overwrite (idempotent:
     a crash mid-write followed by a retry overwrites the same partition)
  4. append checkpoint rows LAST — a crash between 3 and 4 re-does at most
     one part, and the overwrite makes the redo idempotent

This gives exactly-once table state with at-least-once execution, per
partition — the same contract as Vector's disk buffer + ack.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.schema import CHECKPOINT_SCHEMA

PART_COL = "_part"


def with_part_key(df: DataFrame, n_parts: int, key_cols: list[str] | None = None) -> DataFrame:
    """Stable part key: hash of key columns (default: all) mod n_parts."""
    cols = [F.col(c) for c in (key_cols or df.columns)]
    return df.withColumn(PART_COL, F.pmod(F.xxhash64(*cols), F.lit(n_parts)).cast("int"))


def committed_parts(spark: SparkSession, ckpt_path: str, run_id: str, sink: str) -> set[str]:
    if not _exists(spark, ckpt_path):
        return set()
    rows = (
        spark.read.parquet(ckpt_path)
        .filter((F.col("run_id") == run_id) & (F.col("sink") == sink))
        .select("part_key")
        .distinct()
        .collect()
    )
    return {r.part_key for r in rows}


def write_with_checkpoint(
    df: DataFrame,
    sink_path: str,
    ckpt_path: str,
    run_id: str,
    sink: str,
    part_col: str = PART_COL,
) -> dict[str, int]:
    """Resumable partitioned write. Returns {part_key: rows_written} for the
    parts written in THIS invocation (already-committed parts are skipped).
    """
    spark = df.sparkSession
    done = committed_parts(spark, ckpt_path, run_id, sink)
    if done:
        df = df.filter(~F.col(part_col).cast("string").isin(*done))

    # Dynamic partition overwrite (session.py sets partitionOverwriteMode
    # = dynamic): only partitions present in `df` are replaced — idempotent
    # per-part retry, no clobbering of committed parts.
    df.write.mode("overwrite").partitionBy(part_col).parquet(sink_path)

    written = {
        str(r[part_col]): r["n"]
        for r in df.groupBy(part_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if written:
        now = dt.datetime.now(dt.timezone.utc)
        rows = [
            {"run_id": run_id, "sink": sink, "part_key": k, "rows_written": n, "committed_at": now}
            for k, n in written.items()
        ]
        spark.createDataFrame(rows, CHECKPOINT_SCHEMA).coalesce(1).write.mode("append").parquet(ckpt_path)
    return written


def _exists(spark: SparkSession, path: str) -> bool:
    if path.startswith("/") or path.startswith("file:"):
        return os.path.exists(path.removeprefix("file:"))
    # object-store paths: ask Hadoop FS
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)
