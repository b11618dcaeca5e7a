"""SparkSession factory tuned for this engine.

Local mode is the test/bench environment (single JVM, N threads); the configs
chosen here are the ones that matter identically on a real multi-executor
cluster: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), Arrow for every Python↔JVM transfer, UTC session timezone so
event-time bucketing is oracle-comparable, and shuffle partitions sized to
parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vector_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` may be an int (→ ``local[n]``), "*" or None (→ ``local[*]``).
    On a real cluster the master comes from spark-submit and this factory
    only applies the SQL-level configs.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    n = os.cpu_count() or 8
    if str(cores).isdigit():
        n = int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("VECTOR_SPARK_DRIVER_MEM", "24g"))
    )
    # Only force a master when not running under spark-submit.
    if "SPARK_SUBMIT_OPTS" not in os.environ and not os.environ.get("SPARK_MASTER"):
        builder = builder.master(master)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if extra_conf:
        for k, v in extra_conf.items():
            spark.conf.set(k, v)
    return spark
