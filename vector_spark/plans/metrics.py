"""Per-stage metrics — the NodeMetrics/ComponentMetrics analog.

Reference: NodeMetrics {events_in, events_out, bytes_in, bytes_out, errors}
(shared/src/config.rs:278-293); ComponentMetrics counters aggregated across
components (shared/src/messages.rs:104-122, health/mod.rs:352-446).

Spark design: `pyspark.sql.Observation` — named aggregates attached to a
plan node that are computed AS A BYPRODUCT of whatever action runs the plan.
Zero extra scans, zero extra shuffles; the executor-side accumulators ship
counts back with task results, exactly like Vector's component counters
piggyback on the event stream.  At 100 TB an extra count() pass per stage
would double the job; Observation keeps instrumentation free.
"""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from vector_spark.schema import METRICS_SCHEMA


class MetricsCollector:
    """Attach observe() points at stage boundaries; harvest after the action."""

    def __init__(self, run_id: str | None = None):
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self._observations: dict[str, Observation] = {}

    def instrument(
        self, df: DataFrame, stage: str, bytes_col: str | None = None
    ) -> DataFrame:
        """Count events (and bytes, if a size column is given) flowing past
        this point — no extra pass."""
        obs = Observation(f"{self.run_id}:{stage}")
        aggs = [F.count(F.lit(1)).alias("events")]
        if bytes_col is not None:
            aggs.append(F.sum(F.length(F.col(bytes_col))).alias("bytes"))
        self._observations[stage] = obs
        return df.observe(obs, *aggs)

    def harvest(self) -> list[dict]:
        """Collect observed values (valid after an action has run the plan)."""
        rows = []
        for stage, obs in self._observations.items():
            try:
                got = obs.get
            except Exception:
                got = {}
            rows.append(
                {
                    "run_id": self.run_id,
                    "stage": stage,
                    "events_in": None,
                    "events_out": got.get("events"),
                    "bytes_in": None,
                    "bytes_out": got.get("bytes"),
                    "errors": None,
                }
            )
        return rows

    def write(self, spark: SparkSession, path: str) -> None:
        rows = self.harvest()
        if rows:
            spark.createDataFrame(rows, METRICS_SCHEMA).withColumn(
                "collected_at", F.lit(dt.datetime.now(dt.timezone.utc))
            ).write.mode("append").parquet(path)
