"""vector_spark — a PySpark-native log/telemetry parse → enrich → route →
aggregate analytics engine.

A from-scratch rebuild, on the Spark DataFrame/Catalyst stack, of the
component model of the reference control plane (pezkins/vector, "Vectorize"):
sources → transforms → sinks pipelines (reference: shared/src/config.rs:12-24),
with the transform semantics of the component palette
(ui/src/components/pipeline/palette.rs:70-214) re-expressed as lazy DataFrame
operators so Catalyst gets predicate pushdown / column pruning / join
selection for free.

Nothing here is a port: the reference is a Rust control plane that drives an
external execution engine; this package *is* the execution engine, built
Spark-first for 100 TB-scale inputs (explicit partitioning, broadcast
enrichment joins, salted skew handling, AQE, per-partition checkpoint/lineage).
"""

from vector_spark.session import get_spark

__all__ = ["get_spark", "Pipeline", "Stage"]
__version__ = "0.1.0"


def __getattr__(name):  # lazy: avoid importing pyspark-heavy modules eagerly
    if name in ("Pipeline", "Stage"):
        from vector_spark.plans.pipeline import Pipeline, Stage

        return {"Pipeline": Pipeline, "Stage": Stage}[name]
    raise AttributeError(name)
