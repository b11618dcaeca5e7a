#!/usr/bin/env python
"""Phase-by-phase profiling of the flagship job at one parallelism level.

Usage: python tools/profile_phases.py <cores>
Prints JSON with per-phase seconds: gen (mapInPandas generator only),
parse (gen+url parse+extract UDF), enrich, route, agg-only, write-only.
"""

import json
import shutil
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

cores = int(sys.argv[1])
rows = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000

from vector_spark.session import get_spark  # noqa: E402

spark = get_spark(f"profile_{cores}", cores=cores, shuffle_partitions=2 * cores)
from pyspark.sql import functions as F  # noqa: E402

from vector_spark import synth  # noqa: E402
from vector_spark.plans import flagship  # noqa: E402

spark.range(1000).selectExpr("sum(id)").collect()

t = {}


def phase(name, fn):
    t0 = time.perf_counter()
    fn()
    t[name] = round(time.perf_counter() - t0, 2)


docs = synth.documents(spark, rows, partitions=128)

phase("gen_count", lambda: docs.count())
phase("gen_noop", lambda: docs.write.format("noop").mode("overwrite").save())

parsed = flagship.parse_stage(docs)
phase("parse_noop", lambda: parsed.write.format("noop").mode("overwrite").save())

enriched = flagship.enrich_stage(parsed, spark)
phase("enrich_noop", lambda: enriched.write.format("noop").mode("overwrite").save())

routed = flagship.route_stage(enriched)
phase("route_noop", lambda: routed.write.format("noop").mode("overwrite").save())

agg = flagship.build(spark, docs)["agg"]
phase("agg_noop", lambda: agg.write.format("noop").mode("overwrite").save())

out = f"/tmp/profile_flagship_{cores}"
phase(
    "routed_parquet_write",
    lambda: routed.drop("html").write.mode("overwrite").partitionBy("route").parquet(out),
)
shutil.rmtree(out, ignore_errors=True)

phase("full_run", lambda: flagship.run(spark, docs, out, collect_metrics=False))
shutil.rmtree(out, ignore_errors=True)

print(json.dumps({"cores": cores, "rows": rows, "phases": t}))
