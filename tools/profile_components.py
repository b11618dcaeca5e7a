#!/usr/bin/env python
"""Component isolation for the flagship anti-scaling investigation.

Usage: spark-submit --master local[N] ... tools/profile_components.py <input_parquet>
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

builder = SparkSession.builder.appName("components")
for k, v in {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}.items():
    builder = builder.config(k, v)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from vector_spark import synth  # noqa: E402
from vector_spark.operators import enrich, extract_text, parse_url, tag_routes  # noqa: E402
from vector_spark.plans import flagship  # noqa: E402

cores = spark.sparkContext.defaultParallelism
docs = spark.read.parquet(sys.argv[1])

# warm python workers + JIT
flagship.parse_stage(docs.limit(cores * 2000)).write.format("noop").mode("overwrite").save()

t = {}


def phase(name, fn):
    t0 = time.perf_counter()
    fn()
    t[name] = round(time.perf_counter() - t0, 2)


noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731

phase("a_scan_only", lambda: noop(docs))
phase("b_jvm_parse_only", lambda: noop(parse_url(docs, "url")))
phase("c_udf_extract_only", lambda: noop(extract_text(docs.select("url", "html"), "html", "x")))
phase("d_full_noop", lambda: noop(tag_routes(enrich(enrich(flagship.parse_stage(docs), synth.host_geo(spark), on="host", how="left"), synth.lang_dict(spark), on="lang", how="left"), flagship.FLAGSHIP_ROUTES)))
out = f"/tmp/pc_{cores}"
phase("e_full_write", lambda: flagship.run(spark, docs, out, collect_metrics=False))
import shutil

shutil.rmtree(out, ignore_errors=True)
print(json.dumps({"cores": cores, "phases": t}))
