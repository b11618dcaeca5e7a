"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count +
column names + order-insensitive values.  Run: python tools/check_oracles.py
[name ...] — names filter; no names = all.  Every full run also writes
bench_results/correctness_local.json in the driver's CORRECTNESS_r* shape,
because the driver's own gate caps at 50 queries per round and this repo has
more — the artifact is the committed record that ALL of them verify.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "datetime" in str(pdf[c].dtype):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None).astype("datetime64[us]").astype(str)
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(9)
        elif pdf[c].dtype.kind in "iu":
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None) -> int:
    from vector_spark.session import get_spark

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    record: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        record[name] = rec
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            rec["err"] = f"spark:{type(e).__name__}"
            failures += 1
            continue
        rec["spark_rows"] = len(spark_pdf)
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_pdf)} rows (no oracle — rows-only)")
            rec["err"] = "no_oracle"
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            rec["err"] = f"duckdb:{type(e).__name__}"
            failures += 1
            continue
        rec["oracle_rows"] = len(duck_pdf)
        a, b = normalize(spark_pdf), normalize(duck_pdf)
        rec["schema_match"] = list(a.columns) == list(b.columns)
        if not rec["schema_match"]:
            print(f"FAIL  {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            failures += 1
            continue
        rec["rows_match"] = len(a) == len(b)
        if not rec["rows_match"]:
            print(f"FAIL  {name}: rows spark={len(a)} duck={len(b)}")
            failures += 1
            continue
        rec["hash_match"] = a.equals(b)
        if not rec["hash_match"]:
            diff_mask = (a != b).any(axis=1)
            print(f"FAIL  {name}: {int(diff_mask.sum())}/{len(a)} rows differ; first diffs:")
            print(pd.concat([a[diff_mask].head(3).add_suffix("_spark"),
                             b[diff_mask].head(3).add_suffix("_duck")], axis=1).to_string())
            failures += 1
            continue
        print(f"OK    {name}: {len(a)} rows")
    spark.stop()
    if not only:
        out = os.path.join(os.path.dirname(__file__), "..", "bench_results",
                           "correctness_local.json")
        with open(os.path.normpath(out), "w") as fh:
            json.dump(record, fh, indent=1)
        print(f"wrote {os.path.normpath(out)} ({len(record)} queries)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    sys.exit(main(only=sys.argv[1:] or None))
