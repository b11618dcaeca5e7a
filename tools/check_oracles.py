"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count +
column names + order-insensitive values.  Run: python tools/check_oracles.py
"""

from __future__ import annotations

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
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spark_pdf)} rows (no oracle — rows-only)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        a, b = normalize(spark_pdf), normalize(duck_pdf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows spark={len(a)} duck={len(b)}")
            failures += 1
            continue
        if not a.equals(b):
            diff_mask = (a != b).any(axis=1)
            print(f"FAIL  {name}: {int(diff_mask.sum())}/{len(a)} rows differ; first diffs:")
            print(pd.concat([a[diff_mask].head(3).add_suffix("_spark"),
                             b[diff_mask].head(3).add_suffix("_duck")], axis=1).to_string())
            failures += 1
            continue
        print(f"OK    {name}: {len(a)} rows")
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    sys.exit(main(only=sys.argv[1:] or None))
