"""`remap` — the per-event parse/reshape transform (T1).

Reference semantics: a VRL program that parses/reshapes/adds/deletes fields
per event (palette ui/src/components/pipeline/palette.rs:127; form
config_panel.rs:1420-1441; observed programs:
`. = parse_json!(string!(.message))` shared/src/config.rs:412,
`.environment = "production"; .processed_at = now()`
dev/configs/production/vector.toml:26-30).

Spark design: remap is a set of column assignments evaluated in one
`select` — each assignment is either a VRL value expression (compiled to a
Column, JVM-side) or one of the built-in parse helpers below.  The whole
stage stays inside whole-stage codegen except `extract_text`, which is the
single sanctioned Arrow pandas UDF (byte-identical invariant).

VRL `!` abort semantics: fallible parses yield NULL; `split_errors` then
separates ok/error rows so `dropped_count` is exact
(functional_test.rs:170-174).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.extract import extract_text_udf
from vector_spark.vrl import compile_condition

# Vector's well-known grok patterns, re-expressed as Spark-compatible regex.
APACHE_COMMON_RE = (
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\d+|-)'
)
SYSLOG_RE = r"^<(\d+)>(\w{3} [ \d]\d \d{2}:\d{2}:\d{2}) (\S+) ([\w.\-/]+)(?:\[(\d+)\])?:\s*(.*)$"
URL_RE = r"^(\w+)://([^/:?#]+)(?::(\d+))?([^?#]*)"


def remap(df: DataFrame, assignments: dict[str, str | Column]) -> DataFrame:
    """Apply `.field = <vrl expr>` assignments; later exprs see earlier cols.

    Assignments whose value is None delete the field (VRL `del(.f)`).
    """
    for name, expr in assignments.items():
        if expr is None:
            df = df.drop(name)
        elif isinstance(expr, Column):
            df = df.withColumn(name, expr)
        else:
            df = df.withColumn(name, compile_condition(expr))
    return df


def parse_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Derive scheme/host/path columns from a url column — pure regexp,
    codegen'd, no UDF."""
    u = F.col(url_col)
    return (
        df.withColumn("scheme", F.regexp_extract(u, URL_RE, 1))
        .withColumn("host", F.regexp_extract(u, URL_RE, 2))
        .withColumn("path", F.regexp_extract(u, URL_RE, 4))
    )


def parse_grok(df: DataFrame, source_col: str, pattern: str, fields: list[str]) -> DataFrame:
    """Grok-style extraction: one regexp with N capture groups → N columns.

    Non-matching rows get empty strings (VRL parse failure → recoverable
    with `??`); use split_errors for abort semantics.
    """
    src = F.col(source_col)
    for i, name in enumerate(fields, start=1):
        df = df.withColumn(name, F.regexp_extract(src, pattern, i))
    return df


def parse_apache_common(df: DataFrame, source_col: str = "message") -> DataFrame:
    df = parse_grok(
        df,
        source_col,
        APACHE_COMMON_RE,
        ["client_ip", "ident", "auth", "raw_ts", "method", "request_path", "protocol", "status_s", "bytes_s"],
    )
    return (
        df.withColumn("status", F.col("status_s").try_cast("int"))
        .withColumn("bytes", F.col("bytes_s").try_cast("long"))
        .drop("status_s", "bytes_s")
    )


def parse_json_fields(df: DataFrame, source_col: str, schema: str) -> DataFrame:
    """`. = parse_json!(string!(.message))` — typed from_json, promoted columns.

    ``schema`` is a DDL string, e.g. "k int, user string".  Unparseable rows
    get a NULL struct (→ abort semantics via split_errors).
    """
    parsed = F.from_json(F.col(source_col).cast("string"), schema)
    df = df.withColumn("_parsed", parsed)
    for field in df.schema["_parsed"].dataType.fieldNames():
        df = df.withColumn(field, F.col(f"_parsed.{field}"))
    return df.drop("_parsed")


def extract_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "extracted_text",
    use_jvm: bool = False,
) -> DataFrame:
    """The byte-identical html→text step.

    Default is the Arrow pandas UDF — the byte-level reference
    implementation, and the faster configuration at production core counts:
    the Python workers run on their own processes and OVERLAP the JVM task
    cores (measured: flagship 52s vs 68s at 2-core executors, and scaling
    efficiency 0.83 vs 0.73 — the UDF's extraction effectively adds cores,
    while the JVM regex chain's ~8 intermediate Strings/row add GC
    pressure).  ``use_jvm=True`` selects the pure-codegen
    ``extract_text_col`` chain — byte-identical for valid UTF-8 (pinned by
    test_extract) and ~1.6× faster when the machine is saturated with JVM
    threads and Python workers would only contend (measured at local[32]);
    pick it when executor cores ≈ machine cores."""
    if use_jvm:
        from vector_spark.extract import extract_text_col

        return df.withColumn(out_col, extract_text_col(html_col))
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))


def split_errors(df: DataFrame, required: list[str]) -> tuple[DataFrame, DataFrame]:
    """VRL `!` abort semantics: rows where any required parse produced NULL
    go to the error output; the rest continue.  Returns (ok, err)."""
    cond = None
    for c in required:
        clause = F.col(c).isNotNull()
        cond = clause if cond is None else (cond & clause)
    ok = df.filter(cond)
    err = df.filter(~F.coalesce(cond, F.lit(False)))
    return ok, err
