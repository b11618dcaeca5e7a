"""Sinks (SURVEY §2.3).

Reference sink palette: palette.rs:153-214 (38 sinks); the data-plane
semantics collapse to four Spark writers:

  console    (config_panel.rs:1865-1893) → collect/show (+ the functional
              tester's __test_output, functional_test.rs:272-287)
  file/s3/es (config_panel.rs:1897-1925, 2088-2130, 1969-2003) → partitioned
              parquet/json writes; strftime key templates ≙ partition columns
  blackhole  (config_panel.rs:2453-2471) → noop write (bench sink)
  kafka      (config_panel.rs:2040-2084) → streaming module; `key_field`
              partition key ≙ repartition(col) before write

`write_routed` is the single-scan multi-sink fan-out: the tagged stream is
written ONCE, partitioned by (route, <part_cols>) — each route lands in its
own directory tree (its own "table"), and downstream readers get partition
pruning on route for free.  This is the plan that survives 100 TB: one scan,
one write, no per-route rescans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logfmt_expr(df: DataFrame, columns: list[str] | None = None):
    """logfmt encoding as ONE codegen Column: `key=value` pairs space-joined,
    values containing spaces / quotes / '=' double-quoted with embedded
    quotes escaped, NULL fields omitted (concat_ws skips nulls) — the
    reference console/file `encoding.codec = logfmt`
    (config_panel.rs:1865-1893)."""
    parts = []
    for c in columns or df.columns:
        v = F.col(c).cast("string")
        # quote on ANY whitespace (incl. newlines/tabs — the sink is
        # line-oriented), quotes, '=' or backslashes; escape backslashes
        # FIRST, then quotes, then fold newlines/tabs to \n/\t so one event
        # stays one line
        needs_quote = v.rlike('[\\s"=\\\\]')
        esc = F.regexp_replace(v, r"\\", r"\\\\")
        esc = F.regexp_replace(esc, '"', '\\\\"')
        esc = F.regexp_replace(esc, "\n", "\\\\n")
        esc = F.regexp_replace(esc, "\r", "\\\\r")
        esc = F.regexp_replace(esc, "\t", "\\\\t")
        quoted = F.concat(F.lit('"'), esc, F.lit('"'))
        val = F.when(needs_quote, quoted).otherwise(v)
        parts.append(F.when(v.isNotNull(), F.concat(F.lit(c + "="), val)))
    return F.concat_ws(" ", *parts)


def console_sink(df: DataFrame, limit: int | None = None, codec: str = "json") -> list:
    """Collect rows (the test/preview sink).  codec per the reference's
    console form: json → list of dicts, text → the message column as
    strings, logfmt → key=value lines."""
    if limit is not None:
        df = df.limit(limit)
    if codec == "json":
        return [r.asDict(recursive=True) for r in df.collect()]
    if codec == "text":
        col = "message" if "message" in df.columns else df.columns[0]
        return [r[0] for r in df.select(F.col(col).cast("string")).collect()]
    if codec == "logfmt":
        return [r[0] for r in df.select(logfmt_expr(df)).collect()]
    if codec == "rows":
        return df.collect()
    if codec == "csv":
        # CSV lines via the built-in to_csv — quoting JVM-side (uniVocity;
        # note Spark's default escapes embedded quotes with backslash, not
        # RFC-4180 doubling — pass options through df beforehand if needed)
        return [r[0] for r in df.select(F.to_csv(F.struct(*df.columns))).collect()]
    raise ValueError(f"unknown console encoding codec {codec!r} (json|text|logfmt|rows|csv)")


def file_sink(
    df: DataFrame,
    path: str,
    codec: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned file/table write. strftime path templates in the reference
    (`/var/log/vector/%Y-%m-%d.log`) become partition columns here."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if codec == "parquet":
        writer.parquet(path)
    elif codec in ("json", "ndjson"):
        writer.json(path)
    elif codec == "text":
        writer.text(path)
    elif codec == "logfmt":
        # one codegen expression per row → text lines (reference file-sink
        # encoding.codec=logfmt); re-derive the writer: the projection must
        # happen before partition columns are consumed
        out = df.select(*(partition_by or []), logfmt_expr(df, [c for c in df.columns if c not in (partition_by or [])]).alias("value"))
        w = out.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.text(path)
        return
    elif codec == "csv":
        writer.csv(path, header=True)
    else:
        raise ValueError(f"unknown codec {codec!r}")


def blackhole_sink(df: DataFrame) -> int:
    """Benchmark sink: materialize everything, keep nothing, return count.

    `noop` format exists but returns no row count; a count() aggregate fully
    exercises scan+compute while shipping one long to the driver.
    """
    return df.count()


# chrono-style strftime specifier → Spark/Java DateTimeFormatter pattern.
# %f family follows chrono (Vector's strftime impl): %f = nanoseconds,
# %3f/%6f/%9f = fixed-width fractions.  Composite shorthands (%F %T %D %R)
# expand to their component patterns.
_STRFTIME_TO_JAVA = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "e": "d",
    "H": "HH", "I": "hh", "M": "mm", "S": "ss",
    "j": "DDD", "b": "MMM", "B": "MMMM", "h": "MMM",
    "a": "EEE", "A": "EEEE", "p": "a",
    "z": "xx", "Z": "z",
    "f": "SSSSSSSSS", "3f": "SSS", "6f": "SSSSSS", "9f": "SSSSSSSSS",
    "F": "yyyy-MM-dd", "T": "HH:mm:ss", "D": "MM/dd/yy", "R": "HH:mm",
}


def strftime_to_java(template: str) -> str:
    """Vector's strftime path/index/timestamp templates → java date-format
    pattern.  Literal runs are quoted so e.g. `vector-` survives as text;
    `%%` is a literal percent.  An unrecognized `%X` raises instead of
    silently passing through as literal text — a sink index template or a
    VRL parse_timestamp format with a typo'd specifier should fail loudly at
    compile time, not produce garbage index names / all-NULL parses."""
    out, lit = [], []

    def flush():
        if lit:
            out.append("'" + "".join(lit).replace("'", "''") + "'")
            lit.clear()

    i = 0
    while i < len(template):
        ch = template[i]
        if ch != "%":
            lit.append(ch)
            i += 1
            continue
        if i + 1 >= len(template):
            raise ValueError(f"dangling '%' at end of strftime template {template!r}")
        nxt = template[i + 1]
        if nxt == "%":
            lit.append("%")
            i += 2
            continue
        if nxt in "369" and i + 2 < len(template) and template[i + 2] == "f":
            key, i = nxt + "f", i + 3
        else:
            key, i = nxt, i + 2
        if key not in _STRFTIME_TO_JAVA:
            raise ValueError(
                f"unsupported strftime specifier '%{key}' in template {template!r}"
            )
        flush()
        out.append(_STRFTIME_TO_JAVA[key])
    flush()
    return "".join(out)


def elasticsearch_sink(
    df: DataFrame,
    path: str,
    index_template: str = "vector-%Y.%m.%d",
    ts_col: str = "timestamp",
    mode: str = "overwrite",
) -> None:
    """`elasticsearch` sink analog (config_panel.rs:1969-2003): the per-day
    index template becomes a derived `_index` partition column — readers get
    the same per-index pruning an ES alias gives, from a parquet scan."""
    out = df.withColumn("_index", F.date_format(F.col(ts_col), strftime_to_java(index_template)))
    out.write.mode(mode).partitionBy("_index").parquet(path)


def loki_sink(
    df: DataFrame,
    path: str,
    labels: dict[str, str] | None = None,
    mode: str = "overwrite",
) -> None:
    """`loki` sink analog (config_panel.rs:2007-2036): the static label k=v
    map becomes constant columns AND the partition spec — Loki's
    stream-selector lookup ≙ partition pruning on the label columns."""
    out = df
    label_cols = []
    for k, v in (labels or {}).items():
        out = out.withColumn(k, F.lit(v))
        label_cols.append(k)
    writer = out.write.mode(mode)
    if label_cols:
        writer = writer.partitionBy(*label_cols)
    writer.parquet(path)


def write_routed(
    tagged: DataFrame,
    base_path: str,
    route_col: str = "route",
    extra_partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    drop_binary: list[str] | None = None,
) -> None:
    """Single-scan fan-out write: partition the output by route (+ extras).

    Equivalent to N per-route sinks but with exactly one pass over the data.
    ``drop_binary`` lets callers exclude heavyweight columns (html) from the
    routed copy — the reference sinks serialize events as json/ndjson and we
    keep sink tables lean the same way.
    """
    if drop_binary:
        tagged = tagged.drop(*drop_binary)
    parts = [route_col] + (extra_partition_cols or [])
    tagged.write.mode(mode).partitionBy(*parts).parquet(base_path)


def shard_assignment(
    key_col: str,
    n_shards: int,
    seed: str = "",
    method: str = "xxhash64",
    what: str = "shard",
):
    """(shard, order) Columns for the training-shard layout: shard id in
    [0, n_shards) and an in-shard ordering key, both pure hash functions
    of ``key_col`` — INDEPENDENT hashes (different salts), so in-shard
    order is not correlated with shard assignment.  ``md5`` is the
    SQL-recomputable twin of the xxhash64 throughput path."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # NULL keys are rejected loudly: md5(NULL) is NULL, which would
    # silently become a shard=__HIVE_DEFAULT_PARTITION__ directory in the
    # shard write (breaking the 1:1 worker↔shard mapping) and a None
    # shard id in pack_offsets' driver-side base-offset table — and the
    # xxhash64/md5 twins would disagree (xxhash64 hashes NULL to the
    # seed).  A shard layout keyed on NULL has no meaning; fail at the
    # source.
    key = F.when(
        F.col(key_col).isNull(),
        F.raise_error(F.lit(f"shard_assignment: {key_col} must not be NULL")),
    ).otherwise(F.col(key_col).cast("string"))
    if method == "xxhash64":
        shard = F.pmod(F.xxhash64(F.concat(key, F.lit(seed + "|shard"))), F.lit(n_shards))
        order = F.pmod(F.xxhash64(F.concat(key, F.lit(seed + "|order"))), F.lit(1_000_000))
    elif method == "md5":
        shard = F.conv(F.substring(F.md5(F.concat(key, F.lit(seed + "|shard"))), 1, 7), 16, 10).cast("long") % n_shards
        order = F.conv(F.substring(F.md5(F.concat(key, F.lit(seed + "|order"))), 1, 7), 16, 10).cast("long") % 1_000_000
    else:
        raise ValueError(f"unknown hash method {method!r} (expected xxhash64|md5)")
    return shard.cast("int").alias(what), order.alias(f"{what}_order")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    fmt: str = "parquet",
    seed: str = "",
    method: str = "xxhash64",
    mode: str = "errorifexists",
) -> None:
    """The last step of a curation pipeline: write the corpus as a fixed
    number of GLOBALLY SHUFFLED shards for training readers.  Training
    jobs want (a) a known shard count so workers map 1:1, (b) rows
    pre-shuffled so a sequential reader sees an i.i.d.-ish stream, and
    (c) determinism so a re-run (or a resumed write) produces the same
    shard contents byte-for-byte.  `df.write` alone gives none of these —
    partition layout follows the upstream plan and `rand()` breaks on
    retry.

    Everything is a pure function of ``key_col``: shard = hash(key) mod n,
    in-shard order = an independent hash.  ONE shuffle (repartition on the
    shard id) + an in-partition sort; `partitionBy(shard)` then writes one
    directory per shard.  At 100 TB pick n_shards so a shard fits a
    training worker's stream buffer; skewless by construction (hash mod)."""
    shard, order = shard_assignment(key_col, n_shards, seed, method)
    out = (
        df.withColumn("shard", shard)
        .withColumn("_shard_order", order)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_shard_order", key_col)
        .drop("_shard_order")
    )
    out.write.partitionBy("shard").format(fmt).mode(mode).save(path)
