"""Enrichment-table lookups — the reference's only join (broadcast left).

Reference: `enrichment_tables` is a recognized top-level config key
(vectorize-cli/src/validation/mod.rs:184); Vector semantics are a static
key→row in-memory lookup (GeoIP-style).  The Spark analog of an in-memory
lookup table replicated to every worker is exactly a BROADCAST hash join —
no shuffle of the 100 TB side, the dim ships once per executor.

For dims too big to broadcast (or hot-key skew on a shuffle join), `salted_join`
splits each hot key into SALT shards: the big side gets a random-but-
deterministic shard id, the dim side is exploded ×SALT — the classic salting
pattern, with AQE skew-join as the runtime backstop (session.py enables it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shard_expr(df: DataFrame, key: str, salt: int, shard_cols: list[str] | None) -> Column:
    """Deterministic per-row shard in [0, salt).  Hashes a CHEAP column set:
    the key plus caller-chosen `shard_cols`, falling back to a per-partition
    row ordinal — never the whole row (hashing a documents row would hash the
    full html payload per row just to pick a mod-`salt` shard, and xxhash64
    raises on MapType columns)."""
    if shard_cols:
        cols: list[Column] = [F.col(c) for c in shard_cols]
    else:
        cols = [F.col(key), F.monotonically_increasing_id()]
    return F.pmod(F.xxhash64(*cols), F.lit(salt)).cast("int")


def enrich(
    df: DataFrame,
    table: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Broadcast left join — missing keys yield NULL enrichment columns,
    mirroring Vector's lookup-miss behavior."""
    return df.join(F.broadcast(table), on=on, how=how)


def salted_join(
    df: DataFrame,
    table: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "left",
    shard_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-resistant shuffle join: big side gets a cheap per-row shard in
    [0, salt); dim side is replicated ×salt.  Deterministic output (salting
    changes placement, not results — the dim row matches every shard)."""
    salted_big = df.withColumn("_salt", _shard_expr(df, on, salt, shard_cols))
    salted_dim = table.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    )
    out = salted_big.join(salted_dim, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def ip_range_enrich(
    df: DataFrame,
    ranges: DataFrame,
    ip_col: str,
    start_col: str = "start_ip",
    end_col: str = "end_ip",
    prefix_bits: int = 16,
    how: str = "left",
    suffix: str = "_range",
) -> DataFrame:
    """GeoIP-style IP-RANGE lookup as a broadcast equi-join, not a theta join.

    Vector's enrichment tables serve GeoIP lookups — a static table of
    ``[start_ip, end_ip) → payload`` rows probed per event (enrichment_tables,
    vectorize-cli/src/validation/mod.rs:184).  The naive Spark translation is
    a non-equi join (``ip BETWEEN start AND end``), which Spark executes as
    BroadcastNestedLoopJoin — every event row tests EVERY range: O(rows ×
    ranges), catastrophic at 10^12 events.

    Scale design: decompose each range into the /``prefix_bits`` prefixes it
    covers (one explode over ``sequence(start>>s, end>>s)``), key events by
    ``ip>>s``, and BROADCAST HASH JOIN on the prefix with the BETWEEN check
    as the join residual.  Each event now probes a hash table once and tests
    only the handful of ranges sharing its /16 — O(rows).  A real-world GeoIP
    table (~3M ranges) explodes to <10M prefix rows at /16, still far under
    broadcast limits.

    ``ip_col`` / ``start_col`` / ``end_col`` are IPv4s as BIGINT (use
    vrl.ip_to_long / ``ip_cidr_contains`` machinery to convert dotted quads).
    Ranges must be non-overlapping (validate_ip_ranges checks) — an overlap
    would duplicate event rows, which is a correctness error for a lookup.
    An INVERTED range (start > end) errors loudly at explode time — a
    ``raise_error`` branch inside the sequence bound, so the check rides the
    existing scan of the (small) ranges side and costs no extra job; a
    descending ``sequence`` would otherwise silently emit wrong prefixes.
    Range payload columns that collide with ``df`` column names are renamed
    with ``suffix`` (same contract as asof_join).
    """
    if not (0 <= prefix_bits <= 32):
        raise ValueError(f"prefix_bits must be in [0, 32], got {prefix_bits}")
    shift = 32 - prefix_bits
    payload = [c for c in ranges.columns if c not in (start_col, end_col)]
    renames = {c: (c + suffix if c in df.columns else c) for c in payload}
    end_checked = F.when(
        F.col(end_col).cast("long") >= F.col(start_col).cast("long"),
        F.shiftright(F.col(end_col).cast("long"), shift),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "ip_range_enrich: inverted range start=%s > end=%s — "
                "run validate_ip_ranges on the table",
                F.col(start_col).cast("string"),
                F.col(end_col).cast("string"),
            )
        ).cast("long")
    )
    exploded = ranges.select(
        F.col(start_col),
        F.col(end_col),
        *[F.col(c).alias(renames[c]) for c in payload],
    ).withColumn(
        "_pfx",
        F.explode(
            F.sequence(
                F.shiftright(F.col(start_col).cast("long"), shift),
                end_checked,
            )
        ),
    )
    keyed = df.withColumn("_pfx", F.shiftright(F.col(ip_col).cast("long"), shift))
    cond = (
        (keyed["_pfx"] == exploded["_pfx"])
        & (keyed[ip_col] >= exploded[start_col])
        & (keyed[ip_col] <= exploded[end_col])
    )
    out = keyed.join(F.broadcast(exploded), on=cond, how=how)
    return out.drop(exploded["_pfx"]).drop(keyed["_pfx"]).drop(
        exploded[start_col]
    ).drop(exploded[end_col])


def validate_ip_ranges(
    ranges: DataFrame, start_col: str = "start_ip", end_col: str = "end_ip"
) -> None:
    """Raise if any range is inverted or overlaps its successor (sorted by
    start).  One window pass over the (small) ranges table — run it once at
    table-load time, not per query."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("s"))
    bad = (
        ranges.select(
            F.col(start_col).cast("long").alias("s"),
            F.col(end_col).cast("long").alias("e"),
        )
        .withColumn("_prev_e", F.lag("e").over(w))
        .where((F.col("s") > F.col("e")) | (F.col("_prev_e") >= F.col("s")))
        .limit(1)
        .collect()
    )
    if bad:
        r = bad[0]
        raise ValueError(
            f"ip range table invalid near start={r['s']}: inverted or "
            f"overlapping ranges (prev end={r['_prev_e']}, end={r['e']}) — "
            "a lookup table must partition the address space"
        )


def salted_repartition(
    df: DataFrame,
    key: str,
    n_partitions: int,
    salt: int = 16,
    shard_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-flattening repartition (north_rule: "skew from hot hosts is
    handled with salted repartitioning"): partition by (key, shard) where
    shard is a cheap per-row value mod `salt`, so a Zipfian-hot key spreads
    over `salt` partitions instead of melting one task.  Use before key-local
    work that doesn't need strict key co-location (per-partition writes, UDF
    batching); for aggregates, prefer the two-phase partial-then-final agg
    Spark already does."""
    shard = _shard_expr(df, key, salt, shard_cols)
    return df.repartition(n_partitions, F.col(key), shard)
