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
