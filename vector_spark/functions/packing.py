"""Sequence packing — the step between corpus selection and the shard
write in a training-data pipeline: lay every document end-to-end in a
deterministic global order and cut the token stream into fixed-length
training sequences (GPT-style "concat and chunk"; documents may straddle
a sequence boundary, the reader splits there).

Spark has no global row order, so the global token offset is computed as
a DISTRIBUTED PREFIX SUM — the textbook two-phase scan:

  1. shard each doc by hash (independent order hash inside the shard,
     the `shard_assignment` discipline from the training-shard writer),
  2. an in-shard window computes the local exclusive running token sum
     (one shuffle, each shard sorts independently — no global sort, no
     single-task bottleneck),
  3. per-shard token totals (n_shards tiny rows, driver-safe by
     construction) become exclusive shard base offsets, folded back in
     as one flat literal CASE — map-only, no join.

offset = shard_base + local_prefix is then a pure function of the data:
partition-layout invariant, byte-stable across re-runs, and replayable
in ANSI SQL (one global ORDER BY + window cumsum on the oracle side,
which is exactly what phases 1-3 compute distributed).

Ref semantics: the reference curates/routes events but has no trainer;
packing parity is with the standard LM data loader (GPT-2/3 style
concat-and-chunk, also The Pile / RedPajama preprocessing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_offsets"]


def pack_offsets(
    df: DataFrame,
    token_col: str,
    key_col: str,
    seq_len: int,
    n_shards: int = 256,
    seed: str = "",
    method: str = "xxhash64",
) -> DataFrame:
    """Assign every document its position in the packed token stream.

    Adds columns:
      pack_offset — exclusive global token offset of the doc's first token
      seq_id      — training sequence holding that first token
      seq_pos     — position within that sequence
      seq_id_end  — sequence holding the doc's LAST token (straddlers span
                    seq_id..seq_id_end; empty docs get seq_id_end=seq_id)

    Deterministic: the stream order is (hash-shard, in-shard hash, key) —
    a pure function of ``key_col`` — so re-runs, retries, and any input
    partitioning produce identical offsets, and growing the corpus only
    changes offsets after the insertion points.  ``method="md5"`` is the
    SQL-recomputable twin of the xxhash64 throughput path (the
    `shard_assignment` convention).

    At 100 TB: one shuffle (the in-shard window; each shard sorts
    independently, so parallelism = n_shards — size n_shards to O(cores)
    × a small factor, NOT to 1, which would serialize into a global
    sort) and one n_shards-row aggregate folded into a flat literal CASE
    (no join).  Null token counts and NULL keys are rejected loudly
    rather than silently packed as 0 / shard NULL.

    Preconditions and cost, stated plainly:

    * ``key_col`` must be UNIQUE — duplicates share (_shard, _order, key)
      and their relative order (hence their offsets, and every offset
      between them) would be partition-iteration luck.  Run the dedup
      stage first; this is the same precondition the shard writer has.
    * The shard-totals aggregate is a SECOND pass over the input (the
      dsir_bucket_counts discipline).  In a long pipeline checkpoint the
      upstream frame first — the curation walkthrough materializes the
      dedup survivors before reaching this stage — or the whole lineage
      runs twice.
    """
    from vector_spark.plans.sinks import shard_assignment

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    shard, order = shard_assignment(key_col, n_shards, seed=seed + "|pack", method=method)
    tok = F.col(token_col).cast("long")
    with_shard = df.withColumn("_shard", shard).withColumn("_order", order).withColumn(
        "_tok",
        F.when(tok.isNull() | (tok < 0), F.raise_error(
            F.concat(F.lit(f"pack_offsets: {token_col} must be a non-negative "
                           f"token count, got "), F.col(token_col).cast("string"))
        )).otherwise(tok),
    )

    w_in = (
        Window.partitionBy("_shard")
        .orderBy(F.col("_order").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = with_shard.withColumn("_local_off", F.sum("_tok").over(w_in) - F.col("_tok"))

    tot_rows = sorted(
        (r["_shard"], r["_t"])
        for r in with_shard.groupBy("_shard").agg(F.sum("_tok").alias("_t")).collect()
    )
    base, bases = 0, {}
    for s, t in tot_rows:
        bases[s] = base
        base += t
    # ONE flat CaseWhen with n_shards sibling branches (chained .when()),
    # NOT nested when().otherwise(when(...)) — nesting builds an
    # n_shards-deep expression tree that recursive Catalyst transforms
    # choke on at the shard counts the docstring recommends for clusters.
    base_expr: Column | None = None
    for s, b in bases.items():
        cond = F.col("_shard") == s
        base_expr = F.when(cond, F.lit(b)) if base_expr is None else base_expr.when(cond, F.lit(b))
    base_expr = F.lit(0).cast("long") if base_expr is None else base_expr.otherwise(F.lit(0)).cast("long")

    out = local.withColumn("pack_offset", base_expr + F.col("_local_off"))
    last = F.col("pack_offset") + F.greatest(F.col("_tok"), F.lit(1)) - 1
    return (
        out.withColumn("seq_id", F.floor(F.col("pack_offset") / seq_len))
        .withColumn("seq_pos", F.col("pack_offset") % seq_len)
        .withColumn("seq_id_end", F.floor(last / seq_len))
        .drop("_shard", "_order", "_tok", "_local_off")
    )
