"""As-of (most-recent-match) join — align events with the latest state row.

Reference semantics: Vector's enrichment tables (validation/mod.rs:184) are
point lookups against a STATIC table; the time-versioned variant every log
pipeline eventually needs — "enrich each event with the dim row that was
current AT THE EVENT'S TIMESTAMP" (config rollouts, deploy markers, GeoIP db
versions, feature flags) — has no built-in in Vector OR in Spark.  This
module supplies it Spark-first, with two physical strategies chosen for
scale, never a row-at-a-time UDF.

Semantics (pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` compatible):
  backward (default): each left row matches the right row with the GREATEST
  ``right.ts <= left.ts`` per key (inclusive, like DuckDB's ``>=``).
  forward: smallest ``right.ts >= left.ts``.
  tolerance_s: a match further than this many seconds away yields NULLs
  (the row is kept — this is an enrichment, not a filter).

Physical strategies:

* ``method="union"`` (default; exact, unbounded lookback) — union the two
  sides tagged, ONE shuffle on the key, and carry the latest right payload
  forward with ``last_value(ignorenulls)`` over a rows-frame window.  No
  join node at all: the 100 TB fact side shuffles once and never builds a
  hash table.  Cost: a per-key sort (the window); a pathologically hot key
  serializes into one task — for those, use the bucketed method.
* ``method="bucketed"`` (requires ``tolerance_s``) — time-bucket both sides
  with ``bucket_s >= tolerance_s``; each right row is replicated into its
  own bucket and the adjacent one, so every in-tolerance candidate lands in
  the same (key, bucket) equi-join cell; ``max_by`` keeps the best candidate
  per left row.  Pure equi-join + hash-agg: AQE can split skewed cells,
  nothing sorts, and candidates per row are bounded by the right side's rate
  over 2·bucket_s.  This is the plan that survives a hot host at 10^12 rows.

Determinism: ties inside one (key, ts) on the right are broken by
``tiebreaker`` (the LARGEST tiebreaker wins, both directions); without one,
the stringified right payload is the tie key, so output is a total function
of the DATA, never of partition layout (repo-wide rule — operators/reduce.py
states it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = ("backward", "forward")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str,
    right_ts_col: str | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    tiebreaker: str | None = None,
    suffix: str = "_right",
    method: str = "union",
    bucket_s: float | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row survives, enriched with the
    nearest-in-time ``right`` row per key (NULLs when nothing matches).

    ``right_ts_col`` defaults to ``ts_col``.  Right payload columns whose
    name collides with a left column are renamed with ``suffix``.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    if tolerance_s is not None and float(tolerance_s) < 0:
        raise ValueError(f"tolerance_s must be >= 0, got {tolerance_s}")
    if method == "union":
        return _asof_union(
            left, right, on, ts_col, right_ts_col, direction,
            tolerance_s, tiebreaker, suffix,
        )
    if method == "bucketed":
        if tolerance_s is None:
            raise ValueError(
                "method='bucketed' needs tolerance_s: the bucket width must "
                "bound the lookback or candidates per bucket are unbounded"
            )
        return _asof_bucketed(
            left, right, on, ts_col, right_ts_col, direction,
            tolerance_s, tiebreaker, suffix, bucket_s,
        )
    raise ValueError(f"unknown method {method!r} (union | bucketed)")


def _prep(left, right, on, ts_col, right_ts_col, suffix):
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts_col or ts_col
    payload = [c for c in right.columns if c not in keys and c != rts]
    if not payload:
        raise ValueError("right side has no payload columns besides keys + ts")
    renames = {c: (c + suffix if c in left.columns else c) for c in payload}
    return keys, rts, payload, renames


def _tie_col(payload: list[str], tiebreaker: str | None) -> Column:
    tie = F.col(tiebreaker) if tiebreaker else F.struct(*[F.col(c) for c in payload])
    return tie.cast("string")


def _asof_union(
    left, right, on, ts_col, right_ts_col, direction, tolerance_s, tiebreaker, suffix
) -> DataFrame:
    keys, rts, payload, renames = _prep(left, right, on, ts_col, right_ts_col, suffix)
    kcols = [f"_k{i}" for i in range(len(keys))]

    pay_select = right.select(
        F.col(rts).cast("timestamp").alias("_mts"),
        *[F.col(c).alias(renames[c]) for c in payload],
    )
    pay_type = pay_select.schema  # StructType — the shared _pay cast target
    row_type = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("s")
    ).schema["s"].dataType

    lhs = left.select(
        *[F.col(c).alias(k) for c, k in zip(keys, kcols)],
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_dim"),
        F.lit(None).cast("string").alias("_tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
        F.lit(None).cast(pay_type).alias("_pay"),
    )
    # NULL join keys: SQL equality is null-rejecting, so a NULL-keyed left
    # row must match NOTHING (the bucketed method gets this for free from
    # its equi-join).  The window partitionBy below would otherwise group
    # all NULL-keyed rows together — drop NULL-keyed RIGHT rows up front, so
    # the NULL-key window partition holds only left rows and last_value
    # (ignorenulls) correctly yields a NULL payload for them.
    rhs_src = right
    for k in keys:
        rhs_src = rhs_src.where(F.col(k).isNotNull())
    rhs = rhs_src.select(
        *[F.col(c).alias(k) for c, k in zip(keys, kcols)],
        F.col(rts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_dim"),
        _tie_col(payload, tiebreaker).alias("_tie"),
        F.lit(None).cast(row_type).alias("_row"),
        F.struct(
            F.col(rts).cast("timestamp").alias("_mts"),
            *[F.col(c).alias(renames[c]) for c in payload],
        ).alias("_pay"),
    )
    both = lhs.unionByName(rhs)

    if direction == "backward":
        # right rows sort BEFORE left rows at the same ts (inclusive >=);
        # ascending _tie + last_value ⇒ the largest tiebreaker wins
        w = (
            Window.partitionBy(*kcols)
            .orderBy(F.col("_ts").asc(), F.col("_dim").desc(), F.col("_tie").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_pay", ignorenulls=True).over(w)
    else:
        # right rows sort AFTER left rows at the same ts (inclusive >=);
        # descending _tie + first_value ⇒ the largest tiebreaker wins
        w = (
            Window.partitionBy(*kcols)
            .orderBy(F.col("_ts").asc(), F.col("_dim").asc(), F.col("_tie").desc_nulls_last())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first("_pay", ignorenulls=True).over(w)

    out = both.withColumn("_m", matched).where(F.col("_dim") == 0)
    if tolerance_s is not None:
        gap = F.abs(F.col("_ts").cast("double") - F.col("_m._mts").cast("double"))
        out = out.withColumn("_m", F.when(gap <= F.lit(float(tolerance_s)), F.col("_m")))
    return out.select(
        "_row.*",
        *[F.col(f"_m.{renames[c]}").alias(renames[c]) for c in payload],
    )


def _asof_bucketed(
    left, right, on, ts_col, right_ts_col, direction, tolerance_s, tiebreaker, suffix, bucket_s
) -> DataFrame:
    keys, rts, payload, renames = _prep(left, right, on, ts_col, right_ts_col, suffix)
    width = float(bucket_s if bucket_s is not None else tolerance_s)
    if width <= 0:
        raise ValueError(
            f"bucketed as-of needs a positive bucket width, got {width} "
            "(tolerance_s=0 'exact-timestamp only' divides by zero here — "
            "use method='union' with tolerance_s=0 for exact-ts matching)"
        )
    if width < float(tolerance_s):
        raise ValueError("bucket_s must be >= tolerance_s (one-bucket replication bound)")

    # double-cast goes via "timestamp": TIMESTAMP_NTZ inputs (parquet default)
    # cannot cast straight to double
    lb = F.floor(
        F.col(ts_col).cast("timestamp").cast("double") / F.lit(width)
    ).cast("long")
    # backward: a right row serves its own bucket and the NEXT one (later
    # facts look back at it); forward: its own and the PREVIOUS one
    shift = 1 if direction == "backward" else -1

    rhs = right.select(
        *keys,
        F.col(rts).cast("timestamp").alias("_rts"),
        _tie_col(payload, tiebreaker).alias("_tie"),
        *[F.col(c).alias(renames[c]) for c in payload],
    )
    rbb = F.floor(F.col("_rts").cast("double") / F.lit(width)).cast("long")
    rhs = rhs.withColumn("_bkt", F.explode(F.array(rbb, rbb + F.lit(shift))))

    lhs = left.withColumn("_bkt", lb).withColumn("_rowid", F.monotonically_increasing_id())
    joined = lhs.join(rhs, on=keys + ["_bkt"], how="left")

    lts = F.col(ts_col).cast("timestamp").cast("double")
    rtsd = F.col("_rts").cast("double")
    in_tol = (
        (rtsd <= lts) & (lts - rtsd <= F.lit(float(tolerance_s)))
        if direction == "backward"
        else ((rtsd >= lts) & (rtsd - lts <= F.lit(float(tolerance_s))))
    )
    cand = F.when(
        in_tol,
        F.struct(
            F.col("_rts").alias("_mts"),
            *[F.col(renames[c]) for c in payload],
        ),
    )
    # best candidate: latest for backward / earliest for forward, the
    # largest _tie breaking exact-ts ties (matches the union method)
    sign = 1.0 if direction == "backward" else -1.0
    order = F.when(
        in_tol,
        F.struct(
            (rtsd * F.lit(sign)).alias("_o0"),
            F.col("_tie").alias("_o1"),
        ),
    )
    agg = joined.groupBy("_rowid").agg(
        F.first(F.struct(*[F.col(c) for c in left.columns]), ignorenulls=False).alias("_row"),
        F.max_by(cand, order).alias("_m"),
    )
    return agg.select(
        "_row.*",
        *[F.col(f"_m.{renames[c]}").alias(renames[c]) for c in payload],
    )
