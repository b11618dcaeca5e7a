"""Exact heavy hitters (frequent items / "top talkers") without a
full-cardinality shuffle — bounded candidate summaries + an exact verify
pass.  Two interchangeable candidate engines: Spark's built-in JVM
frequent-items aggregate (default — whole-stage codegen, no Python) and a
pandas Misra-Gries reference with a proven per-partition output bound; both
yield supersets, and the verify pass makes the final answer exact either
way.  The Misra-Gries analysis below is the correctness argument for the
whole family (freqItems implements the same counter scheme).

The log-pipeline question "which keys account for more than ``frac`` of all
events?" (hot hosts, chatty services, abusive clients) is classically
answered with ``GROUP BY key HAVING count > n*frac`` — which at 10^12 rows
shuffles ONE ROW PER DISTINCT KEY.  For web-scale keys (URLs, IPs,
user-agents) that shuffle IS the job.  This module gets the exact same
answer while shuffling only the rows of a provably tiny candidate set:

1. **Candidate pass (map-only, bounded state).**  Each partition runs a
   Misra-Gries summary with ``k = ceil(1/frac)`` counters (Misra & Gries
   1982; the "frequent" algorithm).  Batched form: add the batch's value
   counts, then while more than ``k`` counters remain subtract the
   (size-k+1)-th largest count from every counter and drop the non-positive
   ones.  Every decrement event removes the same amount from >= k+1
   counters at once, so the total undercount D of any key satisfies
   (k+1)*D <= n_p, i.e. D <= n_p/(k+1) < n_p*frac.  Hence any key with
   partition count > n_p*frac survives its partition's summary, and — by
   pigeonhole — any key with GLOBAL count > n*frac exceeds n_p*frac in at
   least one partition, so the union of partition summaries is a SUPERSET
   of the true heavy hitters.  Per-partition output is <= k+1 rows
   regardless of input size or key cardinality.
2. **Verify pass (exact).**  The candidate union (<= partitions * k rows —
   driver-collectable by construction, same doctrine as the DSIR
   histograms) is broadcast; a left-semi join keeps only candidate-key
   rows, and the exact groupBy count over that sliver is filtered to
   ``count > n*frac``.  No approximation survives to the output: the
   result equals the naive GROUP BY ... HAVING exactly, which is what the
   DuckDB oracle (`heavy_hitters` contract row) pins.

Scale shape: one map-only scan (bounded per-task state), one broadcast
semi-join + hash agg whose shuffle holds ONLY heavy-key rows (<= 1/frac
distinct keys by definition).  The total row count ``n`` rides along in the
candidate pass (a sentinel row per partition), so no extra scan.

Reference scope: the reference's observability model is per-component
event counters (`shared/src/messages.rs:104-122`); `tag_cardinality_limit`
(`ui/src/components/pipeline/palette.rs:146`) caps tag explosions the same
"protect the aggregator from high cardinality" way this operator protects
the shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters", "heavy_hitter_candidates", "windowed_heavy_hitters"]

_EST = "_mg_est"


def _mg_partitions(key_cols: list[str], k: int):
    """Per-partition batched Misra-Gries over the key tuple; yields the
    surviving counters plus ONE sentinel row (all-null keys) carrying the
    partition's row count so the caller learns ``n`` in the same scan."""

    def run(iterator):
        import pandas as pd

        counters: dict[tuple, int] = {}
        n_part = 0
        for pdf in iterator:
            n_part += len(pdf)
            if len(pdf) == 0:
                continue
            vc = pdf.groupby(key_cols, dropna=False).size()
            for key, cnt in vc.items():
                raw = key if isinstance(key, tuple) else (key,)
                # NaN normalizes to None: hash(nan) is id-dependent on
                # modern CPythons, so two batches' NaN keys would not
                # collapse in the dict without this
                kt = tuple(None if pd.isna(v) else v for v in raw)
                counters[kt] = counters.get(kt, 0) + int(cnt)
            if len(counters) > k:
                # batched decrement: subtract the (k+1)-th largest count so
                # at most k survive; >= k+1 counters shrink by `dec` each
                dec = sorted(counters.values(), reverse=True)[k]
                counters = {
                    kt: c - dec for kt, c in counters.items() if c - dec > 0
                }
        rows = [kt + (cnt,) for kt, cnt in counters.items()]
        if n_part > 0:
            # sentinel: strictly-negative est carries this partition's row
            # count; a real all-NULL key keeps a positive est, so the two
            # can never be confused
            rows.append(tuple([None] * len(key_cols)) + (-n_part,))
        yield pd.DataFrame(rows, columns=key_cols + [_EST])

    return run


def heavy_hitter_candidates(
    df: DataFrame, key_cols: list[str], frac: float, k: int | None = None
) -> DataFrame:
    """Candidate pass only: per-partition Misra-Gries summaries (superset of
    keys with global count > n*frac) plus negative-count sentinel rows whose
    absolute sum is the total row count.  Exposed for tests and for callers
    composing their own verify step."""
    if not 0 < frac < 1:
        raise ValueError(f"frac must be in (0, 1), got {frac}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    missing = [c for c in key_cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown key columns: {missing}")
    k_min = int(math.ceil(1.0 / frac))
    kk = k if k is not None else k_min
    if kk < k_min:
        raise ValueError(
            f"k={kk} breaks the candidate superset bound: need k >= "
            f"ceil(1/frac) = {k_min} (a smaller budget can decrement away "
            "true heavy hitters)"
        )
    keyed = df.select(*key_cols)
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in keyed.schema.fields
    )
    out_schema = f"{fields}, {_EST} long"
    return keyed.mapInPandas(_mg_partitions(key_cols, kk), out_schema)


# freqItems refuses support below this; a smaller requested support must
# fall back to the mg path or the superset guarantee is silently void
_FREQ_MIN_SUPPORT = 1e-4


def _freq_candidates(
    df: DataFrame, key_cols: list[str], support: float
) -> list[tuple]:
    """Candidate keys via Spark's built-in JVM frequent-items aggregate
    (``df.stat.freqItems`` — Karp/Shenker/Papadimitriou 2003, the streaming
    form of the same counter scheme as Misra-Gries): per-partition bounded
    maps of ~1/support counters merged in one reduce, returning a SUPERSET
    of keys with count > n*support (false positives possible, false
    negatives not).  Whole-stage-codegen path — no Python on the scan.
    Multi-column keys ride as ONE struct column so the counters track the
    joint tuple, not per-column marginals.  Caller must ensure
    ``support >= _FREQ_MIN_SUPPORT`` — clamping here would silently break
    the superset guarantee."""
    col = "_hh_key"
    packed = df.select(F.struct(*key_cols).alias(col))
    items = packed.stat.freqItems([col], support).collect()[0][0]
    return [tuple(r[c] for c in key_cols) for r in items]


def heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    frac: float,
    k: int | None = None,
    method: str = "freq",
) -> DataFrame:
    """EXACT keys with ``count > n * frac`` (and their exact counts), equal
    to ``GROUP BY key_cols HAVING count(*) > n*frac`` but shuffling only
    candidate-key rows.  NULL key values group like any other value (both
    engines' GROUP BY convention).  Output: ``key_cols + (n bigint)``,
    one row per heavy key.

    ``method="freq"`` (default): JVM candidates (:func:`_freq_candidates`)
    + a single-pass verify that folds the total count into the same scan —
    rows join the broadcast candidate set (null-safe left), non-candidates
    collapse into ONE null-struct bucket, so the exact counts AND ``n``
    come out of one aggregate whose key space is <= candidates+1.  Two
    scans total, both whole-stage codegen, one answer-sized shuffle.

    ``method="mg"``: the pandas Misra-Gries path
    (:func:`heavy_hitter_candidates` + broadcast semi-join recount) — the
    deterministic-bound reference implementation; ``n`` rides with the
    candidate sentinels so it is also two scans.  Slower locally (Arrow +
    Python per batch) but its per-partition (k+1)-row output bound is
    proven in the module docstring, independent of Spark internals.

    ``k`` widens the candidate budget beyond the default ``ceil(1/frac)``
    (more counters → fewer false positives → a smaller verify join); a
    ``k`` below ``ceil(1/frac)`` voids the superset proof and is rejected.
    A ``frac`` below freqItems' minimum support (1e-4) automatically falls
    back to the mg path, which has no such floor."""
    if method not in ("freq", "mg"):
        raise ValueError(f"method must be 'freq' or 'mg', got {method!r}")
    if not 0 < frac < 1:
        raise ValueError(f"frac must be in (0, 1), got {frac}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    missing = [c for c in key_cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown key columns: {missing}")
    k_min = int(math.ceil(1.0 / frac))
    if k is not None and k < k_min:
        raise ValueError(
            f"k={k} breaks the candidate superset bound: need k >= "
            f"ceil(1/frac) = {k_min} (a smaller budget can decrement away "
            "true heavy hitters)"
        )
    # the freq engine sizes its counter maps from the support value 1/k;
    # below freqItems' hard floor the guarantee cannot hold — use mg, which
    # has no floor
    support = 1.0 / k if k is not None else frac
    if method == "freq" and support < _FREQ_MIN_SUPPORT:
        method = "mg"
    spark = df.sparkSession
    empty = df.select(*key_cols).limit(0).withColumn("n", F.lit(0).cast("long"))
    if method == "mg":
        cand = heavy_hitter_candidates(df, key_cols, frac, k=k).collect()
        n = sum(-r[_EST] for r in cand if r[_EST] < 0)
        keys = {tuple(r[c] for c in key_cols) for r in cand if r[_EST] >= 0}
        if n == 0 or not keys:
            return empty
        kdf = spark.createDataFrame(
            [tuple(t) for t in sorted(keys, key=lambda t: tuple(map(str, t)))],
            df.select(*key_cols).schema,
        )
        # null-safe semi-join: candidate NULL keys must match NULL rows
        # (GROUP BY treats NULL as a real group; a plain == would drop it)
        cond = [df[c].eqNullSafe(kdf[c]) for c in key_cols]
        return (
            df.join(F.broadcast(kdf), cond, "left_semi")
            .groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > F.lit(float(n) * frac))
        )

    cand = _freq_candidates(df, key_cols, support)
    if not cand:
        return empty
    kdf = spark.createDataFrame(
        [tuple(t) for t in sorted(cand, key=lambda t: tuple(map(str, t)))],
        df.select(*key_cols).schema,
    ).withColumn("_hit", F.lit(True))
    cond = [df[c].eqNullSafe(kdf[c]) for c in key_cols]
    # candidate rows keep their key struct; everything else lands in ONE
    # null-struct bucket — the aggregate's key space is <= candidates+1, so
    # map-side partial state is bounded and the shuffle is answer-sized.
    # An all-NULL candidate tuple is struct(null,..) — NOT a null struct —
    # so it can never be confused with the non-candidate bucket.
    bucket = F.when(
        F.coalesce(kdf["_hit"], F.lit(False)), F.struct(*[df[c] for c in key_cols])
    )
    counts = (
        df.join(F.broadcast(kdf), cond, "left")
        .groupBy(bucket.alias("_k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # n = all rows (candidate + non-candidate buckets): a one-partition
    # window over <= candidates+1 aggregate rows, not another scan
    from pyspark.sql.window import Window

    total = F.sum("n").over(Window.partitionBy())
    return (
        counts.withColumn("_total", total)
        .filter(F.col("_k").isNotNull() & (F.col("n") > F.col("_total") * frac))
        .select(*[F.col(f"_k.{c}").alias(c) for c in key_cols], "n")
    )


def _mg_windowed(key_cols: list[str], k: int):
    """Per-partition Misra-Gries keyed by ``(_hw_w, key tuple)`` with an
    INDEPENDENT k-counter budget per window — the per-window analog of
    :func:`_mg_partitions`, so the superset bound holds per window: any key
    with count > n_pw * frac inside window w of this partition survives
    that window's summary.  State is live-windows × (k+1) counters; no
    sentinels (the verify pass derives window totals itself)."""

    def run(iterator):
        import pandas as pd

        wins: dict[int, dict[tuple, int]] = {}
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            vc = pdf.groupby(["_hw_w"] + key_cols, dropna=False).size()
            for key, cnt in vc.items():
                w, raw = key[0], key[1:]
                w = None if pd.isna(w) else int(w)
                kt = tuple(None if pd.isna(v) else v for v in raw)
                counters = wins.setdefault(w, {})
                counters[kt] = counters.get(kt, 0) + int(cnt)
            for w, counters in wins.items():
                if len(counters) > k:
                    dec = sorted(counters.values(), reverse=True)[k]
                    wins[w] = {
                        kt: c - dec for kt, c in counters.items() if c - dec > 0
                    }
        rows = [
            (w,) + kt for w, counters in wins.items() for kt in counters
        ]
        yield pd.DataFrame(rows, columns=["_hw_w"] + key_cols)

    return run


def windowed_heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    window_s: float,
    frac: float,
    k: int | None = None,
) -> DataFrame:
    """EXACT per-window heavy hitters: for every tumbling ``window_s``
    window, the keys with ``count > n_w * frac`` where ``n_w`` is THAT
    window's row count — "hot hosts per hour", the windowed top-talkers
    report.  Equals ``GROUP BY window, key HAVING count > frac *
    (window total)`` exactly.  Output: ``window_start timestamp`` +
    ``key_cols`` + ``n bigint``.

    A NULL timestamp is a real window (NULL window_start), matching GROUP
    BY; NULL key values group like any other value.

    Scale shape: per-window Misra-Gries candidates (state = live windows ×
    ceil(1/frac) counters per task — worst-case all windows per task on
    time-shuffled input; time-clustered logs keep it small, or
    pre-``repartition`` by a time bucket), then ONE verify aggregate whose
    key space is windows × (candidates+1): candidate rows keep their key
    struct, non-candidates collapse into one null-struct bucket per window,
    and the per-window total comes from a window-sum over that
    aggregate-sized table.  Candidates are NEVER collected to the driver —
    the candidate set joins distributed (AQE picks broadcast when small),
    so window count is unbounded.  Two scans, one candidate distinct, one
    answer-bounded shuffle."""
    if not 0 < frac < 1:
        raise ValueError(f"frac must be in (0, 1), got {frac}")
    if window_s <= 0:
        raise ValueError(f"window_s must be > 0, got {window_s}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    missing = [c for c in key_cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown key columns: {missing}")
    if ts_col not in df.columns:
        raise ValueError(f"unknown ts column: {ts_col}")
    k_min = int(math.ceil(1.0 / frac))
    kk = k if k is not None else k_min
    if kk < k_min:
        raise ValueError(
            f"k={kk} breaks the per-window candidate superset bound: need "
            f"k >= ceil(1/frac) = {k_min}"
        )
    width = float(window_s)
    wexpr = F.floor(
        F.col(ts_col).cast("timestamp").cast("double") / F.lit(width)
    ).cast("long")

    keyed = df.select(wexpr.alias("_hw_w"), *key_cols)
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in keyed.schema.fields
    )
    cand = (
        keyed.mapInPandas(_mg_windowed(key_cols, kk), fields)
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    # null-safe equi-join on (window, key...): NULL windows and NULL key
    # values are real groups.  Not force-broadcast — the candidate table is
    # windows × k rows, unbounded in the window dimension; AQE broadcasts
    # it when it is small.
    cond = [keyed["_hw_w"].eqNullSafe(cand["_hw_w"])] + [
        keyed[c].eqNullSafe(cand[c]) for c in key_cols
    ]
    bucket = F.when(
        F.coalesce(cand["_hit"], F.lit(False)),
        F.struct(*[keyed[c] for c in key_cols]),
    )
    counts = (
        keyed.join(cand, cond, "left")
        .groupBy(keyed["_hw_w"].alias("_w"), bucket.alias("_k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql.window import Window

    total = F.sum("n").over(Window.partitionBy("_w"))
    return (
        counts.withColumn("_total", total)
        .filter(F.col("_k").isNotNull() & (F.col("n") > F.col("_total") * frac))
        .select(
            (F.col("_w") * width).cast("timestamp").alias("window_start"),
            *[F.col(f"_k.{c}").alias(c) for c in key_cols],
            "n",
        )
    )
