"""Counter-rate and temporality conversion over metrics-shaped rows.

Reference semantics: Vector converts between metric kinds (incremental vs
absolute, config_panel.rs:1812-1822) but leaves rate derivation to the
downstream TSDB; the OTLP metrics signal this repo decodes
(sources/otlp.py) carries ``aggregationTemporality`` (1=DELTA,
2=CUMULATIVE) that any aggregate consumer must normalize.  These two
operators close that loop the way Prometheus/OTel collectors define it:

* :func:`counter_rate` — per-series ``increase`` and per-second ``rate``
  from CUMULATIVE counter samples, with Prometheus counter-reset handling
  (a decrease means the process restarted from 0, so the increase since
  the previous sample is the new reading itself).
* :func:`delta_to_cumulative` — DELTA → CUMULATIVE via a per-series
  running sum (the OTel ``deltatocumulative`` processor analog).
* :func:`range_rate` — ``increase()``/``rate()`` over ALIGNED windows
  (the recording-rule form: one row per series per window), reset-aware.
* :func:`sum_histograms` — PromQL ``sum by (...)`` over explicit-bounds
  histogram points: element-wise bucket merge, the step that feeds
  :func:`histogram_quantile`.
* :func:`histogram_quantile` — PromQL's bucket-interpolation quantile
  over explicit-bounds histogram rows, fully in-row.

Spark design: both are ONE shuffle on the series key columns followed by
a per-series window scan — no self-joins, no Python.  Telemetry corpora
have series cardinality far above core counts (millions of label-sets),
so the window parallelizes on series; a single pathologically hot series
is sequential by the semantics themselves (an ordered scan), which is the
same bound any TSDB pays.  Event-time ordering must be made total for
deterministic output: pass ``tiebreaker`` whenever two samples of one
series can share a timestamp (same contract as dedupe/throttle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _series_window(series_cols: list[str], ts_col: str, tiebreaker: str | None):
    order = [F.col(ts_col).asc()]
    if tiebreaker is not None:
        order.append(F.col(tiebreaker).asc())
    return Window.partitionBy(*series_cols).orderBy(*order)


def counter_rate(
    df: DataFrame,
    series_cols: list[str],
    *,
    ts_col: str = "timestamp",
    value_col: str = "value",
    tiebreaker: str | None = None,
    handle_resets: bool = True,
    delta_col: str = "delta",
    rate_col: str = "rate_per_s",
) -> DataFrame:
    """Per-sample increase + per-second rate for CUMULATIVE counters.

    Adds ``delta_col`` (the increase since the previous sample of the same
    series) and ``rate_col`` (that increase divided by the elapsed seconds).
    The first sample of each series has no baseline — both are NULL there.
    A sample whose value DROPPED below its predecessor is a counter reset
    when ``handle_resets`` (Prometheus semantics: the counter restarted at
    0, so the increase is the new value itself); with ``handle_resets=False``
    a decrease yields NULL delta/rate instead (strict mode — surface bad
    series rather than guess).  Two samples at the same timestamp produce a
    NULL rate (zero elapsed time) but still a delta.
    """
    if not series_cols:
        raise ValueError("counter_rate needs at least one series column")
    w = _series_window(series_cols, ts_col, tiebreaker)
    v = F.col(value_col).cast("double")
    prev_v = F.lag(v).over(w)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    raw = v - prev_v
    if handle_resets:
        delta = F.when(raw >= 0, raw).otherwise(v)
    else:
        delta = F.when(raw >= 0, raw)
    delta = F.when(prev_v.isNotNull(), delta)
    dt_us = us - prev_us
    # double*double/long in this exact order on both the Spark and any
    # ANSI-SQL oracle side — IEEE-identical, no tolerance needed
    rate = F.when(dt_us > 0, delta * F.lit(1000000.0) / dt_us)
    # one projection so both lags land in ONE Window node (a second
    # withColumn would stack a second Window pass over the same sort)
    return df.select("*", delta.alias(delta_col), rate.alias(rate_col))


def delta_to_cumulative(
    df: DataFrame,
    series_cols: list[str],
    *,
    ts_col: str = "timestamp",
    value_col: str = "value",
    tiebreaker: str | None = None,
    out_col: str = "cumulative",
) -> DataFrame:
    """DELTA-temporality samples → running CUMULATIVE total per series.

    The OTel collector's ``deltatocumulative`` processor analog: each
    sample's ``out_col`` is the sum of all same-series deltas up to and
    including it in event-time order.  NULL deltas are skipped (sum over
    nothing-so-far stays NULL until the first non-NULL sample, matching
    SQL ``SUM OVER``)."""
    if not series_cols:
        raise ValueError("delta_to_cumulative needs at least one series column")
    w = (
        _series_window(series_cols, ts_col, tiebreaker)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(F.col(value_col)).over(w))


def range_rate(
    df: DataFrame,
    series_cols: list[str],
    window_s: int,
    *,
    ts_col: str = "timestamp",
    value_col: str = "value",
    tiebreaker: str | None = None,
    handle_resets: bool = True,
    window_col: str = "window_start",
    samples_col: str = "n_samples",
    increase_col: str = "increase",
    rate_col: str = "rate_per_s",
) -> DataFrame:
    """PromQL-style ``increase()``/``rate()`` over ALIGNED windows: one row
    per (series, window) from CUMULATIVE counter samples.

    ``increase`` is the sum of reset-adjusted adjacent deltas between
    consecutive samples INSIDE the window (the recording-rule / batch
    replication of ``increase(m[w])`` on aligned steps): a decrease means
    the counter restarted from 0 so the increase since the previous sample
    is the new reading itself (``handle_resets=False`` drops such pairs
    instead — strict mode).  Deliberately NOT Prometheus's range-vector
    extrapolation: no cross-window delta and no boundary extrapolation, so
    the result is a total function of the in-window samples — deterministic
    and exactly SQL-replayable.  A window with fewer than two samples has a
    NULL increase/rate (one sample gives no delta — same convention as
    PromQL returning no result for a 1-sample range).  ``rate_col`` is
    ``increase / window_s``.

    Plan: ONE shuffle — the per-(series, window) lag window and the
    groupBy that follows share the same keys, so the aggregate reuses the
    window's hash distribution (no second Exchange).  Window starts come
    from integer epoch-second division: aligned, timezone-free.
    """
    if not series_cols:
        raise ValueError("range_rate needs at least one series column")
    if window_s <= 0:
        raise ValueError(f"window_s must be positive, got {window_s}")
    secs = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket = F.floor(secs / F.lit(int(window_s) * 1_000_000)).cast("long")
    with_bucket = df.withColumn("_wb", bucket)
    order = [F.col(ts_col).asc()]
    if tiebreaker is not None:
        order.append(F.col(tiebreaker).asc())
    w = Window.partitionBy(*(series_cols + ["_wb"])).orderBy(*order)
    v = F.col(value_col).cast("double")
    prev_v = F.lag(v).over(w)
    raw = v - prev_v
    if handle_resets:
        delta = F.when(raw >= 0, raw).otherwise(v)
    else:
        delta = F.when(raw >= 0, raw)
    delta = F.when(prev_v.isNotNull(), delta)
    deltas = with_bucket.select(*series_cols, "_wb", delta.alias("_d"))
    out = deltas.groupBy(*series_cols, "_wb").agg(
        F.count(F.lit(1)).alias(samples_col),
        F.sum("_d").alias(increase_col),
    )
    return out.select(
        *series_cols,
        (F.col("_wb") * int(window_s)).cast("timestamp").alias(window_col),
        samples_col,
        increase_col,
        (F.col(increase_col) / F.lit(float(window_s))).alias(rate_col),
    )


def over_time(
    df: DataFrame,
    series_cols: list[str],
    window_s: int,
    *,
    ts_col: str = "timestamp",
    value_col: str = "value",
    quantiles: tuple[float, ...] = (),
    tiebreaker: str | None = None,
    window_col: str = "window_start",
) -> DataFrame:
    """PromQL ``avg/min/max/sum/count/last/quantile_over_time`` on ALIGNED
    windows — the gauge-series companion of :func:`range_rate` (which
    handles cumulative counters).  One row per (series, window) with
    ``avg_v``/``min_v``/``max_v``/``sum_v``/``n_samples``/``last_v`` and a
    ``q<NN>`` column per requested quantile.

    ``last_v`` uses ``max_by(value, (ts, tiebreaker))`` — deterministic
    under any partitioning (module doctrine: never ``F.last``); pass
    ``tiebreaker`` when one series can carry equal timestamps.  Quantiles are exact
    ``F.percentile`` per group; for unbounded-cardinality audits switch to
    ``percentile_approx`` upstream (same trade the summary metric
    documents).  Like range_rate, this is deliberately step-aligned (no
    sliding lookback): the recording-rule batch replication, a total
    function of in-window samples.

    Plan: ONE map-side-combined hash aggregate — a single shuffle keyed by
    (series, window); at 10^12 samples the shuffle carries only partial
    aggregate states per series-window, not samples.
    """
    if not series_cols:
        raise ValueError("over_time needs at least one series column")
    if window_s <= 0:
        raise ValueError(f"window_s must be positive, got {window_s}")
    qnames: list[str] = []
    for q in quantiles:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        # 'q5'/'q9'/'q99' for the common 0.x form; anything else ('q1_0',
        # 'q0' …) falls back to underscore-sanitized — column names must
        # stay identifier-safe for the downstream select
        txt = str(q)
        name = "q" + (txt[2:] if txt.startswith("0.") and txt[2:].isdigit()
                      else txt.replace(".", "_").replace("-", "m").replace("+", ""))
        if name in qnames:
            raise ValueError(f"duplicate quantile column {name!r} from {quantiles}")
        qnames.append(name)
    secs = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket = F.floor(secs / F.lit(int(window_s) * 1_000_000)).cast("long")
    v = F.col(value_col).cast("double")
    ts = F.col(ts_col).cast("timestamp")
    if tiebreaker is not None:
        ts = F.struct(ts, F.col(tiebreaker))
    aggs = [
        F.avg(v).alias("avg_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.sum(v).alias("sum_v"),
        F.count(v).alias("n_samples"),
        F.max_by(v, ts).alias("last_v"),
    ]
    for q, name in zip(quantiles, qnames):
        aggs.append(F.percentile(v, F.lit(q)).alias(name))
    out = df.withColumn("_wb", bucket).groupBy(*series_cols, "_wb").agg(*aggs)
    return out.select(
        *series_cols,
        (F.col("_wb") * int(window_s)).cast("timestamp").alias(window_col),
        *[c for c in out.columns if c not in series_cols and c != "_wb"],
    )


def absent_windows(
    df: DataFrame,
    series_cols: list[str],
    window_s: int,
    *,
    ts_col: str = "timestamp",
    window_col: str = "window_start",
) -> DataFrame:
    """PromQL ``absent_over_time`` / dead-man alerting: one row per
    (series, aligned window) in which a KNOWN series reported NO samples —
    the signal a scrape target went dark, which no per-sample operator can
    produce (the defect is the rows that aren't there).

    The evaluation domain is every series ever observed × every aligned
    window between the input's first and last sample (the batch analog of
    "since the series appeared"); trim with a filter on ``window_col`` for
    a narrower audit.  Wholly declarative — bounds come from a 1-row
    global aggregate cross-joined back, never a driver collect.

    Plan: observed = one answer-sized hash agg on (series, window);
    distinct series = one answer-sized agg; the grid is
    series × sequence(min_wb, max_wb) exploded, LEFT ANTI joined against
    observed.  Every exchange is bounded by series-cardinality × window
    count — the alert-evaluation domain itself — never by sample volume.
    """
    if not series_cols:
        raise ValueError("absent_windows needs at least one series column")
    if window_s <= 0:
        raise ValueError(f"window_s must be positive, got {window_s}")
    secs = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket = F.floor(secs / F.lit(int(window_s) * 1_000_000)).cast("long")
    with_bucket = df.select(*series_cols, bucket.alias("_wb"))
    observed = with_bucket.groupBy(*series_cols, "_wb").agg(F.count(F.lit(1)))
    bounds = with_bucket.agg(
        F.min("_wb").alias("_lo"), F.max("_wb").alias("_hi")
    )
    grid = (
        with_bucket.select(*series_cols)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            *series_cols,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_wb"),
        )
    )
    absent = grid.join(observed, [*series_cols, "_wb"], "left_anti")
    return absent.select(
        *series_cols,
        (F.col("_wb") * int(window_s)).cast("timestamp").alias(window_col),
    )


def sum_histograms(
    df: DataFrame,
    group_cols: list[str],
    *,
    counts_col: str = "bucket_counts",
    bounds_col: str = "explicit_bounds",
    count_col: str = "count",
    sum_col: str = "sum",
) -> DataFrame:
    """Bucket-wise merge of explicit-bounds histogram points — PromQL's
    ``sum by (...)`` over histogram series, the aggregation step that feeds
    :func:`histogram_quantile` (quantiles over a merged histogram, e.g.
    per-service latency from per-pod points).

    One output row per (``group_cols``, ``bounds_col``): ``counts_col``
    becomes the element-wise sum of the group's bucket arrays, and
    ``count_col``/``sum_col`` the summed observation count / value sum.
    ``bounds_col`` participates in the grouping, so points with DIFFERENT
    bucket layouts are never merged (they surface as separate rows — the
    caller can detect mixed layouts by key multiplicity instead of getting
    silently wrong buckets).  Rows whose bucket array is NULL/empty are
    dropped (malformed points); ragged arrays under one bounds value sum
    position-wise over whatever each point has.

    Plan: posexplode → two hash aggregates — (keys, bucket_pos) partial
    sums, then re-assembly with an ``array_sort(collect_list(...))`` whose
    sort key is the unique bucket position, so the output is a total
    function of the data under any partitioning.  A group's points are
    NEVER collected into one in-memory list of arrays (the explode path
    scales to any points-per-series); the collect_list at stage 2 holds one
    element per BUCKET, which is bounded by the histogram layout, not the
    data.  The point's count/sum ride the explode billed exactly once (on
    its bucket-0 row) — no second scan, no join.
    """
    if not group_cols:
        raise ValueError("sum_histograms needs at least one group column")
    keys = list(group_cols) + [bounds_col]
    ex = df.select(
        *keys,
        F.posexplode(F.col(counts_col)).alias("_pos", "_c"),
        F.col(count_col).alias("_cnt"),
        F.col(sum_col).alias("_sum"),
    )
    per_bucket = ex.groupBy(*keys, "_pos").agg(
        F.sum("_c").alias("_bc"),
        F.sum(F.when(F.col("_pos") == 0, F.col("_cnt"))).alias("_pc"),
        F.sum(F.when(F.col("_pos") == 0, F.col("_sum"))).alias("_ps"),
    )
    return per_bucket.groupBy(*keys).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("_pos"), F.col("_bc")))),
            lambda s: s["_bc"],
        ).alias(counts_col),
        F.sum("_pc").cast("long").alias(count_col),
        F.sum("_ps").alias(sum_col),
    )


def histogram_quantile(
    df: DataFrame,
    q: float,
    *,
    counts_col: str = "bucket_counts",
    bounds_col: str = "explicit_bounds",
    out_col: str | None = None,
) -> DataFrame:
    """PromQL ``histogram_quantile`` over explicit-bounds histogram rows.

    Input rows carry OTLP-shaped histograms (``bucket_counts`` has one more
    entry than ``explicit_bounds``; the last bucket is (last_bound, +inf) —
    exactly what :func:`vector_spark.sources.otlp.otlp_metrics_parse`
    emits).  The estimate is Prometheus's: find the bucket holding the
    q-rank observation, linearly interpolate inside it assuming uniform
    spread, with the first bucket's lower edge taken as 0 (the
    non-negative-observation convention) and a rank landing in the +inf
    bucket clamped to the highest finite bound.  Empty/NULL histograms and
    empty bounds yield NULL, never an error row.

    Fully IN-ROW (higher-order functions over the two arrays — no explode,
    no shuffle, no Python): a 10^12-row histogram table stays one codegen
    scan.  The running-sum transform is O(n_buckets²) per row, irrelevant
    at real bucket counts (tens).
    """
    if not (0.0 <= q <= 1.0):
        raise ValueError(f"q must be in [0, 1], got {q}")
    if out_col is None:
        out_col = f"q{str(q).replace('.', '_')}"
    counts = F.col(counts_col)
    bounds = F.col(bounds_col)
    zero = F.lit(0).cast("long")
    total = F.aggregate(counts, zero, lambda a, x: a + x)
    rank = F.lit(float(q)) * total.cast("double")
    # cums[i] = counts[0] + … + counts[i], 1-indexed for element_at
    cums = F.transform(
        F.sequence(F.lit(1), F.size(counts)),
        lambda n: F.aggregate(F.slice(counts, F.lit(1), n), zero, lambda a, x: a + x),
    )
    # smallest 1-based NON-EMPTY bucket whose cumulative count reaches the
    # rank.  The non-empty condition matters only when rank lands exactly on
    # a cumulative boundary followed by empty buckets (q=0 with an empty
    # first bucket being the canonical case): an empty winner would divide
    # 0/0 below and NULL the row, where PromQL returns the first non-empty
    # bucket's lower edge.  For every other rank the first cum >= rank
    # bucket is non-empty anyway, so semantics are unchanged.
    idx = F.element_at(
        F.filter(
            F.sequence(F.lit(1), F.size(counts)),
            lambda i: (F.element_at(cums, i).cast("double") >= rank)
            & (F.element_at(counts, i) > 0),
        ),
        1,
    )
    n_bounds = F.size(bounds)
    lower = F.when(idx == 1, F.lit(0.0)).otherwise(F.element_at(bounds, idx - 1))
    upper = F.element_at(bounds, idx)
    cum_prev = F.when(idx == 1, zero).otherwise(F.element_at(cums, idx - 1))
    in_bucket = F.element_at(counts, idx)
    interp = lower + (upper - lower) * (rank - cum_prev.cast("double")) / in_bucket.cast("double")
    val = (
        F.when(counts.isNull() | bounds.isNull() | (total <= 0) | (n_bounds < 1), F.lit(None).cast("double"))
        .when(idx > n_bounds, F.element_at(bounds, n_bounds))  # +inf bucket
        .otherwise(interp)
    )
    return df.withColumn(out_col, val)


def exp_histogram_quantile(
    df: DataFrame,
    q: float,
    *,
    counts_col: str = "positive_bucket_counts",
    offset_col: str = "positive_offset",
    scale_col: str = "scale",
    zero_col: str = "zero_count",
    out_col: str | None = None,
) -> DataFrame:
    """Quantile over OTLP EXPONENTIAL histogram rows (the OTel analog of a
    Prometheus native histogram).

    Bucket geometry per metrics.proto: with ``b = 2^(2^-scale)``, positive
    bucket ``i`` (0-based in the array) covers
    ``(b^(offset+i), b^(offset+i+1)]``; ``zero_count`` observations sit at
    ~0.  This implementation covers the non-negative-observation case
    (latencies/sizes — the overwhelmingly common one): the rank is taken
    over ``zero_count`` + the positive buckets, a rank inside the zero
    bucket returns 0.0, and negative buckets are ignored (a row whose
    negative side is non-empty still computes — over its non-negative
    mass — callers with signed data should filter first).  Inside the
    winning bucket the estimate interpolates LINEARLY in value space
    between the bucket's bounds, like :func:`histogram_quantile` (not in
    log space — same convention Prometheus applies to native histograms).

    In-row like its explicit-bounds sibling: array HOFs + ``F.pow``, no
    explode, no shuffle, NULL on empty/NULL histograms.
    """
    if not (0.0 <= q <= 1.0):
        raise ValueError(f"q must be in [0, 1], got {q}")
    if out_col is None:
        out_col = f"q{str(q).replace('.', '_')}"
    counts = F.col(counts_col)
    zero_n = F.coalesce(F.col(zero_col), F.lit(0)).cast("long")
    off = F.col(offset_col).cast("double")
    base = F.pow(F.lit(2.0), F.pow(F.lit(2.0), -F.col(scale_col).cast("double")))
    zl = F.lit(0).cast("long")
    pos_total = F.aggregate(
        F.coalesce(counts, F.array().cast("array<long>")), zl, lambda a, x: a + x
    )
    total = zero_n + pos_total
    rank = F.lit(float(q)) * total.cast("double")
    cums = F.transform(
        F.sequence(F.lit(1), F.size(counts)),
        lambda n: F.aggregate(F.slice(counts, F.lit(1), n), zl, lambda a, x: a + x),
    )
    idx = F.element_at(
        F.filter(
            F.sequence(F.lit(1), F.size(counts)),
            lambda i: ((zero_n + F.element_at(cums, i)).cast("double") >= rank)
            & (F.element_at(counts, i) > 0),  # never land in an empty bucket
        ),
        1,
    )
    lower = F.pow(base, off + (idx - 1).cast("double"))
    upper = F.pow(base, off + idx.cast("double"))
    cum_prev = zero_n + F.when(idx == 1, zl).otherwise(F.element_at(cums, idx - 1))
    in_bucket = F.element_at(counts, idx)
    interp = lower + (upper - lower) * (rank - cum_prev.cast("double")) / in_bucket.cast("double")
    val = (
        F.when(total <= 0, F.lit(None).cast("double"))
        .when(zero_n.cast("double") >= rank, F.lit(0.0))
        .when(idx.isNull(), F.lit(None).cast("double"))  # malformed: count > buckets
        .otherwise(interp)
    )
    return df.withColumn(out_col, val)
