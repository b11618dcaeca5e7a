"""Multiline log assembly — join continuation lines (stack traces, wrapped
messages) into one event before parsing.

Upstream Vector handles this with the file source's ``multiline`` options
(start_pattern / condition_pattern / mode); the reference UI does not expose
it, but any log pipeline over raw line-oriented input needs it before the
remap stage sees whole events — a Java stack trace parsed line-by-line is
garbage.  Batch semantics here; the operator is deterministic under any
partitioning because event boundaries are a pure function of the data.

Spark design (no Python, two exchanges both keyed by the stream id):

1. boundary flag: ``is_start`` = one codegen regex per line
     * mode="start_pattern": a line MATCHING the pattern begins a new event
       (Vector's halt_before shape — e.g. ``^\\d{4}-`` timestamped heads,
       continuation lines are the non-matching tail)
     * mode="continuation": a line matching the pattern CONTINUES the
       previous event (e.g. ``^\\s`` indented stack frames); is_start is the
       negation
2. event id: running sum of is_start over a Window partitioned by the
   stream key ordered by line number — the standard gaps-and-islands
   segmentation, one shuffle on the stream key
3. fold: groupBy(stream, event_id) → sort_array of (line_no, text) structs
   → transform + array_join — explicit in-event ordering, so the result is
   identical however Spark partitioned the lines (never collect_list order)

An orphan continuation line before the first start (file begins mid-event
after rotation) lands in event_id 0 and is kept, flagged ``orphan`` —
dropping data silently is never the default.

Scale: the Window and the groupBy share the stream-id key, so AQE plans one
shuffle's worth of movement per stage on a key with natural cardinality
(one per file/host/container) — hot streams are bounded by per-stream line
rate, the same bound a single-node tailer pays.  State per group is one
event's lines, not the file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assemble_multiline(
    df: DataFrame,
    pattern: str,
    *,
    mode: str = "start_pattern",
    stream_by: list[str] | None = None,
    order_by: str = "line_no",
    text_col: str = "message",
    joiner: str = "\n",
) -> DataFrame:
    """Fold consecutive lines into multiline events.

    Returns one row per assembled event: the stream keys, ``event_id``
    (0-based per stream; 0 only for an orphan head), ``first_line``
    (the ``order_by`` value of the event's first line), ``message``
    (lines joined with ``joiner``), ``n_lines``, and ``orphan`` (true for
    a leading fragment that began before the first detected start).
    """
    if mode not in ("start_pattern", "continuation"):
        raise ValueError(
            f"mode must be 'start_pattern' or 'continuation', got {mode!r}"
        )
    if not pattern:
        raise ValueError("pattern must be a non-empty regex")
    stream_by = stream_by or []
    text = F.col(text_col).cast("string")
    matches: Column = text.rlike(pattern)
    is_start = matches if mode == "start_pattern" else ~matches

    w = (
        Window.partitionBy(*[F.col(c) for c in stream_by])
        .orderBy(F.col(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = df.select(
        *stream_by,
        F.col(order_by).alias("_ln"),
        text.alias("_text"),
        F.sum(is_start.cast("long")).over(w).alias("event_id"),
    )
    lines = F.sort_array(
        F.collect_list(F.struct(F.col("_ln").alias("ln"), F.col("_text").alias("t")))
    )
    return (
        seg.groupBy(*stream_by, "event_id")
        .agg(
            F.min("_ln").alias("first_line"),
            F.array_join(
                F.transform(lines, lambda s: s["t"]), joiner
            ).alias("message"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .withColumn("orphan", F.col("event_id") == 0)
    )
