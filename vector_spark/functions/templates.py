"""Log template mining — Drain-style message clustering by variable masking.

Log-analytics engines cluster raw messages into TEMPLATES ("user <NUM>
logged in from <IP>") so operators can see *what kinds* of events a
10^12-row log table holds instead of 10^12 distinct strings.  The
reference's pipeline model stops at per-event transforms (remap/filter,
config_panel.rs:1698-1779); template mining is the corpus-level analysis a
warehouse adds on top.

This implementation is the deterministic core of Drain (He et al., ICWS
2017, "Drain: An Online Log Parsing Approach with Fixed Depth Tree"):
mask the variable tokens with ordered regex passes, then group by the
masked string.  Masking-then-grouping is map-only + ONE hash aggregate —
no tree state, no Python, fully order-independent — and on machine-
generated logs recovers the same templates as the online tree whenever
variables are maskable (numbers, IPs, hex ids, UUIDs, quoted payloads).
Unlike the stateful original it cannot merge templates that differ in an
UNMASKED word position; extend ``masks`` for domain-specific variables
instead.

The mask patterns use only syntax shared by Java regex (Spark) and RE2
(DuckDB/Go), so an ANSI oracle can replay them 1:1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ordered (pattern, replacement) passes — longest/most-specific first so a
#: UUID is not shredded into <NUM>-<NUM>-… by the later passes
DEFAULT_MASKS: list[tuple[str, str]] = [
    (
        r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b",
        "<UUID>",
    ),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b0[xX][0-9a-fA-F]+\b", "<HEX>"),
    # no trailing \b: "212ms"/"8MiB" are number+unit tokens and the digits
    # must still mask ("\b\d+\b" would leave every suffixed number behind)
    (r"\b\d+(\.\d+)?", "<NUM>"),
]


def mask_message(
    col: Column | str, masks: list[tuple[str, str]] | None = None
) -> Column:
    """Apply the ordered mask passes to a message column (pure projection)."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, repl in masks if masks is not None else DEFAULT_MASKS:
        out = F.regexp_replace(out, pat, repl)
    return out


def template_extract(
    df: DataFrame,
    message_col: str = "message",
    *,
    masks: list[tuple[str, str]] | None = None,
    template_col: str = "template",
    id_col: str = "template_id",
) -> DataFrame:
    """Add the mined template string and a stable 64-bit template id to each
    row.  Map-only — a 10^12-row scan stays one codegen stage; route on
    ``template_id`` the way T3 routes on predicates."""
    t = mask_message(message_col, masks)
    return df.withColumn(template_col, t).withColumn(id_col, F.xxhash64(t))


def template_profile(
    df: DataFrame,
    message_col: str = "message",
    *,
    masks: list[tuple[str, str]] | None = None,
    ts_col: str | None = None,
    with_example: bool = True,
) -> DataFrame:
    """Corpus template inventory: one row per template with its frequency and
    a deterministic example (the lexicographically smallest raw message, so
    output is partition-independent).  With ``ts_col``, first/last event
    times are included — the "when did this log shape appear" question.

    ONE aggregate on the template string; template cardinality is tiny next
    to row count (thousands vs 10^12), so the shuffle carries almost
    nothing after map-side partial aggregation.  Cost nuance: ``min`` over
    a STRING buffer forces Spark's SortAggregate (each partition sorts by
    template before combining).  ``with_example=False`` drops the example
    column and the whole profile runs as a plain HashAggregate — the cheap
    mode for count-only monitoring sweeps."""
    t = template_extract(df, message_col, masks=masks)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if with_example:
        aggs.append(F.min(message_col).alias("example"))
    if ts_col is not None:
        aggs += [F.min(ts_col).alias("first_seen"), F.max(ts_col).alias("last_seen")]
    return t.groupBy("template", "template_id").agg(*aggs)


def emerging_templates(
    current: DataFrame,
    baseline: DataFrame,
    message_col: str = "message",
    *,
    masks: list[tuple[str, str]] | None = None,
    min_events: int = 1,
) -> DataFrame:
    """Templates present in ``current`` but ABSENT from ``baseline`` — the
    "what log shape is new since yesterday" deploy/incident signal (a
    template inventory answers "what exists"; operators page on what
    CHANGED).

    Both sides collapse to their template inventories first (template
    cardinality ~thousands), so the anti-join compares aggregate-sized
    tables — at 10^12 rows per side the only full scans are the two
    map-side-combined profile aggregates, and the join moves kilobytes.
    ``min_events`` drops one-off noise templates from the result (a
    template must recur to page on).  Both sides MUST use the same masks;
    this function applies one mask set to both so they cannot drift.
    """
    cur = template_profile(current, message_col, masks=masks)
    base = template_profile(baseline, message_col, masks=masks, with_example=False)
    return (
        cur.join(base.select("template_id"), "template_id", "left_anti")
        .filter(F.col("n_events") >= min_events)
        .select("template", "template_id", "n_events", "example")
    )
