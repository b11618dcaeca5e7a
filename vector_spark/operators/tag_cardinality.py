"""`tag_cardinality_limit` — cap distinct tag values per metric tag (T11).

Reference: palette-only entry (palette.rs:146).  Vector's semantics: track
distinct values per tag; once a tag exceeds `value_limit` distinct values,
either drop the tag from new events ("drop_tag") or drop the event
("drop_event").  Default value_limit=500, action=drop_tag.

Spark batch design: "first N distinct values survive" needs an order to be
deterministic — we rank each tag value by its FIRST occurrence (min of an
order column) via one aggregate + broadcast join of the small allowed-set
(≤ value_limit rows per tag, so the join side is tiny by construction and
always broadcastable — no shuffle on the big side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tag_cardinality_limit(
    df: DataFrame,
    tag_col: str,
    value_limit: int = 500,
    order_by: str | None = None,
    action: str = "drop_tag",
    overflow_value: str = "__overflow__",
) -> DataFrame:
    """Keep only the first `value_limit` distinct values of `tag_col`.

    action="drop_tag": overflow values are replaced with `overflow_value`
    (the tag is "dropped" but the event survives, as in Vector).
    action="drop_event": overflow rows are filtered out.
    """
    order = F.col(order_by) if order_by else F.col(tag_col)
    firsts = df.groupBy(tag_col).agg(F.min(order).alias("_first_seen"))
    # First `value_limit` by first-occurrence: orderBy().limit() plans as a
    # distributed TakeOrderedAndProject (per-partition top-k + driver merge of
    # value_limit rows) — unlike a global row_number() Window, which moves every
    # distinct tag value to ONE partition (millions of rows on one task for the
    # high-cardinality tags this operator exists for).
    allowed = (
        firsts.orderBy("_first_seen", tag_col)
        .limit(value_limit)
        .select(F.col(tag_col).alias("_allowed_value"))
    )
    joined = df.join(
        F.broadcast(allowed), df[tag_col] == allowed["_allowed_value"], "left"
    )
    if action == "drop_event":
        return joined.filter(F.col("_allowed_value").isNotNull()).drop("_allowed_value")
    return joined.withColumn(
        tag_col,
        F.when(F.col("_allowed_value").isNotNull(), F.col(tag_col)).otherwise(
            F.lit(overflow_value)
        ),
    ).drop("_allowed_value")
