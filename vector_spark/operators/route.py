"""`route` — split one stream into named outputs by per-route predicates (T3).

Reference: config_panel.rs:1643-1667 — routes are a {name: condition} map,
e.g. `{"errors": ".level == \"error\"", "warnings": ".level == \"warn\""}`
(:1656-1661); downstream components select a named output via
`Connection.from_port` (shared/src/config.rs:224-226).  Vector routes are
first-match-wins in declaration order, with an implicit `_unmatched` output.

Spark design for 100 TB: the predicate fan-out must NOT rescan the input once
per route.  `tag_routes` evaluates every condition in ONE pass (a chained
`F.when`), producing a `route` column; callers then either

  * write once, partitioned by `route` (`write_routed` in sinks.py) — a
    single scan, a single shuffle-free write, routes become partition dirs; or
  * `split()` per-route DataFrames off a persisted tagged parent — one scan
    materialized, N cheap partition-pruned filters.

Both avoid the naive N-scans plan that would read 100 TB × N routes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.vrl import compile_condition

UNMATCHED = "_unmatched"


def tag_routes(
    df: DataFrame,
    routes: dict[str, str | Column],
    route_col: str = "route",
    event_kind: str = "log",
) -> DataFrame:
    """Add a `route` column: first matching route name, else `_unmatched`.

    First-match-wins in dict order (Python dicts preserve insertion order,
    matching Vector's declaration-order semantics).
    """
    expr: Column | None = None
    for name, cond in routes.items():
        c = cond if isinstance(cond, Column) else compile_condition(cond, event_kind=event_kind)
        expr = F.when(c, F.lit(name)) if expr is None else expr.when(c, F.lit(name))
    if expr is None:
        return df.withColumn(route_col, F.lit(UNMATCHED))
    return df.withColumn(route_col, expr.otherwise(F.lit(UNMATCHED)))


def split(
    tagged: DataFrame,
    route_names: list[str],
    route_col: str = "route",
    include_unmatched: bool = True,
    persist: bool = True,
) -> dict[str, DataFrame]:
    """Named-output dict (≙ from_port selection). Persists the tagged parent
    so the N filters share one materialized scan."""
    if persist:
        tagged = tagged.persist()
    names = list(route_names) + ([UNMATCHED] if include_unmatched else [])
    return {name: tagged.filter(F.col(route_col) == name) for name in names}


def route_all_matches(
    df: DataFrame,
    routes: dict[str, str | Column],
    event_kind: str = "log",
    include_unmatched: bool = True,
    persist: bool = True,
) -> dict[str, DataFrame]:
    """Upstream-Vector route semantics: an event goes to EVERY output whose
    condition matches (not just the first), plus `_unmatched` when none do
    — vector.dev's route transform explicitly allows multi-route matches.

    One pass over the input: every condition is evaluated in the same
    projection (a boolean column per route — no per-route rescan of the
    source; the persisted parent is shared by the N output filters exactly
    like `split`).  `tag_routes` (single `route` column, first-match-wins)
    remains the partition-friendly variant used by the flagship fan-out
    write — a partition column can hold only one value per row, so
    multi-match outputs pay either row duplication (here: only in outputs
    that actually match) or a second write."""
    flags = df
    flag_cols: dict[str, str] = {}
    for name, cond in routes.items():
        c = cond if isinstance(cond, Column) else compile_condition(cond, event_kind=event_kind)
        flag_col = f"_route_{name}"
        flags = flags.withColumn(flag_col, F.coalesce(c, F.lit(False)))
        flag_cols[name] = flag_col
    if persist:
        flags = flags.persist()
    out = {
        name: flags.filter(F.col(col)).drop(*flag_cols.values())
        for name, col in flag_cols.items()
    }
    if include_unmatched:
        none_match = ~F.coalesce(
            F.greatest(*[F.col(c) for c in flag_cols.values()]) if len(flag_cols) > 1
            else F.col(next(iter(flag_cols.values()))),
            F.lit(False),
        ) if flag_cols else F.lit(True)
        out[UNMATCHED] = flags.filter(none_match).drop(*flag_cols.values())
    return out
