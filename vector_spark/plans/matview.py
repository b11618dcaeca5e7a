"""Incremental materialized-view maintenance over the table shim — the
"refresh the dashboard rollup in O(delta), not O(table)" primitive that
ties the changelog reader to the algebraic-merge rule.

A matview here is a grouped aggregate of one table-shim sink, STORED as
another sink in the same base, plus a tiny sidecar recording which source
snapshot the stored rows reflect.  Refresh mechanics:

1. ``read_table_changes(src, from=state.version, to=now)`` — the O(delta)
   changelog (plans/table_format.py).  Inserts-only windows are the
   supported case (the log-pipeline norm: facts append, rollups follow).
2. The delta rows aggregate to per-group PARTIALS with the same
   first-level expressions ``rollup_hypertable`` uses (count/sum/min/max —
   the algebraic aggregates whose partials merge exactly; derive avg as
   sum/count).
3. Affected groups' CURRENT rows are read back (a semi-join against the
   delta's group keys — O(affected groups), never the whole view), merged
   with the partials under the merge rule (count merges by sum, sum by
   sum, min/max by themselves), and written back with ``upsert_keys`` —
   ONE atomic cdc_upsert snapshot, so a concurrent reader sees the view
   before or after the refresh, never half of it.

Stored rows carry ``_mv_key`` — ``to_json(struct(group_cols))`` with
nulls kept — as the upsert key: the shim's equality tombstones are
null-REJECTING by design (its delete_where NULL-predicate rule), so a
NULL group value could never be replaced if the group columns were the
key; the surrogate is non-null and injective per group, making NULL
groups first-class.

Refusal over wrongness, the shim's house rule: a window containing DELETE
changes cannot be merged (count/sum would need reversal against blind
key-deletes that carry no pre-image; min/max are not reversible at all) —
``matview_refresh`` raises :class:`IncrementalUnavailable` instead of
producing a silently-stale view, exactly like the changelog reader it sits
on; ``matview_build(overwrite=True)`` is the recovery path.  The same
exception propagates for non-derivable changelog windows (COW rewrites,
expired history, vacuumed bytes).

Scale shape: one changelog read (O(delta) files), one delta aggregate
(shuffle = affected groups), one semi-join read-back (pruned to affected
groups), one scan-free atomic upsert.  The source table is never
rescanned after the initial build.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.operators.aggregate import _MERGEABLE
from vector_spark.plans.checkpoint import PART_COL, with_part_key
from vector_spark.plans.table_format import (
    CommitLog,
    IncrementalUnavailable,
    delete_where,
    materialize_deletes,
    read_table,
    read_table_changes,
    upsert_keys,
)

__all__ = ["matview_build", "matview_refresh", "matview_state"]

_STATE = "_mv_state.json"


def _state_path(base: str, mv_sink: str) -> str:
    return os.path.join(base, mv_sink, _STATE)


def matview_state(base: str, mv_sink: str) -> dict | None:
    """The sidecar state (``{"src_sink": ..., "src_version": N}``), or None
    if the view was never built."""
    try:
        with open(_state_path(base, mv_sink)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _write_state(base: str, mv_sink: str, state: dict) -> None:
    # atomic publish, same discipline as every shim commit
    os.makedirs(os.path.join(base, mv_sink), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.join(base, mv_sink), prefix="._mv_")
    with os.fdopen(fd, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, _state_path(base, mv_sink))


def _check_aggs(aggs: dict, group_cols: list[str]) -> None:
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if not aggs:
        raise ValueError("aggs must be non-empty")
    for name, (how, _col) in aggs.items():
        if how not in _MERGEABLE:
            raise ValueError(
                f"aggregate {how!r} for {name!r} is not mergeable "
                f"(supported: {sorted(_MERGEABLE)}); derive avg as sum/count"
            )
        if name in group_cols:
            raise ValueError(f"agg name {name!r} collides with a group column")


def _with_key(df: DataFrame, group_cols: list[str]) -> DataFrame:
    # non-null injective surrogate of the group tuple (field order is
    # group_cols order, nulls serialized explicitly)
    return df.withColumn(
        "_mv_key",
        F.to_json(
            F.struct(*[F.col(c) for c in group_cols]),
            {"ignoreNullFields": "false"},
        ),
    )


def _first_level(df: DataFrame, group_cols: list[str], aggs: dict) -> DataFrame:
    exprs = [
        _MERGEABLE[how][0](col).alias(name) for name, (how, col) in aggs.items()
    ]
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(*exprs)


def _merge_level(df: DataFrame, group_cols: list[str], aggs: dict) -> DataFrame:
    exprs = [
        _MERGEABLE[how][1](name).alias(name) for name, (how, _col) in aggs.items()
    ]
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(*exprs)


def matview_build(
    spark: SparkSession,
    base: str,
    src_sink: str,
    mv_sink: str,
    group_cols: list[str],
    aggs: dict,
    part_col: str = PART_COL,
    n_parts: int = 8,
    overwrite: bool = False,
) -> dict:
    """Full build: aggregate the source sink's CURRENT rows into the view
    sink and pin the source version the rows reflect.  Refuses to clobber
    an existing view unless ``overwrite=True`` (which first COW-deletes
    every stored row, so stale groups from the old build cannot linger)."""
    _check_aggs(aggs, group_cols)
    st = matview_state(base, mv_sink)
    if st is not None and not overwrite:
        raise ValueError(
            f"matview {mv_sink!r} already built (src_version "
            f"{st['src_version']}) — use matview_refresh, or overwrite=True"
        )
    # capture the version BEFORE reading, so concurrent appends land in the
    # next refresh window instead of silently splitting this one
    src_version = CommitLog(base).current_version()
    if st is not None:
        # the view's own upsert history leaves pending equality tombstones;
        # settle them first — the shim refuses COW rewrites over pending
        # merge-on-read state (they would orphan the tombstones)
        materialize_deletes(spark, base, mv_sink)
        delete_where(spark, base, mv_sink, F.lit(True), part_col=part_col)
    full = with_part_key(
        _with_key(
            _first_level(read_table(spark, base, src_sink), group_cols, aggs),
            group_cols,
        ),
        n_parts, key_cols=["_mv_key"],
    )
    upsert_keys(
        spark, base, mv_sink, full, ["_mv_key"], part_col=part_col,
        run_id=f"mv-build-{src_version}",
    )
    _write_state(base, mv_sink, {"src_sink": src_sink, "src_version": src_version})
    return {"mode": "full", "src_version": src_version}


def matview_refresh(
    spark: SparkSession,
    base: str,
    src_sink: str,
    mv_sink: str,
    group_cols: list[str],
    aggs: dict,
    part_col: str = PART_COL,
    n_parts: int = 8,
) -> dict:
    """Incremental refresh: fold the source's changelog since the last
    refresh into the stored view.  O(delta) end to end; raises
    :class:`IncrementalUnavailable` (refusal, never a stale-but-plausible
    view) when the window holds deletes or is not changelog-derivable —
    rebuild with ``matview_build(overwrite=True)``."""
    _check_aggs(aggs, group_cols)
    st = matview_state(base, mv_sink)
    if st is None:
        raise ValueError(f"matview {mv_sink!r} was never built — run matview_build")
    if st["src_sink"] != src_sink:
        raise ValueError(
            f"matview {mv_sink!r} tracks source {st['src_sink']!r}, not {src_sink!r}"
        )
    from_v = int(st["src_version"])
    to_v = CommitLog(base).current_version()
    if to_v <= from_v:
        return {"mode": "noop", "src_version": from_v}
    changes = read_table_changes(
        spark, base, src_sink, from_v, to_version=to_v, part_col=part_col
    )
    if changes is None:
        _write_state(base, mv_sink, {"src_sink": src_sink, "src_version": to_v})
        return {"mode": "noop", "src_version": to_v}
    if changes.where(F.col("_change_type") == "delete").limit(1).count() > 0:
        raise IncrementalUnavailable(
            f"source window ({from_v}, {to_v}] contains deletes — merged "
            "aggregates cannot be reversed against blind key-deletes; "
            "rebuild with matview_build(overwrite=True)"
        )
    delta_rows = changes.where(F.col("_change_type") == "insert")
    delta = _first_level(delta_rows, group_cols, aggs).persist()
    try:
        n_groups = delta.count()
        if n_groups == 0:
            _write_state(base, mv_sink, {"src_sink": src_sink, "src_version": to_v})
            return {"mode": "noop", "src_version": to_v}
        keyed_delta = _with_key(delta, group_cols)
        keys = keyed_delta.select("_mv_key")
        cur = read_table(spark, base, mv_sink)
        # the surrogate is non-null, so a plain equi-semi-join covers NULL
        # group values too
        current = cur.join(keys, "_mv_key", "left_semi")
        merged = with_part_key(
            _with_key(
                _merge_level(
                    current.select(*group_cols, *aggs.keys()).unionByName(delta),
                    group_cols,
                    aggs,
                ),
                group_cols,
            ),
            n_parts, key_cols=["_mv_key"],
        )
        upsert_keys(
            spark, base, mv_sink, merged, ["_mv_key"], part_col=part_col,
            run_id=f"mv-refresh-{to_v}",
        )
    finally:
        delta.unpersist()
    _write_state(base, mv_sink, {"src_sink": src_sink, "src_version": to_v})
    return {"mode": "incremental", "src_version": to_v, "groups_updated": n_groups}
