"""as-of join + IP-range enrichment — correctness vs pandas/DuckDB, plan
shape, determinism under repartitioning, and edge cases."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vector_spark.operators import asof_join, ip_range_enrich, validate_ip_ranges


def _mk_frames(seed: int, n_l: int = 300, n_r: int = 90, keys: int = 4):
    rng = np.random.default_rng(seed)
    lp = pd.DataFrame(
        {
            "k": rng.integers(0, keys, n_l),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 50_000, n_l), unit="s"),
            "lv": np.arange(n_l),
        }
    )
    rp = pd.DataFrame(
        {
            "k": rng.integers(0, keys, n_r),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 50_000, n_r), unit="s"),
            "state": rng.integers(0, 10_000, n_r),
        }
    ).drop_duplicates(["k", "ts"])
    return lp, rp


def _expected(lp, rp, direction, tol):
    out = pd.merge_asof(
        lp.sort_values(["ts", "lv"]).reset_index(drop=True),
        rp.sort_values("ts"),
        on="ts",
        by="k",
        direction=direction,
        suffixes=("", "_right"),
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    return out.sort_values("lv").reset_index(drop=True)[["k", "ts", "lv", "state"]]


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tol", [None, 4000.0])
def test_asof_union_matches_pandas(spark, direction, tol):
    lp, rp = _mk_frames(3)
    got = (
        asof_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            on="k",
            ts_col="ts",
            direction=direction,
            tolerance_s=tol,
        )
        .toPandas()
        .sort_values("lv")
        .reset_index(drop=True)[["k", "ts", "lv", "state"]]
    )
    pd.testing.assert_frame_equal(_expected(lp, rp, direction, tol), got, check_dtype=False)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_bucketed_matches_union(spark, direction):
    lp, rp = _mk_frames(5)
    tol = 3000.0
    kw = dict(on="k", ts_col="ts", direction=direction, tolerance_s=tol)
    L, R = spark.createDataFrame(lp), spark.createDataFrame(rp)
    a = asof_join(L, R, **kw).toPandas().sort_values("lv").reset_index(drop=True)
    b = (
        asof_join(L, R, method="bucketed", bucket_s=4500.0, **kw)
        .toPandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_asof_partition_invariance(spark):
    """Repo rule: output is a function of the data, not the layout."""
    lp, rp = _mk_frames(9)
    L, R = spark.createDataFrame(lp), spark.createDataFrame(rp)
    base = (
        asof_join(L.coalesce(1), R.coalesce(1), on="k", ts_col="ts")
        .toPandas().sort_values("lv").reset_index(drop=True)
    )
    shuf = (
        asof_join(L.repartition(17), R.repartition(13), on="k", ts_col="ts")
        .toPandas().sort_values("lv").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, shuf, check_dtype=False)


def test_asof_ts_tie_largest_tiebreaker_wins(spark):
    """Two right rows at the SAME (key, ts): the largest tiebreaker wins in
    both directions and both methods."""
    lp = pd.DataFrame(
        {"k": [1], "ts": pd.to_datetime(["2024-01-01 00:10:00"]), "lv": [0]}
    )
    rp = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime(["2024-01-01 00:10:00"] * 2),
            "rid": [7, 3],
            "state": [70, 30],
        }
    )
    L, R = spark.createDataFrame(lp), spark.createDataFrame(rp)
    for direction in ("backward", "forward"):
        u = asof_join(L, R, on="k", ts_col="ts", direction=direction, tiebreaker="rid")
        assert u.collect()[0]["state"] == 70
        b = asof_join(
            L, R, on="k", ts_col="ts", direction=direction, tiebreaker="rid",
            tolerance_s=60.0, method="bucketed",
        )
        assert b.collect()[0]["state"] == 70


def test_asof_collision_suffix_and_errors(spark):
    lp = pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-01"]), "v": [1]})
    rp = pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-01"]), "v": [9]})
    L, R = spark.createDataFrame(lp), spark.createDataFrame(rp)
    out = asof_join(L, R, on="k", ts_col="ts")
    assert "v_right" in out.columns and out.collect()[0]["v_right"] == 9
    with pytest.raises(ValueError, match="tolerance_s"):
        asof_join(L, R, on="k", ts_col="ts", method="bucketed")
    with pytest.raises(ValueError, match="direction"):
        asof_join(L, R, on="k", ts_col="ts", direction="nearest")
    with pytest.raises(ValueError, match="bucket_s"):
        asof_join(L, R, on="k", ts_col="ts", method="bucketed",
                  tolerance_s=100.0, bucket_s=50.0)


def test_asof_null_key_parity(spark):
    """NULL join keys match NOTHING under SQL equality semantics — both
    methods must agree: NULL-keyed left rows keep a NULL payload, NULL-keyed
    right rows enrich nobody (ADVICE r4: the union method used to group the
    NULLs into one window partition and cross-enrich them)."""
    ts = pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 01:00:00"])
    lp = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"), "ts": ts, "lv": [0, 1]})
    rp = pd.DataFrame(
        {"k": pd.array([1, None], dtype="Int64"),
         "ts": ts - pd.Timedelta(minutes=5), "state": [10, 99]}
    )
    L, R = spark.createDataFrame(lp), spark.createDataFrame(rp)
    for direction in ("backward", "forward"):
        u = (
            asof_join(L, R, on="k", ts_col="ts", direction=direction,
                      tolerance_s=36_000.0)
            .toPandas().sort_values("lv").reset_index(drop=True)
        )
        b = (
            asof_join(L, R, on="k", ts_col="ts", direction=direction,
                      tolerance_s=36_000.0, method="bucketed")
            .toPandas().sort_values("lv").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(u, b, check_dtype=False)
        assert pd.isna(u.loc[1, "state"]), "NULL-keyed left row must not match"
        if direction == "backward":
            assert u.loc[0, "state"] == 10


def test_asof_bucketed_zero_width_raises(spark):
    lp = pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-01"]), "lv": [0]})
    rp = pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-01"]), "state": [1]})
    L, R = spark.createDataFrame(lp), spark.createDataFrame(rp)
    with pytest.raises(ValueError, match="positive bucket width"):
        asof_join(L, R, on="k", ts_col="ts", method="bucketed", tolerance_s=0.0)
    with pytest.raises(ValueError, match="tolerance_s must be >= 0"):
        asof_join(L, R, on="k", ts_col="ts", tolerance_s=-1.0)
    # tolerance_s=0 on the union method IS valid: exact-ts matching
    out = asof_join(L, R, on="k", ts_col="ts", tolerance_s=0.0)
    assert out.collect()[0]["state"] == 1


def test_asof_union_plan_has_no_join(spark):
    """The union method's selling point: ONE exchange on the key, zero join
    nodes — the fact side never builds or probes a hash table."""
    lp, rp = _mk_frames(1)
    plan = (
        asof_join(spark.createDataFrame(lp), spark.createDataFrame(rp), on="k", ts_col="ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def _mk_ranges(seed: int, n: int = 40):
    rng = np.random.default_rng(seed)
    starts = np.sort(rng.choice(2**32 - 10_000_000, n, replace=False).astype(np.int64))
    ends = np.minimum(
        starts + rng.integers(1, 6_000_000, n), np.append(starts[1:] - 1, 2**32 - 1)
    )
    return pd.DataFrame(
        {"start_ip": starts, "end_ip": ends, "label": [f"r{i}" for i in range(n)]}
    )


def test_ip_range_enrich_matches_duckdb(spark):
    rp = _mk_ranges(2)
    rng = np.random.default_rng(4)
    # half the probes land INSIDE a range so the match path is non-vacuous
    inside = rp.start_ip.values[rng.integers(0, len(rp), 500)] + rng.integers(0, 1000, 500)
    ips = pd.DataFrame(
        {"id": np.arange(1000), "ip": np.concatenate([rng.integers(0, 2**32, 500), inside])}
    )
    got = (
        ip_range_enrich(spark.createDataFrame(ips), spark.createDataFrame(rp), "ip")
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    assert got.label.notna().sum() >= 500
    exp = duckdb.sql(
        "select d.id, d.ip, r.label from ips d left join rp r "
        "on d.ip between r.start_ip and r.end_ip order by d.id"
    ).df()
    pd.testing.assert_frame_equal(exp, got[["id", "ip", "label"]], check_dtype=False)


def test_ip_range_enrich_is_hash_join(spark):
    rp, ips = _mk_ranges(6), pd.DataFrame({"id": [1], "ip": [12345]})
    plan = (
        ip_range_enrich(spark.createDataFrame(ips), spark.createDataFrame(rp), "ip")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "NestedLoop" not in plan


def test_ip_range_enrich_inverted_range_errors(spark):
    """An inverted range must error loudly inside the job, not silently
    mis-enrich via a descending prefix sequence (ADVICE r4)."""
    from py4j.protocol import Py4JJavaError

    rp = _mk_ranges(7)
    rp.loc[2, "end_ip"] = rp.loc[2, "start_ip"] - 1
    ips = pd.DataFrame({"id": [1], "ip": [int(rp.start_ip.iloc[0])]})
    with pytest.raises(Exception, match="inverted range") as exc:
        ip_range_enrich(
            spark.createDataFrame(ips), spark.createDataFrame(rp), "ip"
        ).collect()
    assert isinstance(exc.value, Py4JJavaError) or "inverted" in str(exc.value)


def test_ip_range_enrich_suffixes_colliding_payload(spark):
    """Range payload columns colliding with df column names get the _range
    suffix instead of producing ambiguous duplicates (ADVICE r4)."""
    rp = _mk_ranges(3).rename(columns={"label": "host"})
    ips = pd.DataFrame(
        {"id": [1, 2], "host": ["a", "b"],
         "ip": [int(rp.start_ip.iloc[0]), 5]}
    )
    out = ip_range_enrich(spark.createDataFrame(ips), spark.createDataFrame(rp), "ip")
    assert "host_range" in out.columns and out.columns.count("host") == 1
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["host"] == "a" and rows[1]["host_range"] == "r0"
    assert rows[2]["host_range"] is None


def test_validate_ip_ranges(spark):
    rp = _mk_ranges(8)
    validate_ip_ranges(spark.createDataFrame(rp))
    bad = rp.copy()
    bad.loc[1, "start_ip"] = bad.loc[0, "end_ip"]  # overlap
    with pytest.raises(ValueError, match="overlap"):
        validate_ip_ranges(spark.createDataFrame(bad))
    inv = rp.copy()
    inv.loc[3, "end_ip"] = inv.loc[3, "start_ip"] - 1  # inverted
    with pytest.raises(ValueError):
        validate_ip_ranges(spark.createDataFrame(inv))
