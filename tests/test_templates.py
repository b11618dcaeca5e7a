"""Log template mining — mask passes, profile aggregate, determinism."""

from __future__ import annotations

from datetime import datetime

import pytest

from vector_spark.functions import mask_message, template_extract, template_profile


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        (1, "user 101 logged in from 10.2.3.44", datetime(2024, 1, 1, 0, 0, 1)),
        (2, "user 9 logged in from 192.168.0.1", datetime(2024, 1, 1, 0, 0, 2)),
        (3, "user 101 logged in from 10.2.3.45", datetime(2024, 1, 1, 0, 0, 9)),
        (4, "request 5f2b0c1e-9a3d-4e2b-8c1d-aa00bb11cc22 failed with 0xdeadBEEF", datetime(2024, 1, 1, 0, 1, 0)),
        (5, "latency 12.75 ms on shard 3", datetime(2024, 1, 1, 0, 2, 0)),
        (6, "timeout after 212ms reading 8MiB", datetime(2024, 1, 1, 0, 3, 0)),
    ]
    return spark.createDataFrame(rows, "id int, message string, ts timestamp")


def test_mask_passes_ordered(logs):
    out = {r["id"]: r["template"] for r in template_extract(logs).collect()}
    assert out[1] == "user <NUM> logged in from <IP>"
    assert out[2] == "user <NUM> logged in from <IP>"
    # UUID masked whole (not shredded into <NUM>/<HEX> pieces); 0x hex masked
    assert out[4] == "request <UUID> failed with <HEX>"
    # decimal numbers collapse to one <NUM>
    assert out[5] == "latency <NUM> ms on shard <NUM>"
    # number+unit tokens mask their digits (no trailing word boundary)
    assert out[6] == "timeout after <NUM>ms reading <NUM>MiB"


def test_template_ids_stable_and_distinct(logs):
    rows = template_extract(logs).collect()
    ids = {r["template"]: r["template_id"] for r in rows}
    assert len(set(ids.values())) == len(ids)  # distinct templates -> distinct ids
    again = {r["template"]: r["template_id"] for r in template_extract(logs).collect()}
    assert ids == again


def test_template_profile_counts_and_example(logs):
    prof = {r["template"]: r for r in template_profile(logs, ts_col="ts").collect()}
    login = prof["user <NUM> logged in from <IP>"]
    assert login["n_events"] == 3
    # deterministic example: lexicographically smallest raw message
    assert login["example"] == "user 101 logged in from 10.2.3.44"
    assert login["first_seen"] == datetime(2024, 1, 1, 0, 0, 1)
    assert login["last_seen"] == datetime(2024, 1, 1, 0, 0, 9)
    assert prof["latency <NUM> ms on shard <NUM>"]["n_events"] == 1


def test_profile_partition_invariant(spark, logs):
    a = sorted(map(tuple, template_profile(logs.repartition(1)).collect()))
    b = sorted(map(tuple, template_profile(logs.repartition(13, "message")).collect()))
    assert a == b


def test_profile_count_only_fast_path(spark, logs):
    prof = template_profile(logs, with_example=False)
    assert "example" not in prof.columns
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan and "SortAggregate" not in plan
    counts = {r["template"]: r["n_events"] for r in prof.collect()}
    assert counts["user <NUM> logged in from <IP>"] == 3


def test_custom_masks(logs):
    masks = [(r"user \d+", "user <ID>")]
    out = logs.select(mask_message("message", masks).alias("m")).collect()
    assert out[0]["m"] == "user <ID> logged in from 10.2.3.44"


def test_emerging_templates(spark):
    """Templates in current-but-not-baseline surface; shared shapes and
    sub-min_events noise do not."""
    from vector_spark.functions import emerging_templates

    base = spark.createDataFrame(
        [("user 1 logged in",), ("user 2 logged in",), ("cache miss for key 9",)],
        "message string",
    )
    cur = spark.createDataFrame(
        [("user 3 logged in",),            # same template as baseline
         ("disk full on node 7",),         # NEW, recurs
         ("disk full on node 8",),
         ("one-off glitch 42",)],          # NEW but single event
        "message string",
    )
    out = emerging_templates(cur, base, min_events=2).collect()
    assert len(out) == 1
    assert out[0].template == "disk full on node <NUM>"
    assert out[0].n_events == 2
    assert out[0].example == "disk full on node 7"
