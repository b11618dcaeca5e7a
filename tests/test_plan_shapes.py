"""Plan-shape regression guards: the scale claims in PLANS.md, enforced.

Each test pins the EXECUTED plan property the docs assert — exchange
counts, broadcast joins, pushed filters — so a refactor that silently adds
a shuffle or drops a broadcast fails CI instead of surviving until someone
re-reads an explain output at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(df) -> int:
    # SHUFFLE exchanges only: broadcasts move a dim table, not the data,
    # and AQE's reused exchanges are not extra work
    p = _plan(df)
    return p.count("Exchange") - p.count("BroadcastExchange") - p.count("ReusedExchange")


@pytest.fixture(scope="module")
def docs(spark):
    from vector_spark import synth

    return synth.documents(spark, 2000)


def test_flagship_routed_single_scan_no_shuffle(spark, docs):
    """Parse → enrich → route is map-only: broadcast joins for dims, zero
    exchanges before the sink write (PLANS.md 'one shuffle' is the agg)."""
    from vector_spark.plans import flagship

    routed = flagship.route_stage(
        flagship.enrich_stage(flagship.parse_stage(docs), spark)
    )
    p = _plan(routed)
    assert _exchanges(routed) == 0
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def test_quality_pipeline_is_map_only(spark, docs):
    """C4 + Gopher + repetition + quality features: zero exchanges — the
    whole per-document analysis runs at scan speed."""
    from vector_spark.functions import (
        c4_line_filter,
        gopher_quality_filter,
        quality_features,
        repetition_features,
    )

    out = repetition_features(
        quality_features(gopher_quality_filter(c4_line_filter(docs)))
    )
    assert _exchanges(out) == 0


def test_exact_dedup_single_shuffle(spark, docs):
    from vector_spark.functions import exact_dedup

    out = exact_dedup(docs.withColumn("doc_id", F.xxhash64("url")), "doc_id")
    # one hash-agg = one exchange (plus whatever AQE reuses)
    assert _exchanges(out) <= 2  # agg + the join back of the keeper row
    assert "HashAggregate" in _plan(out)


def test_enrich_join_is_broadcast(spark, docs):
    from vector_spark import synth
    from vector_spark.operators.enrich import enrich as enrich_fn

    parsed = docs.withColumn(
        "host", F.regexp_extract("url", r"https://([^/]+)/", 1)
    )
    out = enrich_fn(parsed, synth.host_geo(spark), on="host")
    p = _plan(out)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_scan_pushdown_filter_and_pruning(spark, tmp_path):
    """A filtered 2-column projection over parquet must push the filter
    into the scan and read only the needed columns."""
    from vector_spark import synth

    path = str(tmp_path / "docs")
    synth.documents(spark, 1000).write.parquet(path)
    df = (
        spark.read.parquet(path)
        .filter(F.col("lang") == "en")
        .select("url", "lang")
    )
    p = _plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in p
    assert "ReadSchema" in p and "html" not in p.split("ReadSchema")[1][:200]


def test_semdedup_plan_is_one_cell_shuffle(spark):
    """SemDeDup's prune is ONE groupBy(cell) into the pairwise-matmul
    kernel (FlatMapGroupsInPandas) plus the anti-join back — never a
    nested-loop/cartesian product, never a B²/2 pair-row join, and the
    ROUTING projection stays Python-free on the oracle path (the only
    Python in the plan is the sanctioned per-cell kernel)."""
    import numpy as np

    from vector_spark.functions import semdedup

    rng = np.random.default_rng(5)
    m = rng.standard_normal((64, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    out = semdedup(df, "vec_id", threshold=0.95, k=8, keep="centroid_far")
    out.collect()
    p = _plan(out)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "FlatMapGroupsInPandas" in p
    # no row-wise Python: routing is JVM expressions on the oracle path
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # worst case (no broadcasts on a stats-free local relation): the
    # groupBy(cell) shuffle + anti-join 2 sides + one AQE stage
    # re-exchange = 4; more would mean a refactor added a shuffle (at
    # scale the dominated-id side broadcasts and this collapses further)
    assert _exchanges(out) <= 4


def test_pack_offsets_single_shuffle(spark):
    """The packed-offset plan is EXACTLY one shuffle (the in-shard window);
    shard bases arrive as a literal CASE, not a join — a second exchange
    would mean the prefix sum degenerated toward a global sort."""
    from vector_spark.functions import pack_offsets

    df = spark.range(500).selectExpr("id AS doc_id", "CAST(id % 9 + 1 AS INT) AS n_tok")
    out = pack_offsets(df, "n_tok", "doc_id", seq_len=64, n_shards=8)
    out.collect()
    # AdaptiveSparkPlan.toString prints final AND initial plans — count
    # exchanges in the final section only
    p = _plan(out).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert p.count("Exchange") - p.count("BroadcastExchange") - p.count("ReusedExchange") == 1
    assert "Window" in p


def test_quality_classifier_scoring_is_jvm_only(spark):
    """Scoring with the frozen model is a pure JVM map — tokenize (codegen
    split), NGram + HashingTF + LR.transform (MLlib JVM): no Python
    workers, no shuffle in the scoring plan."""
    from vector_spark.functions import score_quality, train_quality_classifier

    pos = spark.createDataFrame([(i, "alpha beta gamma") for i in range(30)], "id long, text string")
    neg = spark.createDataFrame([(i, "zeta eta theta") for i in range(30)], "id long, text string")
    m = train_quality_classifier(pos, neg, n_features=1 << 10, max_iter=5)
    out = score_quality(pos.unionByName(neg), m)
    out.collect()
    p = _plan(out)
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "FlatMapGroupsInPandas" not in p
    assert _exchanges(out) == 0


def test_lm_training_is_one_shuffle_jvm_only(spark):
    """ngram_counts builds every order's grams IN-ROW and feeds one explode
    into one map-side-combined hash agg: exactly ONE shuffle (keyed on the
    gram), no Python workers — the Brants et al. count-extraction shape."""
    from vector_spark.functions import ngram_counts

    df = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(200)], "id long, text string"
    )
    counts = ngram_counts(df, order=3)
    counts.collect()
    # AQE's toString appends an "== Initial Plan ==" copy — count the
    # executed (final) section only
    p = _plan(counts).split("== Initial Plan")[0]
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert p.count("Exchange") - p.count("BroadcastExchange") - p.count("ReusedExchange") == 1


def test_lm_scoring_is_jvm_only(spark):
    """stupid_backoff_score is explode → count-table joins → hash agg: all
    JVM (no Python workers), and no nested-loop/cartesian fallback — the
    totals are driver literals, never a cross join in the scoring plan."""
    from vector_spark.functions import ngram_counts, stupid_backoff_score

    df = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(200)], "doc_id long, text string"
    )
    counts = ngram_counts(df, order=2)
    out = stupid_backoff_score(df, counts)
    out.collect()
    p = _plan(out)
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_read_table_clean_path_has_no_join(spark, tmp_path):
    """The merge-on-read anti-join must never leak into the common path: a
    sink with NO pending tombstones reads as a pure scan (no join operator,
    no shuffle), and one WITH tombstones adds exactly the anti-join."""
    from vector_spark import synth
    from vector_spark.plans import checkpoint as CP
    from vector_spark.plans import table_format as TF

    base = str(tmp_path / "t")
    docs = CP.with_part_key(synth.documents(spark, 400).drop("html"),
                            n_parts=2, key_cols=["url"])
    TF.write_multi_sink({"logs": docs}, base)
    clean = TF.read_table(spark, base, "logs")
    assert "Join" not in _plan(clean)
    assert _exchanges(clean) == 0

    TF.delete_where(spark, base, "logs", "lang = 'de'", mode="merge-on-read")
    mor = TF.read_table(spark, base, "logs")
    assert "LeftAnti" in _plan(mor)

    TF.materialize_deletes(spark, base, "logs")
    again = TF.read_table(spark, base, "logs")
    assert "Join" not in _plan(again)
    assert _exchanges(again) == 0


def test_r5_vrl_queries_are_map_only(spark):
    """vrl_parse_logfmt / vrl_redact_hash: zero exchanges, no Python —
    the r5 palette stays inside one codegen projection (PLANS.md r5)."""
    import __spark_entry__ as entry

    for name in ("vrl_parse_logfmt", "vrl_redact_hash"):
        df = entry.queries()[name](spark, "/root/testdata/sf0.001")
        assert _exchanges(df) == 0, name
        assert "Python" not in _plan(df), name


def test_multiline_single_shuffle(spark):
    """assemble_multiline: the Window's host partitioning satisfies the
    fold's (host, event_id) clustering — ONE exchange total, no Python."""
    from vector_spark.operators import assemble_multiline

    lines = spark.createDataFrame(
        [("a", 1, "2024-01-01 x"), ("a", 2, "  y")],
        "host string, line_no long, message string",
    )
    out = assemble_multiline(lines, r"^\d{4}-", stream_by=["host"])
    assert _exchanges(out) == 1
    assert "Python" not in _plan(out)


def test_over_time_single_shuffle(spark):
    """over_time: one map-side-combined aggregate — a single exchange on
    (series, window), no Python."""
    from vector_spark.operators import over_time

    df = spark.createDataFrame(
        [("s", "2024-01-01 00:00:01", 1.0, 1)],
        "series string, ts string, value double, i int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = over_time(df, ["series"], 60, ts_col="ts", quantiles=(0.5,), tiebreaker="i")
    assert _exchanges(out) == 1
    assert "Python" not in _plan(out)
