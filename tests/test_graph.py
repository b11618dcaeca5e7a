"""Deterministic integer PageRank over host graphs."""

from __future__ import annotations

import pytest

from vector_spark.functions import pagerank

MICRO = 1_000_000


def _pr_reference(edge_list, damping=(85, 100), iters=10):
    """Sequential reimplementation with the identical integer arithmetic —
    the distributed job must match it rank-for-rank."""
    p, q = damping
    edges = sorted(set(edge_list))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = ((q - p) * MICRO) // q
    rank = {n: MICRO for n in nodes}
    for _ in range(iters):
        sums = {n: 0 for n in nodes}
        for s, d in edges:
            sums[d] += rank[s] // outdeg[s]
        rank = {n: base + (p * sums[n]) // q for n in nodes}
    return rank


CHAIN = [("a", "b"), ("b", "c"), ("c", "d")]
STAR = [(f"leaf{i}", "hub") for i in range(8)] + [("hub", "leaf0")]


@pytest.mark.parametrize("edges,iters", [(CHAIN, 5), (STAR, 10),
                                         (CHAIN + STAR + [("d", "hub")], 7)])
def test_pagerank_matches_sequential_reference(spark, edges, iters):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank_micro"] for r in pagerank(df, iters=iters).collect()}
    assert got == _pr_reference(edges, iters=iters)


def test_pagerank_random_graph_matches_reference(spark):
    import random

    r = random.Random(3)
    edges = list({(f"h{r.randrange(40)}", f"h{r.randrange(40)}") for _ in range(300)})
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r2["node"]: r2["rank_micro"] for r2 in pagerank(df, iters=6).collect()}
    assert got == _pr_reference(edges, iters=6)


def test_pagerank_partition_invariant(spark):
    import random

    r = random.Random(9)
    edges = list({(f"h{r.randrange(30)}", f"h{r.randrange(30)}") for _ in range(200)})
    df = spark.createDataFrame(edges, "src string, dst string")
    a = {x["node"]: x["rank_micro"] for x in pagerank(df.repartition(1), iters=4).collect()}
    b = {x["node"]: x["rank_micro"] for x in pagerank(df.repartition(17), iters=4).collect()}
    assert a == b


def test_pagerank_hub_outranks_leaves_and_dangling_gets_base(spark):
    df = spark.createDataFrame(STAR[:-1], "src string, dst string")  # hub dangling
    got = {r["node"]: r["rank_micro"] for r in pagerank(df, iters=5).collect()}
    assert got["hub"] > max(v for k, v in got.items() if k != "hub") * 5
    # leaves have no in-edges: exactly the base (1-d) mass
    assert got["leaf3"] == ((100 - 85) * MICRO) // 100


def test_pagerank_duplicate_edges_and_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", None), (None, "b"), ("b", "a")],
        "src string, dst string",
    )
    got = {r["node"]: r["rank_micro"] for r in pagerank(df, iters=3).collect()}
    assert got == _pr_reference([("a", "b"), ("b", "a")], iters=3)


def test_pagerank_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, iters=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=0.12345)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
