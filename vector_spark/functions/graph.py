"""Host-graph ranking for web-corpus curation: deterministic PageRank.

Common Crawl publishes host- and domain-level ranks (PageRank / harmonic
centrality over the host webgraph) precisely because corpus curators weight
and filter documents by the standing of their host — the quality signal
that needs no content model at all.  This module is that ranker as Spark
joins and aggregates (Page, Brin, Motwani, Winograd 1999; the MapReduce
formulation is the textbook iterative join+agg).

Determinism discipline — INTEGER arithmetic end-to-end: ranks live in
micro-units (1.0 = 1_000_000), damping is a rational p/q (0.85 = 85/100),
and every round computes

    contrib(e: v→u)  =  rank_micro(v) DIV outdeg(v)          (floor div)
    rank_micro'(u)   =  (q-p)·MICRO DIV q  +  p·Σ contrib DIV q

— floor divisions and BIGINT sums only, so the result is bit-identical
across partitionings, join orders, retries, and engines (a DuckDB oracle
replays it exactly; float PageRank could never hash-compare because float
addition is order-dependent).  The DIV truncation ranks identically to the
float version for every practical purpose: it under-counts each node by
< 1e-6 of a rank unit per in-edge.

Semantics choices (documented, not hidden):
  * fixed ``iters`` rounds, no convergence test — deterministic cost and a
    replayable oracle; at web scale you run a fixed 10-20 rounds anyway.
  * dangling nodes (no out-edges) leak their mass rather than
    redistributing it — the standard large-scale simplification; ranks are
    then relative scores, not a probability distribution.
  * parallel edges count once (edges are distinct-ed); self-loops count.

Scale shape (100 TB webgraph): edges are localCheckpointed ONCE (the
connected_components discipline — upstream extraction never re-executes per
round), each round is one join (edges ⋈ ranks on src) + one hash agg on
dst + one left join back to the node set, and ranks re-materialize every
round so lineage stays O(1) deep instead of O(iters).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    out_col: str = "rank_micro",
) -> DataFrame:
    """Rank every node of the (directed) edge list.

    Returns ``(node, {out_col}: bigint)`` — micro-unit integer ranks
    (divide by 1e6 for the conventional scale).  ``damping`` must be
    expressible in hundredths (0.85, 0.5, …) so the integer arithmetic is
    exact; anything else raises rather than silently rounding.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    frac = Fraction(damping).limit_denominator(100)
    if float(frac) != damping or not (0 < frac < 1):
        raise ValueError(
            f"damping must be a fraction in (0,1) with denominator <= 100 "
            f"(e.g. 0.85) so integer arithmetic stays exact, got {damping}"
        )
    p, q = frac.numerator, frac.denominator
    base = ((q - p) * MICRO) // q

    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .where(F.col("_s").isNotNull() & F.col("_d").isNotNull())
        .distinct()
    )
    # materialize once: every round joins against the same edge table, and
    # without the checkpoint the (possibly expensive) upstream extraction
    # would re-execute per round (the connected_components lesson)
    e = e.localCheckpoint(eager=True)

    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    # nodes ⋈ outdeg once, so the per-round join carries the degree along
    ranks = nodes.join(
        outdeg.withColumnRenamed("_s", "node"), "node", "left"
    ).select(
        "node", "_deg", F.lit(MICRO).cast("long").alias(out_col)
    ).localCheckpoint(eager=True)

    for _ in range(iters):
        contrib = (
            ranks.where(F.col("_deg").isNotNull())
            .join(e, ranks["node"] == e["_s"])
            .select(
                F.col("_d").alias("node"),
                F.expr(f"{out_col} DIV _deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_sum"))
        )
        ranks = (
            ranks.select("node", "_deg")
            .join(contrib, "node", "left")
            .select(
                "node",
                "_deg",
                (
                    F.lit(base).cast("long")
                    + F.expr(f"{p} * coalesce(_sum, 0L) DIV {q}")
                ).alias(out_col),
            )
            .localCheckpoint(eager=True)  # O(1) lineage per round
        )
    return ranks.select("node", out_col)
