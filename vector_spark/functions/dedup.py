"""Deduplication for web-scale training corpora.

Five strategies, each picked for a different scale/recall point:

  exact_dedup        — hash-groupBy on normalized text; one shuffle, the
                       cheapest pass; run first at 100 TB.
  ngram_jaccard      — exact pairwise Jaccard via an inverted n-gram index
                       (explode → self-join on shared n-gram → count / union);
                       quadratic only within n-gram postings, so rare-gram
                       pruning keeps it tractable.
  minhash_lsh        — the scale path: per-doc minhash signature (k
                       permutations, all JVM-side: min(xxhash64(seed, shingle))
                       per seed), banded into b buckets; candidate pairs are
                       bucket-join collisions only.  No per-row Python.
  simhash            — 64-bit sign-of-weighted-bit-sums fingerprint; near-dups
                       differ in ≤ h bits (Hamming).  Arrow pandas UDF.
  embedding_neardup  — cosine ≥ τ on an embedding column; brute force within
                       LSH-ish buckets (random-hyperplane signs) for scale.

All candidate generation is DataFrame-native (explode + join + groupBy), so
Catalyst/AQE handle the shuffles; no driver-side loops.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_log = logging.getLogger(__name__)


def _cap_buckets(band_rows: DataFrame, keys: list[str], max_bucket: int | None, what: str) -> DataFrame:
    """Drop LSH band buckets holding more than ``max_bucket`` rows before the
    self-join — the band-join analog of ``max_posting``'s stop-gram prune.

    Why: a bucket of B near-identical docs (a boilerplate/template family —
    the normal case in web corpora) emits B²/2 candidate pairs inside ONE
    join partition; at 10k docs that is 50M pairs in a single task.  Exact
    dedup removes byte-equal copies first, but near-identical-not-equal
    families survive to the LSH stage, so the band join needs its own guard.

    Not silent: when the cap drops anything, the dropped bucket count / row
    count / largest bucket are logged at WARNING — pairs wholly inside a
    dropped bucket are NOT detected by this probe (handle template families
    with exact/fingerprint dedup or a dedicated clustering pass).  The
    count+stats cost one extra job over the (cheap, post-checkpoint) band
    projection and only run when the cap is enabled."""
    if max_bucket is None:
        return band_rows
    if max_bucket < 1:
        raise ValueError(f"max_bucket must be >= 1, got {max_bucket}")
    hot = (
        band_rows.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bc"))
        .filter(F.col("_bc") > max_bucket)
    )
    # AQE broadcasts the hot-bucket list when small (the usual case); the
    # anti-join then prunes map-side with no extra shuffle of band_rows.
    hot = hot.localCheckpoint(eager=True)
    stats = hot.agg(
        F.count(F.lit(1)).alias("n"), F.sum("_bc").alias("rows"), F.max("_bc").alias("worst")
    ).first()
    if stats["n"]:
        _log.warning(
            "%s: dropping %d LSH band buckets over max_bucket=%d "
            "(%d member rows, largest bucket %d) — pairs confined to those "
            "buckets are not detected by this probe",
            what, stats["n"], max_bucket, stats["rows"], stats["worst"],
        )
    return band_rows.join(hot.select(*keys), keys, "left_anti")


def normalize_text(col) -> "F.Column":
    """lower → strip non-word → collapse whitespace. The standard exact-dup
    normalization."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(F.coalesce(c, F.lit("")))
    c = F.regexp_replace(c, r"[^\w\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str = "text", normalized: bool = True
) -> DataFrame:
    """Keep the lowest-id row per (normalized) text. One hash-agg shuffle;
    map-side combine collapses duplicates before the exchange."""
    key = normalize_text(text_col) if normalized else F.col(text_col)
    keep = df.withColumn("_k", F.sha2(key, 256)).groupBy("_k").agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=id_col, how="left_semi")


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 2,
    keep_empty: bool = False,
) -> DataFrame:
    """CCNet-style paragraph-level dedup: drop every paragraph that occurs
    (trimmed-identical) in ``min_docs`` or more DISTINCT documents, then
    reassemble each document from its surviving paragraphs in original
    order.  Boilerplate (nav bars, cookie banners, license footers) repeats
    across pages; this removes it corpus-wide where document-level dedup
    can't.

    Execution shape: posexplode → ONE hash-agg on the paragraph key
    (xxhash64 of the trimmed paragraph — 8-byte shuffle rows; the 2⁻⁶⁴
    collision trade as exact_dedup's sha2-groupBy) counting distinct doc
    ids → LEFT ANTI join of paragraphs against the hot-paragraph keys →
    ONE reassembly shuffle on the doc id, ordering by the exploded position
    via sort_array over (pos, para) structs, so output is partition-layout
    invariant.  No driver-side state; the hot-key table is bare keys.

    Documents whose every paragraph was boilerplate disappear from the
    output unless ``keep_empty=True`` (then they come back with '' text and
    n_paras_kept=0).  Output: (id_col, text_col, n_paras_kept)."""
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    paras = (
        df.select(F.col(id_col), F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), sep)).alias("_pos", "_para"))
        .withColumn("_para", F.trim("_para"))
        .filter(F.col("_para") != "")
        .withColumn("_k", F.xxhash64("_para"))
    )
    hot = (
        paras.groupBy("_k")
        .agg(F.countDistinct(id_col).alias("_docs"))
        .filter(F.col("_docs") >= min_docs)
        .select("_k")
    )
    kept = paras.join(hot, "_k", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_para"))),
                lambda s: s["_para"],
            ),
            sep,
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_paras_kept"),
    )
    if not keep_empty:
        return rebuilt
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
            F.coalesce("n_paras_kept", F.lit(0)).alias("n_paras_kept"),
        )
    )


def duplicate_span_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    window: int = 8,
    stride: int = 1,
    min_docs: int = 2,
    mode: str = "drop_all",
    keep_empty: bool = False,
) -> DataFrame:
    """Substring-level dedup: remove word spans that repeat across documents
    (the ExactSubstr idea of Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", re-expressed as DataFrame ops).  The
    paper builds a single-machine suffix array; the distributed analog
    hashes every ``window``-word sliding window, finds windows occurring in
    ``min_docs``+ DISTINCT documents, and removes the covered word
    positions.  A duplicated span of length >= window is covered exactly
    (stride=1); stride>1 trades recall for cost and only guarantees spans
    of length >= window + stride - 1.

    ``mode="drop_all"`` removes every occurrence of a duplicated span
    (paragraph_dedup's boilerplate discipline); ``mode="keep_first"``
    keeps the copy in the lowest ``id_col`` document (the paper's
    keep-one-occurrence semantics, made deterministic).

    Execution shape — the three shuffles are all on narrow keys:
      1. windows are generated MAP-SIDE (transform over sequence, one
         xxhash64 per window: 8-byte keys, never the window string),
      2. ONE hash-agg on window hash finds hot windows (count distinct
         doc), LEFT SEMI join marks covered (doc, start) rows,
      3. covered positions are merged into intervals per doc with a
         gaps-and-islands window pass (NO per-position explode — a hot
         window contributes an interval, not ``window`` rows), and each
         doc's surviving tokens are selected by an index-aware filter()
         against its (small) interval array.
    Output is partition-layout invariant: token order comes from the array
    itself, never collect_list order.  Docs shorter than ``window`` pass
    through untouched; docs whose every token was covered disappear unless
    ``keep_empty=True``.

    Output columns: (id_col, text_col cleaned, n_tokens_kept, n_tokens)."""
    from pyspark.sql import Window as W

    if window < 2:
        raise ValueError(f"window must be >= 2 words, got {window}")
    if stride < 1 or stride > window:
        raise ValueError(f"stride must be in [1, window], got {stride}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if mode not in ("drop_all", "keep_first"):
        raise ValueError(f"mode must be drop_all|keep_first, got {mode!r}")

    trimmed = F.trim(F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s+", " "))
    tk = F.when(trimmed == "", F.array().cast("array<string>")).otherwise(F.split(trimmed, " "))
    toks = df.select(F.col(id_col), tk.alias("_tk"))

    wins = (
        toks.filter(F.size("_tk") >= window)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_tk") - window, F.lit(stride)),
                    lambda i: F.struct(
                        i.alias("s"),
                        F.xxhash64(F.concat_ws(" ", F.slice("_tk", i + 1, window))).alias("h"),
                    ),
                )
            ).alias("_w"),
        )
        .select(id_col, F.col("_w.s").alias("_s"), F.col("_w.h").alias("_h"))
    )

    # Hot-window detection.  For the common min_docs=2 case "seen in >=2
    # distinct docs" is exactly min(id) != max(id) — a plain min/max
    # hash-agg with full map-side combine, skipping countDistinct's
    # distinct-expansion shuffle (a doc self-repeating a window stays
    # cold either way).  min(id) doubles as keep_first's canonical doc.
    if min_docs == 2:
        grouped = wins.groupBy("_h").agg(
            F.min(id_col).alias("_keep"), F.max(id_col).alias("_hi")
        ).filter(F.col("_keep") != F.col("_hi"))
    else:
        grouped = wins.groupBy("_h").agg(
            F.countDistinct(id_col).alias("_d"), F.min(id_col).alias("_keep")
        ).filter(F.col("_d") >= min_docs)
    if mode == "drop_all":
        covered = wins.join(grouped.select("_h"), "_h", "left_semi").select(id_col, "_s")
    else:
        covered = (
            wins.join(grouped.select("_h", "_keep"), "_h")
            .filter(F.col(id_col) != F.col("_keep"))
            .select(id_col, "_s")
        )

    w_doc = W.partitionBy(id_col).orderBy("_s")
    intervals = (
        covered.withColumn("_e", F.col("_s") + window - 1)
        .withColumn(
            "_prev_e",
            F.max("_e").over(w_doc.rowsBetween(W.unboundedPreceding, -1)),
        )
        .withColumn(
            "_new",
            F.when(
                F.col("_prev_e").isNull() | (F.col("_s") > F.col("_prev_e") + 1), 1
            ).otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(w_doc.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy(id_col, "_isl")
        .agg(F.min("_s").alias("s"), F.max("_e").alias("e"))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("s", "e"))).alias("_cov"))
    )

    kept = F.when(F.col("_cov").isNull(), F.col("_tk")).otherwise(
        F.filter(
            "_tk",
            lambda t, i: ~F.exists(
                "_cov", lambda iv: (i >= iv["s"]) & (i <= iv["e"])
            ),
        )
    )
    out = toks.join(intervals, id_col, "left").select(
        F.col(id_col),
        F.array_join(kept, " ").alias(text_col),
        F.size(kept).alias("n_tokens_kept"),
        F.size("_tk").alias("n_tokens"),
    )
    if keep_empty:
        return out
    return out.filter(F.col("n_tokens_kept") > 0)


def shingle_df(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, unit: str = "char"
) -> DataFrame:
    """(id, shingle) posting list — the inverted index both Jaccard and
    MinHash build on.

    ``unit='char'``: overlapping character n-grams (substring-per-offset).
    ``unit='word'``: overlapping word n-grams (w-shingling) — the scale
    default for natural text: postings are far more selective (distinct
    grams grow with vocab^n), so the downstream self-join stays near-linear
    instead of collapsing into hot postings.
    """
    s = normalize_text(text_col)
    if unit == "char":
        with_s = df.select(F.col(id_col), s.alias("_s")).filter(F.length("_s") >= n)
        grams = F.expr(
            f"transform(sequence(1, length(_s) - {n - 1}), i -> substring(_s, i, {n}))"
        )
    elif unit == "word":
        with_s = df.select(F.col(id_col), F.split(s, " ").alias("_s")).filter(
            F.size("_s") >= n
        )
        grams = F.expr(
            f"transform(sequence(1, size(_s) - {n - 1}), i -> concat_ws(' ', slice(_s, i, {n})))"
        )
    else:
        raise ValueError(f"unknown shingle unit {unit!r}")
    return with_s.select(id_col, F.explode(F.array_distinct(grams)).alias("shingle"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    unit: str = "word",
    min_hits: int = 1,
    mode: str = "flag",
) -> DataFrame:
    """Benchmark decontamination: find (or drop) training documents that
    share any normalized word/char ``n``-gram with an evaluation set — the
    standard pre-training hygiene pass (GPT-3 used 13-gram, PaLM 8-gram
    overlap; both public).  A contaminated doc inflates benchmark scores
    without the model being better, so this runs before training-set
    freeze, with the benchmark side being every eval set you report on.

    Scale shape: the benchmark is SMALL by definition (eval sets are
    thousands of rows), so its distinct gram hashes are collected into a
    broadcast and the corpus side is ONE map-side hash-semi-join over its
    exploded grams followed by one count agg on the doc id — the corpus
    text is never shuffled.  Grams are xxhash64'd (8-byte broadcast
    entries; the 2⁻⁶⁴ collision trade as elsewhere in this module).

    ``mode='flag'`` returns every doc with ``n_contaminated_grams`` and a
    ``contaminated`` bool (≥ ``min_hits``); ``mode='drop'`` returns the
    clean corpus rows only."""
    if mode not in ("flag", "drop"):
        raise ValueError(f"unknown mode {mode!r} (expected flag|drop)")
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")
    bench_grams = (
        shingle_df(
            benchmark.select(F.monotonically_increasing_id().alias("_bid"), bench_text_col),
            "_bid", bench_text_col, n, unit,
        )
        .select(F.xxhash64("shingle").alias("_g"))
        .distinct()
    )
    doc_grams = shingle_df(docs, id_col, text_col, n, unit).select(
        id_col, F.xxhash64("shingle").alias("_g")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "_g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    if mode == "drop":
        dirty = hits.filter(F.col("n_contaminated_grams") >= min_hits).select(id_col)
        return docs.join(dirty, id_col, "left_anti")
    return (
        docs.join(hits, id_col, "left")
        .withColumn("n_contaminated_grams", F.coalesce("n_contaminated_grams", F.lit(0)))
        .withColumn("contaminated", F.col("n_contaminated_grams") >= min_hits)
    )


def _jaccard_pipeline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    unit: str,
    max_posting: int,
    threshold: float,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Shared core of exact Jaccard: shingle+hash → sizes → stop-gram prune →
    intersection join → jaccard ≥ τ.  When ``pairs`` is given, the index and
    the intersections are semi-join-restricted to the candidate set (the
    LSH-verify shape); the gram hashing / pruning / arithmetic is ONE code
    path, so direct computation and candidate verification cannot drift
    apart (the dedup_minhash_lsh oracle depends on their equivalence)."""
    sh = shingle_df(df, id_col, text_col, n, unit).select(
        id_col, F.xxhash64("shingle").alias("shingle")
    )
    # posting prune is corpus-global by definition; set sizes are per-doc, so
    # with a candidate set they only need computing for candidate ids.
    posting_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("pc"))
    if pairs is not None:
        # no forced broadcast: candidates can be a few percent of the corpus
        # (past driver memory at 10^9 docs); AQE picks broadcast when small
        ids = (
            pairs.select(F.col("id_a").alias(id_col))
            .union(pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        sh = sh.join(ids, id_col, "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    sh = sh.join(posting_counts.filter(F.col("pc") <= max_posting), "shingle", "inner").drop("pc")

    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = a.join(b, "shingle").filter(F.col("id_a") < F.col("id_b"))
    if pairs is not None:
        inter = inter.join(pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
    inter = inter.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_shared"))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared") / (F.col("size_a") + F.col("size_b") - F.col("n_shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.8,
    max_posting: int = 1000,
    unit: str = "char",
) -> DataFrame:
    """Exact Jaccard over n-gram sets for all pairs sharing ≥1 n-gram.

    ``max_posting`` drops stop-grams (n-grams appearing in > max_posting
    docs) before the self-join — the standard guard against the quadratic
    blowup of hot postings at corpus scale.  The self-join key is the
    64-bit xxhash of the gram, not the gram string — same intersection
    counts, a fraction of the shuffle bytes.
    """
    return _jaccard_pipeline(df, id_col, text_col, n, unit, max_posting, threshold)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 5,
    k: int = 64,
    unit: str = "char",
) -> DataFrame:
    """k-permutation MinHash, entirely JVM-side: the shingle string is
    hashed ONCE (xxhash64), then permutation j is xxhash64(j, h0) — k-1
    integer re-hashes instead of k string hashes; the signature element is
    the min per doc.  One explode + one hash-agg — no Python in the loop."""
    sh = shingle_df(df, id_col, text_col, n, unit).select(
        id_col, F.xxhash64("shingle").alias("_h0")
    )
    aggs = [F.min(F.xxhash64(F.lit(j), F.col("_h0"))).alias(f"h{j}") for j in range(k)]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 5,
    k: int = 64,
    bands: int = 16,
    threshold: float | None = 0.7,
    unit: str = "char",
    materialize: str = "localCheckpoint",
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    k hashes split into `bands` bands of r = k/bands rows; docs colliding in
    ANY band-hash become a candidate pair (prob ≈ 1-(1-s^r)^b).  When
    `threshold` is set, candidates are verified with the estimated Jaccard
    (fraction of matching signature positions ≥ threshold).

    ``max_bucket`` caps band-bucket size (see :func:`_cap_buckets`): at web
    scale a template family of B near-identical docs would otherwise emit
    B²/2 candidates in one join partition.  Default None = exact semantics
    (the oracle-checked contract); set it (e.g. 1000) for 100 TB runs and
    watch the WARNING log for what was dropped.
    """
    assert k % bands == 0
    r = k // bands
    # Pack the signature into ONE array column: the band explode and the
    # verify join then move a single array instead of k separate columns
    # (smaller shuffle rows, simpler codegen).
    #
    # localCheckpoint, not persist(): both self-join sides read this table, but
    # a persist() lives in the session CacheManager until someone unpersists —
    # and no unpersist point exists here that runs after the caller materializes
    # the (lazy) result.  localCheckpoint blocks are owned by the RDD and freed
    # by the ContextCleaner when the result is GC'd, so repeated calls in a
    # long-lived session don't accumulate storage.
    #
    # Trade-off (deliberate): localCheckpoint severs lineage and its blocks
    # are unreplicated — losing an executor mid-query fails the job instead
    # of recomputing, and the signature job runs eagerly at construction.
    # On clusters with preemptible executors, prefer materialize="persist"
    # and own the unpersist in the caller.
    sig = minhash_signatures(df, id_col, text_col, n, k, unit).select(
        id_col, F.array(*[F.col(f"h{j}") for j in range(k)]).alias("sig")
    )
    sig = sig.persist() if materialize == "persist" else sig.localCheckpoint(eager=True)

    band_rows = sig.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.element_at("sig", b * r + i + 1) for i in range(r)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )

    band_rows = _cap_buckets(band_rows, ["band", "bucket"], max_bucket, "minhash_lsh_pairs")
    a = band_rows.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = band_rows.select(F.col(id_col).alias("id_b"), "band", "bucket")
    # distinct on the BARE pair — the signature arrays join back after, so
    # the dedup shuffle moves 16 bytes/row, not 2x512-byte signatures.
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if threshold is None:
        return cand

    sig_a = sig.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = sig.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .withColumn("est_jaccard", F.round(matches / F.lit(k), 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def jaccard_for_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 5,
    unit: str = "char",
    max_posting: int = 1000,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard computed ONLY for a given candidate pair set — the
    verification half of the LSH-candidates → exact-verify pattern.

    Delegates to the SAME pipeline as ngram_jaccard_pairs with the index and
    intersections semi-join-restricted to candidates, so cost is
    O(candidate postings), not O(corpus²), and (LSH candidates →
    jaccard_for_pairs) ≡ exact pairs wherever LSH recall holds — which makes
    the composition oracle-checkable against the all-pairs SQL."""
    return _jaccard_pipeline(
        df, id_col, text_col, n, unit, max_posting, threshold, pairs=pairs
    )


def _star_components(edges: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris,
    Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
    MapReduce and Beyond", SoCC'14): converges in O(log² n) rounds (O(log n)
    in practice) regardless of diameter, so it is the remedy for graphs the
    plain label-propagation loop cannot finish — long chains, adversarial
    paths.  Same Spark primitives per round as the simple loop: one
    groupBy-min + one join per star operation.

    ``edges`` must be SYMMETRIC (both directions present) with columns
    (src, dst) and already materialized (localCheckpoint) by the caller.

      large-star(v): attach every neighbor u > v to m = min(Γ(v) ∪ {v})
      small-star(v): attach every neighbor u ≤ v (and v) to that same m

    After convergence the edge set is a union of stars rooted at component
    minima; labels are read off as min(neighbor ∪ self) per node.
    Convergence is detected by the (count, hash-sum) signature of the
    canonicalized edge set being stable across a round — a full set-equality
    join would cost another shuffle for no additional safety at 128-bit
    collision odds."""
    # canonical undirected form (a < b), the fixpoint object
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _signature(e: DataFrame):
        # decimal sums: a long sum of 64-bit hashes overflows under ANSI mode
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
            F.sum(F.xxhash64("b", "a", F.lit(7)).cast("decimal(38,0)")).alias("h2"),
        ).first()
        return (row["n"], row["h"], row["h2"])

    sig = _signature(und)
    for _ in range(max_rounds):
        # large-star: group by v over symmetric neighbors, m = min(Γ ∪ {v}),
        # emit (u, m) for u > v
        sym = und.select(F.col("a").alias("v"), F.col("b").alias("u")).unionByName(
            und.select(F.col("b").alias("v"), F.col("a").alias("u"))
        )
        mins = sym.groupBy("v").agg(F.min("u").alias("mn"))
        mins = mins.select("v", F.least("v", "mn").alias("m"))
        large = (
            sym.join(mins, "v")
            .where(F.col("u") > F.col("v"))
            .select(F.col("m").alias("a"), F.col("u").alias("b"))
        )
        und = (
            large.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star: emit (u, m) for u ≤ v, plus (v, m)
        sym = und.select(F.col("a").alias("v"), F.col("b").alias("u")).unionByName(
            und.select(F.col("b").alias("v"), F.col("a").alias("u"))
        )
        mins = sym.groupBy("v").agg(F.min("u").alias("mn"))
        mins = mins.select("v", F.least("v", "mn").alias("m"))
        small = (
            sym.join(mins, "v")
            .where(F.col("u") <= F.col("v"))
            .select(F.col("m").alias("a"), F.col("u").alias("b"))
            .unionByName(mins.select(F.col("m").alias("a"), F.col("v").alias("b")))
        )
        und = (
            small.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_sig = _signature(und)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"star connected components did not stabilize in {max_rounds} rounds "
            "— this should not happen (O(log² n) bound); check for non-numeric "
            "or NaN node ids"
        )
    # stars: every remaining edge is (root=component-min, member)
    sym = und.select(F.col("a").alias("node"), F.col("b").alias("nb")).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("nb"))
    )
    return (
        sym.groupBy("node")
        .agg(F.min("nb").alias("_mn"))
        .select("node", F.least("node", "_mn").alias("component"))
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
    method: str = "auto",
) -> DataFrame:
    """Distributed connected components over the near-dup pair graph.
    Returns (node, component) with component = min reachable id.

    ``method``:
      * ``"label"`` — min-label propagation: per iteration one join (push
        each node's current label to its neighbors) + one min-aggregate,
        both plain shuffles on the node id.  Rounds needed = graph diameter,
        which for near-dup clusters (cliques and short chains) is 1-3 in
        practice.  Raises if the diameter exceeds ``max_iters``.
      * ``"star"`` — alternating large-star/small-star (Kiveris et al.):
        O(log² n) rounds regardless of diameter; ~2× the per-round work, so
        it wins only on high-diameter graphs.
      * ``"auto"`` (default) — run label propagation; if it has not
        converged after ``max_iters`` rounds, fall back to large/small-star
        on the already-materialized edge set instead of raising.  Dedup
        graphs get the cheap path, pathological chains still terminate.

    localCheckpoint per round truncates lineage so plans don't grow with
    iterations; the edge set is materialized ONCE up front (the pair set is
    usually the output of a whole LSH+verify pipeline, which must not
    re-execute per round)."""
    if method not in ("auto", "label", "star"):
        raise ValueError(f"unknown method {method!r} (expected auto|label|star)")
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    if method == "star":
        return _star_components(edges)
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    labels = labels.localCheckpoint()
    changed = -1
    for _ in range(max_iters):
        pushed = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "component")
        )
        new = (
            labels.unionByName(pushed)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        ).localCheckpoint()
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        # Exhausting max_iters without convergence means the labels are NOT
        # component ids — returning them silently would under-merge clusters.
        if method == "auto":
            _log.warning(
                "label propagation still moving after %d rounds (%d labels "
                "changing) — falling back to large-star/small-star",
                max_iters, changed,
            )
            return _star_components(edges)
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"({changed} labels still changing) — raise max_iters, use "
            f"method='auto'/'star' (large-star/small-star fallback), or "
            f"pre-cluster the pathological subgraph"
        )
    return labels


def neardup_filter_cc(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Connected-components canonical dedup: keep exactly ONE document per
    near-dup component (the smallest id), not merely per pair.  Differs from
    the greedy :func:`neardup_filter` on graphs where a doc pairs only with
    already-dropped docs (e.g. edges (1,3),(2,3): greedy keeps {1,2}, CC
    keeps {1} — 2 and 3 share a component through 3)."""
    comp = connected_components(pairs, id_a, id_b)
    drops = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drops, id_col, "left_anti")


def neardup_filter(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Greedy keep-canonical near-dup removal — the step a training-data
    pipeline runs AFTER pair detection: for every (id_a < id_b) pair, drop
    the id_b side, keeping the smallest id of each directly-linked group.

    One `left_anti` join against the distinct drop set (AQE broadcasts it
    when small; otherwise a shuffled anti-join — either way a single pass
    over the corpus, no iteration).  Greedy-by-pair, not connected
    components: in a chain a–b, b–c (without a–c), c drops even though its
    only similar doc b is itself dropped — the standard first-pass dedup
    trade-off (union-find canonicalization is iterative and rarely worth it
    at this stage).  Deterministic given a deterministic pair set, and
    SQL-expressible, so the composition (LSH pairs → filter) stays
    oracle-checkable."""
    drops = pairs.select(F.col(id_b).alias(id_col)).distinct()
    return df.join(drops, id_col, "left_anti")


def incremental_neardup_filter(
    batch: DataFrame,
    history: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.9,
    unit: str = "word",
    exact_first: bool = True,
    max_bucket: int | None = None,
    validate_ids: bool = True,
    materialize: str = "localCheckpoint",
) -> DataFrame:
    """Incremental corpus growth: keep only the BATCH docs that neither
    exactly nor nearly duplicate the HISTORY corpus.  This is the daily-
    crawl shape — the history is the already-curated corpus (never
    re-deduped, never dropped), the batch is today's increment.

    Two passes, cheap first:

      1. exact — normalized-text xxhash64 left_anti against the distinct
         history hashes (one map + one anti-join; removes the bulk).
      2. near — ONE banded-MinHash LSH over the tagged union, candidates
         restricted to CROSS-corpus pairs, exact-Jaccard verified at
         ``threshold`` through the shared :func:`_jaccard_pipeline`, then a
         single left_anti drops batch ids with a confirmed history partner.

    Batch-INTERNAL near-dups are deliberately untouched — that is
    :func:`neardup_filter`'s job, run on whatever survives here; keeping the
    two concerns separate means history semantics never change an intra-
    batch decision.

    Ids are disambiguated across the two corpora by the reversible encoding
    ``2·id + origin`` (history 0 / batch 1) — collision-free, no hashing;
    requires 0 ≤ id < 2⁶² (raises otherwise rather than wrapping).

    Scale shape: pass 1 is one hash-agg + anti-join; pass 2's LSH cost is
    O(batch + history) band rows in ONE equi-join (not batch × history),
    and the verify touches only cross-corpus candidates.  ``max_bucket``
    forwards to the LSH band join for hot-template corpora.
    ``validate_ids`` guards the encoding precondition with one pruned
    id-column scan per side (short-circuits on the first violation); at
    full corpus scale pass ``validate_ids=False`` when the id domain is
    already guaranteed by the table contract.

    ``materialize`` ("localCheckpoint" | "none"): pass-1 survivors feed the
    LSH union, the verify pipeline, AND the final anti-join — without
    materialization each reference would re-execute the exact-dedup pass
    (the dominant scan at daily-crawl scale).  "localCheckpoint" (default)
    truncates that lineage once, with the same trade-offs documented on
    :func:`minhash_lsh_pairs`; "none" keeps the plan fully lazy."""
    limit = 1 << 62
    for side, name in ((batch, "batch"), (history, "history")) if validate_ids else ():
        bad = side.select(id_col).filter(
            (F.col(id_col) < 0) | (F.col(id_col) >= limit)
        ).limit(1).collect()
        if bad:
            raise ValueError(
                f"incremental_neardup_filter: {name}.{id_col} must be in "
                f"[0, 2^62) for the 2·id+origin encoding (got {bad[0][0]})"
            )

    survivors = batch
    if exact_first:
        hh = history.select(
            F.xxhash64(normalize_text(text_col)).alias("_nh")
        ).distinct()
        survivors = (
            batch.withColumn("_nh", F.xxhash64(normalize_text(text_col)))
            .join(hh, "_nh", "left_anti")
            .drop("_nh")
        )
    if materialize == "localCheckpoint":
        survivors = survivors.localCheckpoint(eager=False)

    # cast BEFORE the arithmetic: on an IntegerType id column, 2·id+1 in
    # 32-bit overflows (ANSI abort / silent wrap) for ids ≥ 2^30 even
    # though the value passes the [0, 2^62) range check.
    uid = "_inc_uid"
    bid = F.col(id_col).cast("long")
    u = survivors.select(
        (bid * 2 + 1).alias(uid), F.col(text_col)
    ).unionByName(history.select((bid * 2).alias(uid), F.col(text_col)))
    cand = minhash_lsh_pairs(
        u, uid, text_col, n=n, k=k, bands=bands, threshold=None, unit=unit,
        max_bucket=max_bucket,
    )
    # cross-corpus only: one id even (history), one odd (batch)
    cross = cand.filter(F.pmod("id_a", F.lit(2)) != F.pmod("id_b", F.lit(2)))
    verified = jaccard_for_pairs(
        u, cross, uid, text_col, n=n, unit=unit, threshold=threshold
    )
    dup_batch = (
        verified.select(F.col("id_a").alias(uid))
        .union(verified.select(F.col("id_b").alias(uid)))
        .filter(F.pmod(uid, F.lit(2)) == 1)
        # integer decode: `/` is DOUBLE division in Spark and silently loses
        # precision above 2^53 — shiftright keeps the full 62-bit id exact.
        .select(F.shiftright(F.col(uid) - 1, 1).alias(id_col))
        .distinct()
    )
    return survivors.join(dup_batch, id_col, "left_anti")


# --- SimHash -----------------------------------------------------------------

@F.pandas_udf(T.LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens — fully vectorized per Arrow
    batch: pandas C-speed tokenization, ``pd.util.hash_array`` (SipHash
    with a fixed key — deterministic across executors/runs) for token
    hashes, and numpy segment sums for the per-doc bit accumulation.  No
    per-token Python.  Empty/null text → 0."""
    token_lists = text.fillna("").str.lower().str.split()
    lengths = token_lists.str.len().to_numpy(dtype=np.int64)
    n = len(lengths)
    out = np.zeros(n, dtype=np.int64)
    nonempty = lengths > 0
    if nonempty.any():
        flat = np.concatenate([np.asarray(t, dtype=object) for t in token_lists[nonempty]])
        h = pd.util.hash_array(flat)  # uint64, deterministic
        signs = (
            ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int8) * 2 - 1
        )  # (n_tokens, 64) in {-1, +1}, int8 to keep the batch matrix small
        starts = np.concatenate([[0], np.cumsum(lengths[nonempty])[:-1]])
        acc = np.add.reduceat(signs.astype(np.int32), starts, axis=0)  # (n_docs_nonempty, 64)
        weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
        fp = ((acc > 0).astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        out[nonempty] = fp.astype(np.int64)
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    return df.withColumn(out_col, simhash_udf(F.col(text_col)))


def hamming_pairs(
    fps: DataFrame,
    id_col: str,
    fp_col: str = "simhash",
    max_hamming: int = 3,
    bits: int = 64,
    max_bucket: int | None = None,
) -> DataFrame:
    """Pairs with Hamming(fingerprint) ≤ h via the block-permutation trick:
    split `bits` into (h+1) blocks — by pigeonhole, any pair within distance
    h matches EXACTLY (recall 1.0, not probabilistic) on ≥1 block, so block
    equality is the join key.  Blocks are exploded into (band, key) rows and
    candidates come from a single equi-join shuffle (minhash-LSH shape), not
    h+1 separate joins.

    The candidate `.distinct()` runs on the BARE (id_a, id_b) pair —
    fingerprints join back after (16-byte dedup shuffle rows, the same
    discipline as minhash_lsh_pairs).  ``max_bucket`` caps band-bucket size
    (template-family guard, see :func:`_cap_buckets`); default None = exact
    recall-1.0 semantics."""
    blocks = max_hamming + 1
    # Floor division: when bits % blocks != 0 the top bits stay uncovered by
    # any block — recall is STILL exactly 1.0 (≤ h differing covered bits over
    # h+1 blocks leave ≥1 block clean by pigeonhole; uncovered-bit differences
    # never touch a block key), the uncovered bits just cost some candidate
    # selectivity.
    width = bits // blocks
    if width < 1:
        raise ValueError(f"max_hamming={max_hamming} too large for {bits}-bit fingerprints")
    band_rows = fps.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col(fp_col), i * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    for i in range(blocks)
                ]
            )
        ).alias("band", "key"),
    )
    band_rows = _cap_buckets(band_rows, ["band", "key"], max_bucket, "hamming_pairs")
    a = band_rows.select(F.col(id_col).alias("id_a"), "band", "key")
    b = band_rows.select(F.col(id_col).alias("id_b"), "band", "key")
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    fa = fps.select(F.col(id_col).alias("id_a"), F.col(fp_col).alias("fp_a"))
    fb = fps.select(F.col(id_col).alias("id_b"), F.col(fp_col).alias("fp_b"))
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        pairs.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    materialize: str = "localCheckpoint",
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ h (64-bit SipHash fingerprint —
    the throughput path).  The fingerprint table is localCheckpointed: both
    self-join sides read it, so the UDF runs once, and unlike persist() the
    blocks are freed on GC rather than leaking in the CacheManager (see
    minhash_lsh_pairs)."""
    sh = simhash(df.select(id_col, text_col), text_col).select(id_col, "simhash")
    sh = sh.persist() if materialize == "persist" else sh.localCheckpoint(eager=True)
    return hamming_pairs(sh, id_col, "simhash", max_hamming, bits=64, max_bucket=max_bucket)


def simhash_md5(df: DataFrame, id_col: str, text_col: str = "text", bits: int = 60) -> DataFrame:
    """SQL-recomputable SimHash: tokens = whitespace-split lowercased text,
    token hash = first 15 hex chars of md5 (60 bits — positive in a signed
    BIGINT in both Spark and DuckDB), fingerprint bit b = sign of
    Σ_tokens(±1 by bit b of the token hash).

    Pure JVM (explode + conv + ONE hash agg with map-side combine — the
    shuffle carries `bits` small ints per doc).  The SipHash pandas variant
    (simhash_udf) is the throughput path; this variant exists so the near-dup
    pair set is verifiable by an exact ANSI-SQL oracle (DuckDB computes the
    identical md5-derived fingerprints)."""
    toks = df.select(
        id_col,
        F.explode(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    th = toks.select(id_col, h.alias("h"))
    bit_cols = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    sums = th.groupBy(id_col).agg(*bit_cols)
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp + F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return sums.select(id_col, fp.alias("simhash"))


def simhash_md5_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    materialize: str = "localCheckpoint",
) -> DataFrame:
    """Oracle-checkable simhash near-dups: md5 fingerprints (simhash_md5) +
    exact block-permutation candidate generation (hamming_pairs, recall 1.0
    by pigeonhole) — the result set is byte-identical to an all-pairs SQL
    recomputation, which is what the driver's DuckDB oracle runs."""
    fps = simhash_md5(df, id_col, text_col)
    fps = fps.persist() if materialize == "persist" else fps.localCheckpoint(eager=True)
    return hamming_pairs(fps, id_col, "simhash", max_hamming, bits=60)


# --- embedding cosine near-dup ------------------------------------------------

def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Cosine ≥ τ pairs via BANDED random-hyperplane LSH (minhash-band shape).

    A single sign-pattern table misses a θ-apart pair with prob
    1-(1-θ/π)^planes — real recall loss even for near-identical vectors.
    `n_tables` independent tables drop the miss prob to that quantity ^tables
    (≈1e-5 for cosine ≥ 0.99 at 8 planes × 4 tables): a pair is a candidate
    if it collides in ANY table.  All tables come from ONE matmul per Arrow
    batch; candidates are a single (band, bucket) equi-join, deduped on the
    bare id pair BEFORE the vectors join back (16-byte shuffle rows), then
    verified with exact cosine — so no false positives ever survive."""
    from vector_spark.functions.similarity import cosine_expr, hyperplane_bands_udf

    b = df.select(id_col, vec_col).withColumn(
        "_bands", hyperplane_bands_udf(n_tables, n_planes)(F.col(vec_col))
    )
    band_rows = b.select(id_col, F.posexplode("_bands").alias("band", "bucket"))
    band_rows = _cap_buckets(band_rows, ["band", "bucket"], max_bucket, "embedding_neardup_pairs")
    a1 = band_rows.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b1 = band_rows.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        a1.join(b1, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(cosine_expr("va", "vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
    centroids: "np.ndarray | None" = None,
    k: int = 8,
    keep: str = "centroid_far",
    max_cell: int | None = None,
    mode: str = "remove",
    nprobe: int = 1,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding space,
    then within each cluster drop every vector that has a cosine-≥-τ
    neighbor ranked before it, keeping one representative per duplicate
    neighborhood.  This is the embedding-space analog of the text near-dup
    pass — it removes *semantic* duplicates (same content re-rendered,
    translations, templated rewrites) that no lexical hash can see.

    Routing (which docs can ever be compared) has two paths sharing every
    downstream stage:

    * ``centroids=`` a (nlist × dim) ndarray — spherical-k-means cells via
      a broadcast + one numpy matmul per Arrow batch (train with
      `similarity.train_centroids`, the paper's setup; nlist scales with
      corpus size so cells stay O(N/nlist)).
    * ``centroids=None`` — a FIXED axis-aligned quantizer: cell = argmax of
      the first ``k`` dimensions.  Pure JVM (no Python workers) and
      ANSI-SQL-expressible, so the full composition stays hash-verifiable
      against DuckDB; used by the `semdedup` contract row.

    Routing quality only affects RECALL (a pair split across cells is never
    examined — same contract as every LSH family here); it can never create
    a false drop, because each drop is backed by an exact cosine ≥ τ.
    ``nprobe`` (trained-centroid path only) assigns each vector to its top
    ``nprobe`` cells — the standard multi-probe fix for pairs straddling a
    cell boundary (measured: planted-pair recall 0.985 → 1.0 at 1M vectors
    for nprobe=2, BENCH.md §22).  Cost scales ~nprobe² (cells hold nprobe×
    the rows and the kernel is quadratic per cell: 47 s → 204 s at 1M), so
    raise nlist alongside nprobe to hold cell sizes.  Priority stays
    anchored to the PRIMARY cell so the dominance order remains a total
    order on docs regardless of membership count.

    Keep rule (the priority order; ascending, minimum kept):

    * ``keep="centroid_far"`` — the paper's choice: within a duplicate
      neighborhood keep the example LEAST similar to its cluster centroid
      (retains boundary examples, drops the redundant core).  Priority is
      round(cos(v, centroid), 6) with id as the tie-break.
    * ``keep="min_id"`` — smallest id wins (the convention of
      :func:`neardup_filter`).

    A doc is dropped iff SOME same-cell τ-neighbor precedes it in priority
    order — the standard one-pass rule (also `neardup_filter`'s): on a
    chain a–b, b–c the minimum survives even though c's only neighbor b is
    itself dropped.  Deterministic under any partitioning (priority is a
    pure function of the row), non-iterative, one self-join.

    Execution shape at 100 TB: ONE map-only projection (cell + priority),
    an optional per-cell cap, ONE shuffle — groupBy(cell).applyInPandas —
    where each cell's pairwise cosine matrix is a numpy matmul in
    row-blocks (vectors cross the wire once; no B²/2 pair rows ever
    materialize, and no per-pair interpreted expression runs), emitting
    only dominated ids (8-byte rows), then one anti-join.  ``max_cell``
    mirrors the LSH ``max_bucket`` guard: a cell of B docs costs B²
    multiply-adds and one task, so oversized cells are excluded (their
    docs are all KEPT — conservative) with a loud warning; at scale
    prefer raising nlist (the paper scales nlist with corpus size) over
    raising the cap.

    ``mode="remove"`` returns surviving rows; ``mode="flag"`` returns all
    rows with `cell` and a `semdedup_drop` boolean for auditing.
    """
    if keep not in ("centroid_far", "min_id"):
        raise ValueError(f"keep must be centroid_far|min_id, got {keep!r}")
    if mode not in ("remove", "flag"):
        raise ValueError(f"mode must be remove|flag, got {mode!r}")
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    vd = F.col(vec_col).cast("array<double>")
    if centroids is None:
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        head = F.slice(vd, 1, k)
        cell_1b = F.array_position(head, F.array_max(head))
        norm = F.sqrt(F.aggregate(vd, F.lit(0.0), lambda a, x: a + x * x))
        csim = F.element_at(vd, cell_1b.cast("int")) / F.greatest(norm, F.lit(1e-12))
        proj = df.select(
            F.col(id_col),
            vd.alias("_v"),
            (cell_1b - 1).cast("int").alias("cell"),
            F.round(csim, 6).alias("_prio"),
        )
    else:
        cents = np.asarray(centroids, dtype=np.float64)
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        if not 1 <= nprobe <= len(cents):
            raise ValueError(f"nprobe must be in [1, nlist], got {nprobe}")
        bc = df.sparkSession.sparkContext.broadcast(cents)
        np_ = int(nprobe)

        @F.pandas_udf("struct<cells:array<int>, csim:double>")
        def route(vecs: pd.Series) -> pd.DataFrame:
            c = bc.value
            m = np.stack(vecs.to_numpy()).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ c.T
            if np_ == 1:
                idx = np.argmax(sims, axis=1)[:, None]
            else:
                rows = np.arange(len(m))[:, None]
                idx = np.argpartition(-sims, np_ - 1, axis=1)[:, :np_]
                idx = idx[rows, np.argsort(-sims[rows, idx], axis=1)]
            return pd.DataFrame(
                {
                    "cells": [r.astype(np.int32).tolist() for r in idx],
                    "csim": sims[np.arange(len(m)), idx[:, 0]],
                }
            )

        routed = df.select(
            F.col(id_col), vd.alias("_v"), route(vd).alias("_r")
        ).select(
            id_col, "_v", F.col("_r.cells").alias("_cells"),
            F.round(F.col("_r.csim"), 6).alias("_prio"),
        )
        # flag mode references the routed frame in two join branches (the
        # per-cell prune and the primary-cell audit column), so Spark
        # evaluates the routing matmul twice there.  Measured at 1M
        # vectors this is CHEAPER than cutting the lineage: a localCheckpoint
        # of the routed corpus (vectors + cells) costs a full serialize
        # round-trip that exceeds the map-only matmul it saves (86 s vs
        # 47 s prune wall at nlist=2048).  Remove mode routes once by
        # construction either way.
        # `cell` (the flag-mode audit column and the doc's priority anchor)
        # is always the PRIMARY cell; secondary probes only add detection
        # opportunities.  Priority is per-DOC (top-1 centroid sim), constant
        # across memberships, so the dominance order stays a total order on
        # docs no matter how many cells a doc lands in.
        proj = routed.select(
            id_col, "_v", F.explode("_cells").alias("cell"), "_prio"
        )
        proj_primary = routed.select(
            id_col, "_v", F.element_at("_cells", 1).alias("cell"), "_prio"
        )
    if centroids is None:
        proj_primary = proj
    if nprobe != 1 and centroids is None:
        raise ValueError("nprobe > 1 requires trained centroids (the fixed "
                         "argmax-dim quantizer is single-probe by design)")
    if keep == "min_id":
        proj = proj.withColumn("_prio", F.lit(0.0))

    proj_all = proj_primary
    proj = _cap_buckets(proj, ["cell"], max_cell, "semdedup")

    # Within-cell prune = ONE groupBy(cell).applyInPandas: each cell's
    # pairwise cosine matrix is a single numpy matmul per row-block (the
    # paper's per-cluster similarity matrix), blocked so memory stays
    # O(block × cell) even at max_cell.  A pair-join formulation (explode
    # to B²/2 rows + an interpreted HOF cosine per row) measured
    # ~220 µs/pair — 76 s just for the 11M dominance pairs of a 100k
    # corpus; the matmul kernel covers the same cells in seconds.  Rows
    # are sorted by (priority, id); row i drops iff ANY earlier row's
    # cosine rounds to ≥ τ — earlier rows count even when themselves
    # dropped, which is exactly the one-pass dominance rule above.
    id_field = proj.schema[id_col].dataType.simpleString()
    tau = float(threshold)

    def _prune_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pdf.iloc[0:0][[id_col]]
        order = np.lexsort((pdf[id_col].to_numpy(), pdf["_prio"].to_numpy()))
        ids = pdf[id_col].to_numpy()[order]
        m = np.stack(pdf["_v"].to_numpy()[order]).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        n = len(m)
        dropped = np.zeros(n, dtype=bool)
        block = 1024
        for s in range(1, n, block):
            e = min(s + block, n)
            hit = np.round(m[s:e] @ m[:e].T, 6) >= tau
            valid = np.arange(e)[None, :] < np.arange(s, e)[:, None]
            dropped[s:e] = (hit & valid).any(axis=1)
        return pd.DataFrame({id_col: ids[dropped]})

    dominated = proj.groupBy("cell").applyInPandas(_prune_cell, f"{id_col} {id_field}")
    if nprobe > 1:  # a doc can be dominated in more than one probed cell
        dominated = dominated.distinct()
    if mode == "remove":
        return df.join(dominated, id_col, "left_anti")
    flagged = df.join(
        proj_all.select(id_col, "cell"), id_col, "left"
    ).join(dominated.withColumn("semdedup_drop", F.lit(True)), id_col, "left")
    return flagged.withColumn("semdedup_drop", F.coalesce("semdedup_drop", F.lit(False)))
