"""Similarity search over embedding columns (array<float>).

Three tiers:

  cosine_expr / brute_force_topk — exact: JVM-side dot product via
      F.zip_with + F.aggregate (no Python), one pass over the corpus per
      query batch. The correctness baseline, and fine up to ~10^8 vectors
      per query batch because it is a pure scan (no shuffle at all until
      the final top-k).
  ivf_topk — the scale path: corpus pre-assigned to nlist centroid cells
      (deterministic centroid seed), query probes the nprobe nearest cells;
      scan cost drops by ~nlist/nprobe. Assignment is a vectorized numpy
      pandas UDF (matrix multiply per Arrow batch).
  hyperplane_bucket_udf — random-hyperplane sign LSH (shared with
      embedding near-dup in dedup.py).

Top-k selection uses Window row_number over a (query) partition — one
shuffle of only the surviving scored rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEED = 42


def cosine_expr(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity of two array<float/double> columns, pure JVM:
    zip_with product + aggregate sum, over norms."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    ca = ca.cast("array<double>")
    cb = cb.cast("array<double>")
    dot = F.aggregate(F.zip_with(ca, cb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(ca, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(cb, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast the (small) query set against the corpus scan.

    The corpus is never shuffled — queries are broadcast, scores computed in
    the scan stage, and only per-query candidates move for the top-k window.
    """
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qvec"))
    scored = corpus.join(F.broadcast(q)).withColumn(
        "cosine", cosine_expr(vec_col, "_qvec")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


# --- numpy-accelerated scoring (mapInPandas; Arrow batches) -------------------

def brute_force_topk_numpy(
    corpus: DataFrame,
    query_vecs: dict[int, list[float]],
    k: int = 10,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same result as brute_force_topk but scores every query against each
    Arrow batch with ONE numpy matrix multiply — the fast path when queries
    fit in a broadcast dict. Partial top-k per partition, exact merge after."""
    spark = corpus.sparkSession
    qids = sorted(query_vecs)
    qmat = np.array([query_vecs[q] for q in qids], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, qmat))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField(corpus_id, T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score(batches):
        qids_, qmat_ = bc.value
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ qmat_.T  # (batch, nq)
            ids = pdf[corpus_id].to_numpy()
            # partial top-k per batch per query
            frames = []
            kk = min(k, len(ids))
            for j, qid in enumerate(qids_):
                idx = np.argpartition(-sims[:, j], kk - 1)[:kk]
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, corpus_id: ids[idx], "cosine": sims[idx, j]}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    partial = corpus.select(corpus_id, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", corpus_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


# --- IVF (inverted-file) index -------------------------------------------------

def train_centroids(
    corpus: DataFrame,
    nlist: int,
    corpus_id: str,
    vec_col: str,
    iters: int = 5,
    update: str = "auto",
) -> np.ndarray:
    """Distributed spherical k-means (Lloyd's), the real IVF training loop.

    Per iteration:
      assign — one numpy matmul per Arrow batch (mapInPandas); each partition
               emits at most nlist (cell, partial_sum_vec, count) rows, so the
               map-side combine is explicit and the shuffle carries
               O(partitions × nlist × dim) numbers, independent of corpus size.
      update — two strategies, ``update=`` "columns" | "posexplode" | "auto":
               * columns: groupBy(cell) with one F.sum(element_at) column per
                 dimension — fewest shuffle rows, but the agg fans out to
                 `dim` columns (fine at dim≲64, pathological at 768).
               * posexplode: explode psum to (cell, pos, v) and run ONE
                 F.sum over nlist×dim keys — agg width constant in dim, the
                 collect is still ≤ nlist×dim tiny scalars (12k at
                 nlist=16,dim=768).  "auto" picks posexplode when dim > 64.
    Init is a deterministic pseudo-random sample: the nlist vectors with the
    smallest xxhash64(id) — TakeOrderedAndProject, no full sort, no RNG state.
    Empty cells keep their previous centroid.  Centroids are L2-normalized
    (cosine/spherical variant) every step."""
    if update not in ("auto", "columns", "posexplode"):
        raise ValueError(f"update must be auto|columns|posexplode, got {update!r}")
    spark = corpus.sparkSession
    first_vec = corpus.select(vec_col).first()[0]
    dim = len(first_vec)
    use_explode = update == "posexplode" or (update == "auto" and dim > 64)
    init_rows = (
        corpus.select(corpus_id, vec_col)
        .orderBy(F.xxhash64(F.col(corpus_id)), F.col(corpus_id))
        .limit(nlist)
        .collect()
    )
    cents = np.array([r[1] for r in init_rows], dtype=np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    vecs = corpus.select(vec_col)
    out_schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("psum", T.ArrayType(T.DoubleType())),
            T.StructField("cnt", T.LongType()),
        ]
    )
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cents)

        def partials(batches, _bc=bc):
            c = _bc.value
            for pdf in batches:
                m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
                cell = np.argmax(m @ c.T, axis=1)
                sums = np.zeros((len(c), m.shape[1]))
                np.add.at(sums, cell, m)
                cnts = np.bincount(cell, minlength=len(c))
                nz = np.nonzero(cnts)[0]
                yield pd.DataFrame(
                    {
                        "cell": nz.astype(np.int32),
                        "psum": [sums[i].tolist() for i in nz],
                        "cnt": cnts[nz].astype(np.int64),
                    }
                )

        part = vecs.mapInPandas(partials, out_schema)
        new = cents.copy()
        if use_explode:
            agg = (
                part.select("cell", F.posexplode("psum").alias("pos", "v"))
                .groupBy("cell", "pos")
                .agg(F.sum("v").alias("s"))
            )
            sums = np.zeros((nlist, dim))
            seen = np.zeros(nlist, dtype=bool)
            for r in agg.collect():  # ≤ nlist×dim tiny scalar rows
                sums[r["cell"], r["pos"]] = r["s"]
                seen[r["cell"]] = True
            for c_ix in np.nonzero(seen)[0]:
                nrm = np.linalg.norm(sums[c_ix])
                if nrm > 1e-12:
                    new[c_ix] = sums[c_ix] / nrm
        else:
            agg = part.groupBy("cell").agg(
                *[F.sum(F.element_at("psum", d + 1)).alias(f"s{d}") for d in range(dim)],
                F.sum("cnt").alias("cnt"),
            )
            for r in agg.collect():  # ≤ nlist tiny rows
                v = np.array([r[f"s{d}"] for d in range(dim)])
                nrm = np.linalg.norm(v)
                if nrm > 1e-12:
                    new[r["cell"]] = v / nrm
        cents = new
        bc.unpersist()
    return cents


def assign_cells(corpus: DataFrame, centroids: np.ndarray, vec_col: str = "embedding") -> DataFrame:
    """Add a `cell` column: argmax-cosine centroid per vector (numpy batch)."""
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    @F.pandas_udf(T.IntegerType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        c = bc.value
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ c.T, axis=1).astype(np.int32))

    return corpus.withColumn("cell", cell_udf(F.col(vec_col)))


def ivf_topk(
    corpus_with_cells: DataFrame,
    centroids: np.ndarray,
    query_vecs: dict[int, list[float]],
    k: int = 10,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest cells per query, brute-force inside them.

    The probe cells are known driver-side, so the corpus is filtered with an
    explicit ``cell IN (...)`` BEFORE the join — against an index written
    ``partitionBy("cell")`` this is partition pruning (only nprobe/nlist of
    the files are ever opened); against an in-memory frame it is still a
    pushed-down scan filter.
    """
    spark = corpus_with_cells.sparkSession
    qids = sorted(query_vecs)
    qmat = np.array([query_vecs[q] for q in qids], dtype=np.float64)
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]

    probe_rows = [
        (int(qid), int(cell), [float(x) for x in query_vecs[qid]])
        for qid, cells in zip(qids, probes)
        for cell in cells
    ]
    probe_df = spark.createDataFrame(
        probe_rows, "query_id long, cell int, _qvec array<double>"
    )
    probed_cells = sorted({int(c) for row in probes for c in row})
    pruned = corpus_with_cells.filter(F.col("cell").isin(probed_cells))
    scored = pruned.join(F.broadcast(probe_df), "cell").withColumn(
        "cosine", cosine_expr(vec_col, "_qvec")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", corpus_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


# --- persistent IVF index (build once / search many) ---------------------------

def _hadoop_write_text(spark, path: str, content: str) -> None:
    """Write a small text file through the JVM Hadoop FileSystem — works for
    ANY URI the parquet writer accepts (file://, hdfs://, s3a://…), unlike a
    local open() which would strand the sidecar when the index lives on an
    object store."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def _hadoop_read_text(spark, path: str) -> str:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    stream = fs.open(p)
    sink = jvm.java.io.ByteArrayOutputStream()
    try:
        # copyBytes(in, out, conf, close=False): stream-copy inside the JVM;
        # one py4j hop for the whole payload instead of per-read chunking
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, sink, conf, False)
    finally:
        stream.close()
    return bytes(sink.toByteArray()).decode("utf-8")

def build_ivf_index(
    corpus: DataFrame,
    path: str,
    nlist: int = 16,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
) -> np.ndarray:
    """Train centroids, assign cells, and WRITE the corpus ``partitionBy("cell")``.

    This is the index-build half of IVF — run once per corpus version, like
    any ANN index build.  Searches then read ``path`` with partition pruning
    (nprobe/nlist of the files).  Centroids persist as `_centroids.json`
    inside the index directory so a search session needs no retraining; at
    cluster scale that file lives on the same object store as the data (it is
    nlist×dim floats — KBs), written through the Hadoop FileSystem API so the
    same s3a://… path works for sidecar and parquet alike.  Parquet ignores
    underscore-prefixed files, so the sidecar is invisible to readers of the
    table itself."""
    import json

    cents = train_centroids(corpus, nlist, corpus_id, vec_col, iters=iters)
    assign_cells(corpus, cents, vec_col).write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(path)
    _hadoop_write_text(
        corpus.sparkSession, path.rstrip("/") + "/_centroids.json", json.dumps(cents.tolist())
    )
    return cents


def load_ivf_index(spark, path: str) -> tuple[DataFrame, np.ndarray]:
    """Open a built IVF index: (cell-partitioned DataFrame, centroid matrix)."""
    import json

    cents = np.array(
        json.loads(_hadoop_read_text(spark, path.rstrip("/") + "/_centroids.json")),
        dtype=np.float64,
    )
    return spark.read.parquet(path), cents


def ivf_search(
    spark,
    index_path: str,
    query_vecs: dict[int, list[float]],
    k: int = 10,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a built index: centroid routing driver-side, then a
    partition-pruned scan of only the probed cells (`PartitionFilters:
    cell IN (...)` in the parquet scan node)."""
    corpus, cents = load_ivf_index(spark, index_path)
    return ivf_topk(
        corpus, cents, query_vecs, k=k, nprobe=nprobe, corpus_id=corpus_id, vec_col=vec_col
    )


# --- product quantization (PQ) — the compressed-scan ANN tier -------------------
#
# At 100 TB the dominant ANN cost is reading the vectors: a 768-dim float32
# embedding is 3 KB/row, while an m=8 PQ code is 8 BYTES/row (384×
# compression).  PQ (Jégou et al. 2011, public) trades exactness for that
# compression: vectors are split into m subspaces, each quantized to one of
# ksub codebook entries, and search scores codes against per-query lookup
# tables (ADC) without ever touching the original floats.  Training runs on
# a deterministic hash-ordered sample (the standard practice — codebooks
# need thousands of examples, not the corpus); encode and search stream the
# corpus exactly once each.

def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 256,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 8192,
    iters: int = 10,
) -> np.ndarray:
    """Train PQ codebooks → array (m, ksub, dim/m).

    Sample = the ``sample`` rows with smallest xxhash64(id)
    (TakeOrderedAndProject — deterministic, no full sort, no RNG state),
    collected driver-side; per-subspace Lloyd's k-means runs in numpy with
    hash-order init, so the codebooks are bit-identical across runs and
    cluster sizes.  Vectors are L2-normalized first (cosine/IP variant —
    matches every other tier in this module)."""
    if ksub > 256:
        raise ValueError(f"ksub must be <= 256 (codes are one byte), got {ksub}")
    rows = (
        corpus.select(corpus_id, vec_col)
        .orderBy(F.xxhash64(F.col(corpus_id)), F.col(corpus_id))
        .limit(sample)
        .collect()
    )
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n, dim = X.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if n < ksub:
        raise ValueError(f"sample ({n}) smaller than ksub ({ksub}) — shrink ksub")
    dsub = dim // m
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = X[:, j * dsub : (j + 1) * dsub]
        cents = sub[:ksub].copy()  # hash-ordered sample ⇒ already shuffled
        for _ in range(iters):
            d = (
                (sub**2).sum(1)[:, None]
                - 2.0 * (sub @ cents.T)
                + (cents**2).sum(1)[None, :]
            )
            assign = d.argmin(1)
            for c_ix in range(ksub):
                mask = assign == c_ix
                if mask.any():
                    cents[c_ix] = sub[mask].mean(0)
        books[j] = cents
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Add an m-byte PQ code column (BinaryType).  One numpy matmul per
    subspace per Arrow batch; the encoded corpus is what gets persisted —
    at m=8 that is an 8-byte column replacing the float array for search."""
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    @F.pandas_udf(T.BinaryType())
    def enc(vecs: pd.Series) -> pd.Series:
        books = bc.value
        m_, _ksub, dsub = books.shape
        M = np.stack(vecs.to_numpy()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(M), m_), dtype=np.uint8)
        for j in range(m_):
            sub = M[:, j * dsub : (j + 1) * dsub]
            d = -2.0 * (sub @ books[j].T) + (books[j] ** 2).sum(1)[None, :]
            codes[:, j] = d.argmin(1)
        return pd.Series([c.tobytes() for c in codes])

    return corpus.withColumn(out_col, enc(F.col(vec_col)))


def pq_search(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vecs: dict[int, list[float]],
    k: int = 10,
    corpus_id: str = "vec_id",
    codes_col: str = "codes",
    refine_with: DataFrame | None = None,
    shortlist: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes.

    Per query the driver builds an (m, ksub) inner-product table between the
    normalized query subvectors and the codebooks; executors then score a
    whole Arrow batch with ONE fancy-index + sum over the code matrix —
    no float vectors are read, no shuffle until the per-query top-k window
    over surviving candidates (same merge shape as brute_force_topk_numpy).
    Scores approximate cosine (normalized-IP); exactness is bounded by
    quantization error, pinned by recall tests, not an oracle.

    ``refine_with`` enables the standard two-stage shape: ADC selects a
    ``shortlist`` (default 5k) per query from the compressed scan, then the
    shortlist — and ONLY the shortlist — joins back to the float table for
    exact cosine re-ranking.  At scale this is the point of PQ: the float
    column is read for nq×shortlist rows, not the corpus, while top-k
    precision recovers to near-exact (quantization only has to get the
    CANDIDATE SET right, not the final ordering)."""
    if refine_with is not None:
        shortlist = shortlist or 5 * k
        cand = pq_search(
            encoded, codebooks, query_vecs, k=shortlist,
            corpus_id=corpus_id, codes_col=codes_col,
        ).select("query_id", corpus_id)
        spark = encoded.sparkSession
        qdf = spark.createDataFrame(
            [(int(q), [float(x) for x in v]) for q, v in query_vecs.items()],
            f"query_id long, _qvec array<double>",
        )
        exact = (
            refine_with.select(corpus_id, vec_col)
            .join(F.broadcast(cand), corpus_id)
            .join(F.broadcast(qdf), "query_id")
            .withColumn("score", cosine_expr(vec_col, "_qvec"))
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(corpus_id))
        return (
            exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", corpus_id, F.round("score", 6).alias("score"), "rank")
        )
    spark = encoded.sparkSession
    qids = sorted(query_vecs)
    qmat = np.array([query_vecs[q] for q in qids], dtype=np.float64)
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    m_, ksub, dsub = codebooks.shape
    # tables[i, j, c] = <q_i[sub j], book[j][c]>
    tables = np.einsum("qjd,jcd->qjc", qmat.reshape(len(qids), m_, dsub), codebooks)
    bc = spark.sparkContext.broadcast((qids, tables))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField(corpus_id, T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def adc(batches):
        qids_, tables_ = bc.value
        jj = np.arange(tables_.shape[1])
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.frombuffer(b"".join(pdf[codes_col]), dtype=np.uint8).reshape(
                len(pdf), -1
            )
            ids = pdf[corpus_id].to_numpy()
            kk = min(k, len(ids))
            frames = []
            for i, qid in enumerate(qids_):
                scores = tables_[i][jj[None, :], codes].sum(1)
                idx = np.argpartition(-scores, kk - 1)[:kk]
                frames.append(
                    pd.DataFrame({"query_id": qid, corpus_id: ids[idx], "score": scores[idx]})
                )
            yield pd.concat(frames, ignore_index=True)

    partial = encoded.select(corpus_id, codes_col).mapInPandas(adc, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", corpus_id, F.round("score", 6).alias("score"), "rank")
    )


# --- random-hyperplane LSH -----------------------------------------------------

def hyperplane_bands_udf(n_tables: int = 4, n_planes: int = 8, seed: int = SEED):
    """`n_tables` independent sign-pattern bucket ids per vector (banded LSH —
    candidate iff colliding in ANY table).  One (dim × tables·planes) matmul
    per Arrow batch; planes derived deterministically from (seed, dim) so all
    executors agree."""
    plane_cache: dict[int, np.ndarray] = {}

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def bands(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        dim = m.shape[1]
        if dim not in plane_cache:
            plane_cache[dim] = np.random.default_rng(seed + dim).standard_normal(
                (dim, n_tables * n_planes)
            )
        signs = ((m @ plane_cache[dim]) > 0).reshape(len(m), n_tables, n_planes)
        vals = signs @ (1 << np.arange(n_planes))  # (batch, n_tables)
        return pd.Series(list(vals.astype(np.int32)))

    return bands


def hyperplane_bucket_udf(n_planes: int = 8, seed: int = SEED):
    """Sign-pattern bucket id from n_planes fixed random hyperplanes.
    Planes are derived deterministically from (seed, vector dim), so every
    executor draws identical planes regardless of batch order."""
    plane_cache: dict[int, np.ndarray] = {}

    @F.pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        dim = m.shape[1]
        if dim not in plane_cache:
            plane_cache[dim] = np.random.default_rng(seed + dim).standard_normal((dim, n_planes))
        signs = (m @ plane_cache[dim]) > 0
        vals = signs @ (1 << np.arange(n_planes))
        return pd.Series(vals.astype(np.int32))

    return bucket
