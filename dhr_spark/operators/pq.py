"""Product quantization (PQ) ANN over embedding columns — the memory-compression
scale path, sibling of the IVF coarse quantizer in operators.ivf.

The reference quantizes its served CPU index with faiss
``IndexPQ(dim, 64, 8)`` — 64 sub-quantizers, 8 bits each
(/root/reference/retrieval/quantize_index.py:29-35) — and serves
HNSW/HNSWPQ variants through util.py:79-108. PQ is the piece that makes a
10^12-vector index fit in cluster memory: each unit vector is split into
``m`` contiguous subspaces, every subspace gets its own small codebook
(k-means, ``ksub`` centroids), and a vector is stored as just ``m`` code
ids (m·log2(ksub) bits instead of dim·32). Queries score by ADC
(asymmetric distance computation): one dot-product table per (query,
subspace, centroid), then score(doc) = Σ_m table[m][code_m(doc)] — pure
table lookups, never touching the original vectors.

Spark-first decomposition, all deterministic DataFrame algebra:

  1. ``pq_codebooks``  — per-subspace L2 k-means with DETERMINISTIC seeding
     (the ksub smallest vec_ids' sub-vectors) and a fixed iteration count;
     every intermediate rounded to 6 decimals, so any engine reproduces the
     identical codebooks (the DuckDB oracle in ``__spark_entry__`` replays
     them bit-for-bit, like the IVF path).
  2. ``pq_encode``     — per (vector, subspace) nearest-centroid by rounded
     L2 distance (ties: cid ASC): the compressed corpus representation.
     At scale THIS is what you persist; the float vectors can be dropped.
  3. ``cosine_topk_pq``— ADC top-k: the per-query dot tables are
     |Q|·m·ksub rows (tiny — they broadcast), the scoring join touches only
     the m-row codes per doc, and the final agg is one (qid, vec_id) sum.

Scale shape: codebook training samples can bound the k-means input (train
on a fraction, encode everything — faiss's own practice); the scoring join
is equi-join + sum with no crossJoin anywhere; compose with operators.ivf
(IVF-PQ) by restricting ``codes`` to the probed cells' vectors before the
ADC join — the same composition as faiss IndexIVFPQ.

Approximation contract: ADC approximates the true cosine with quantization
error only (no candidate pruning), so recall degrades smoothly with
m/ksub; the recall-vs-bruteforce bound is pinned in tests like the
LSH/IVF paths, and the full pipeline is value-hash-verified against the
DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dhr_spark.operators.similarity import _unit

PQ_M = 16
PQ_KSUB = 32
PQ_ITERS = 2


def _sub_rows(
    embs: DataFrame, id_col: str, vec_col: str, m: int, dim: int
) -> DataFrame:
    """(vec_id, sub, i, x): unit-normalized vectors in row form, sliced into
    ``m`` contiguous subspaces of dim/m components each."""
    d_sub = dim // m
    return embs.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(_unit(F.col(vec_col))).alias("pos", "x"),
    ).select(
        "vec_id",
        (F.col("pos") / d_sub).cast("int").alias("sub"),
        (F.col("pos") % d_sub).alias("i"),
        "x",
    )


def _nearest(comp: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, sub, cid): nearest centroid per (vector, subspace) by
    rounded L2 distance (ties: cid ASC)."""
    dists = (
        comp.join(F.broadcast(cent), ["sub", "i"])
        .groupBy("vec_id", "sub", "cid")
        .agg(
            F.round(
                F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))), 6
            ).alias("dist")
        )
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.col("dist").asc(), F.col("cid").asc()
    )
    return (
        dists.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "sub", "cid")
    )


def pq_codebooks(
    embs: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(sub, cid, i, c): per-subspace L2 k-means codebooks in row form.

    Seeds = the ksub smallest ids' sub-vectors (per subspace); each
    iteration reassigns by rounded L2 and recomputes member means. All
    values rounded to 6 decimals per step — the determinism contract that
    makes the DuckDB twin bit-identical. Empty clusters drop out (same
    behavior as the IVF trainer)."""
    if dim is None:
        dim = len(embs.select(vec_col).first()[0])
    comp = _sub_rows(embs, id_col, vec_col, m, dim)
    cent = comp.filter(F.col("vec_id") < ksub).select(
        "sub",
        F.col("vec_id").alias("cid"),
        "i",
        F.round(F.col("x"), 6).alias("c"),
    )
    for _ in range(iters):
        assign = _nearest(comp, cent)
        cent = (
            comp.join(assign, ["vec_id", "sub"])
            .groupBy("sub", "cid", "i")
            .agg(F.round(F.avg("x"), 6).alias("c"))
        )
    return cent


def pq_encode(
    embs: DataFrame,
    codebooks: DataFrame,
    m: int = PQ_M,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, sub, cid): the PQ codes — the compressed corpus. m rows per
    vector, each holding a log2(ksub)-bit centroid id."""
    if dim is None:
        dim = len(embs.select(vec_col).first()[0])
    return _nearest(_sub_rows(embs, id_col, vec_col, m, dim), codebooks)


def adc_tables(
    queries: DataFrame,
    codebooks: DataFrame,
    m: int = PQ_M,
    dim: int | None = None,
    qid_col: str = "qid",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, sub, cid, dot): the ADC lookup tables — the query's sub-vector
    dotted with every centroid of that subspace. |Q|·m·ksub rows."""
    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    qcomp = _sub_rows(queries, qid_col, vec_col, m, dim).withColumnRenamed(
        "vec_id", "qid"
    )
    return (
        qcomp.join(F.broadcast(codebooks), ["sub", "i"])
        .groupBy("qid", "sub", "cid")
        .agg(F.round(F.sum(F.col("x") * F.col("c")), 6).alias("dot"))
    )


def cosine_topk_pq(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    qid_col: str = "qid",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, vec_id, rank, adc): PQ/ADC approximate cosine top-k.

    score(q, d) = Σ_sub dot(q_sub, codebook[sub][code(d, sub)]) — the ADC
    approximation of cosine on unit vectors. The tables broadcast; the
    scoring join reads only the m-row codes per doc. For IVF-PQ, filter
    ``codes`` to the probed cells' vec_ids first (operators.ivf.ivf_assign)."""
    dim = len(corpus.select(vec_col).first()[0])
    books = pq_codebooks(corpus, m, ksub, iters, dim, id_col, vec_col)
    codes = pq_encode(corpus, books, m, dim, id_col, vec_col)
    tables = adc_tables(queries, books, m, dim, qid_col, vec_col)
    scored = (
        codes.join(F.broadcast(tables), ["sub", "cid"])
        .groupBy("qid", "vec_id")
        .agg(F.round(F.sum("dot"), 6).alias("adc"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("vec_id").alias(id_col), "rank", "adc")
    )


def cosine_topk_ivfpq(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int | None = None,
    n_probe: int | None = None,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    qid_col: str = "qid",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, vec_id, rank, adc): IVF-PQ — faiss IndexIVFPQ's shape, composed
    from the two operators this engine already has. The IVF coarse quantizer
    (operators.ivf) restricts candidates to the queries' probed cells; PQ/ADC
    scores only those candidates from their m-row codes. At 100 TB this is
    the served ANN configuration: the corpus is stored as (cid-partitioned
    codes), probes prune whole partitions, and the float vectors are never
    read at query time. (HNSW — the reference's other served option,
    util.py:87-90 — is deliberately not replicated: a per-node graph walk
    is sequential pointer-chasing over a RAM-resident graph, the opposite
    of a shardable scan; IVF-PQ trades the same recall knob via n_probe.)"""
    from dhr_spark.operators.ivf import (
        IVF_K,
        IVF_PROBE,
        _assign,
        _unit_rows,
        ivf_assign,
        ivf_centroids,
    )

    n_centroids = n_centroids or IVF_K
    n_probe = n_probe or IVF_PROBE
    dim = len(corpus.select(vec_col).first()[0])
    cent = ivf_centroids(corpus, n_centroids, id_col=id_col, vec_col=vec_col)
    cells = ivf_assign(corpus, cent, id_col, vec_col).withColumnRenamed(
        "cid", "cell"
    )
    qprobes = _assign(
        _unit_rows(queries, qid_col, vec_col), cent, rank_to=n_probe
    ).select(F.col("vec_id").alias("qid"), F.col("cid").alias("cell"))
    cand = (
        F.broadcast(qprobes).join(cells, "cell").select("qid", "vec_id").distinct()
    )
    books = pq_codebooks(corpus, m, ksub, iters, dim, id_col, vec_col)
    codes = pq_encode(corpus, books, m, dim, id_col, vec_col)
    tables = adc_tables(queries, books, m, dim, qid_col, vec_col)
    scored = (
        codes.join(cand, "vec_id")
        .join(F.broadcast(tables), ["qid", "sub", "cid"])
        .groupBy("qid", "vec_id")
        .agg(F.round(F.sum("dot"), 6).alias("adc"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("vec_id").alias(id_col), "rank", "adc")
    )
