"""Similarity search over embedding columns — brute-force cosine top-k
baseline + random-hyperplane LSH bucketed variant (the scale path).

The reference's dense retrieval arm is a faiss flat/HNSW/PQ index
(/root/reference/utils/util.py:79-108, /root/reference/retrieval/
retriever.py:10-41); its exact-IP semantics map to the brute-force path here,
and its ANN indexes map to the LSH-bucketed path. Brute force is exact and
SQL-expressible (the driver oracle); LSH trades recall for a bounded join.

Scale shape: brute force is |Q| x |C| — fine when the query side broadcasts
(|Q| small), impossible corpus-vs-corpus. LSH buckets make the join key
(bucket, probe) so each executor only scores its bucket's collisions;
multi-probe raises recall without re-shuffling (probes are generated on the
small query side).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType


def _unit(vec_col):
    norm = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    )
    return F.transform(vec_col, lambda x: x.cast("double") / norm)


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    qid_col: str = "qid",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, vec_id, rank, cosine): exact cosine top-k per query vector.

    broadcast(queries) x corpus — the corpus is never shuffled; each executor
    streams its partition against the broadcast query matrix. Ties broken
    cosine DESC (rounded to 6), vec_id ASC — same determinism contract as the
    BM25 top-k (operators.topk).
    """
    q = F.broadcast(
        queries.select(F.col(qid_col).alias("qid"), _unit(F.col(vec_col)).alias("uq"))
    )
    c = corpus.select(F.col(id_col), _unit(F.col(vec_col)).alias("uc"))
    dot = F.aggregate(
        F.zip_with(F.col("uq"), F.col("uc"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = q.crossJoin(c).select(
        "qid", F.col(id_col), F.round(dot, 6).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "rank", "cosine")
    )


def rademacher_planes(dim: int, n_tables: int, n_planes: int) -> np.ndarray:
    """Deterministic ±1 (Rademacher) hyperplanes derived from md5 parity:
    sign(t, p, i) = +1 iff the first hex digit of md5("t:p:i") is even.

    Sign-random-projection LSH works with ±1 entries just as with Gaussians
    (the collision probability 1 - θ/π is a property of the sign test, and
    Rademacher projections preserve angles in expectation). Deriving signs
    from md5 instead of a seeded RNG makes the whole LSH pipeline exactly
    reproducible in ANY engine with md5 — the DuckDB oracle regenerates the
    identical planes, so the approximate ANN path is hash-verifiable, not
    just recall-bounded. Index and query sides share the planes the way the
    reference shares token2id across workers
    (/root/reference/densify/densify_corpus.py:148-156)."""
    s = np.empty((n_tables, n_planes, dim), dtype=np.float64)
    for t in range(n_tables):
        for p in range(n_planes):
            for i in range(dim):
                h = hashlib.md5(f"{t}:{p}:{i}".encode()).hexdigest()
                s[t, p, i] = 1.0 if int(h[0], 16) % 2 == 0 else -1.0
    return s


def lsh_buckets_udf(
    dim: int, n_tables: int = 8, n_planes: int = 6, probe: bool = False
):
    """pandas UDF: embedding -> array of bucket ids, one (or two, with
    ``probe``) per hash table.

    Multi-table LSH: a single k-plane table finds a neighbor at angle θ with
    prob (1-θ/π)^k — hopeless for moderately-similar vectors; L independent
    tables raise it to 1-(1-p)^L. Bucket id packs (table << 28) | sign bits.
    ``probe=True`` (query side) adds one extra probe per table flipping the
    lowest-margin bit — recall knob with zero extra corpus work.

    Projections run on the RAW vector (sign is normalization-invariant) and
    are rounded to 6 decimals before the sign/argmin tests so engines with
    different float-summation orders bucket identically.
    """
    planes = rademacher_planes(dim, n_tables, n_planes).reshape(
        n_tables * n_planes, dim
    ).T  # (dim, L*k)
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    table_tag = (np.arange(n_tables, dtype=np.int64) << 28)

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)  # (batch, dim)
        proj = np.round(
            (m @ planes).reshape(len(m), n_tables, n_planes), 6
        )
        bits = proj > 0
        base = (bits @ weights) + table_tag  # (batch, L)
        if not probe:
            return pd.Series(list(base))
        low = np.argmin(np.abs(proj), axis=2)  # (batch, L); ties -> lowest p
        flips = base ^ weights[low]
        return pd.Series(list(np.concatenate([base, flips], axis=1)))

    return _buckets


def quantize_vec(vec_col):
    """(maxabs, qvec): int8 scalar quantization as pure Column math —
    q_i = floor(x_i * 127 / maxabs + 0.5) in [-127, 127], dequant
    x̂_i = q_i * maxabs / 127. 4x compression over fp32 (the reference ships
    a PQ-quantized CPU index, /root/reference/retrieval/quantize_index.py:29-35;
    this is its scalar sibling — same storage-vs-precision contract, exactly
    portable). Zero vectors quantize to zeros (maxabs guard)."""
    mx = F.array_max(F.transform(vec_col, lambda x: F.abs(x.cast("double"))))
    q = F.when(mx == 0, F.transform(vec_col, lambda x: F.lit(0).cast("int"))).otherwise(
        F.transform(
            vec_col,
            lambda x: F.floor(x.cast("double") * 127 / mx + 0.5).cast("int"),
        )
    )
    return mx, q


def quantize_embeddings(
    embs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, maxabs, qvec array<int>): the quantized embedding column codec."""
    mx, q = quantize_vec(F.col(vec_col))
    return embs.select(F.col(id_col), mx.alias("maxabs"), q.alias("qvec"))


def _dequant(qvec_col, mx_col):
    return F.transform(qvec_col, lambda qx: qx.cast("double") * mx_col / 127)


def cosine_topk_quantized(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    qid_col: str = "qid",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, vec_id, rank, cosine): brute-force cosine top-k over int8
    scalar-quantized vectors (both sides quantized — the storage format a
    100 TB embedding corpus would use). Same plan as cosine_topk_bruteforce:
    broadcast queries, stream the corpus, window top-k."""

    def _udq(df, out):
        mx, q = quantize_vec(F.col(vec_col))
        keep = qid_col if out == "uq" else id_col
        dq = df.select(F.col(keep), mx.alias("_mx"), q.alias("_q"))
        return dq.select(
            F.col(keep) if out != "uq" else F.col(keep).alias("qid"),
            _unit(_dequant(F.col("_q"), F.col("_mx"))).alias(out),
        )

    q = F.broadcast(_udq(queries, "uq"))
    c = _udq(corpus, "uc")
    dot = F.aggregate(
        F.zip_with(F.col("uq"), F.col("uc"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = q.crossJoin(c).select(
        "qid", F.col(id_col), F.round(dot, 6).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "rank", "cosine")
    )


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_tables: int = 8,
    n_planes: int = 6,
    qid_col: str = "qid",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, vec_id, rank, cosine): approximate top-k via multi-table
    hyperplane LSH.

    corpus is bucketed once, L buckets per vector (reusable index table at
    scale: write out (bucket, vec_id, unit) partitioned by bucket); queries
    explode to their buckets + one probe per table; the equi-join on bucket
    bounds the scoring work. Exact cosine within collisions, so precision is
    exact — only recall is approximate (raise n_tables / lower n_planes to
    trade recall for join width).
    """
    buckets_c = lsh_buckets_udf(dim, n_tables, n_planes, probe=False)
    buckets_q = lsh_buckets_udf(dim, n_tables, n_planes, probe=True)
    c = corpus.select(
        F.col(id_col),
        _unit(F.col(vec_col)).alias("uc"),
        F.explode(buckets_c(F.col(vec_col))).alias("bucket"),
    )
    q = queries.select(
        F.col(qid_col).alias("qid"),
        _unit(F.col(vec_col)).alias("uq"),
        F.explode(buckets_q(F.col(vec_col))).alias("bucket"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("uq"), F.col("uc"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .select("qid", F.col(id_col), F.round(dot, 6).alias("cosine"))
        .groupBy("qid", id_col)  # a pair can collide in several probes
        .agg(F.first("cosine").alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "rank", "cosine")
    )
