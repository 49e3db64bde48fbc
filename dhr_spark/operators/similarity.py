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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

LSH_SEED = 0x5EED


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


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic random hyperplanes (fixed seed — index and query sides
    must agree, like the reference's shared token2id broadcast,
    /root/reference/densify/densify_corpus.py:148-156)."""
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_udf(dim: int, n_planes: int = 12):
    """pandas UDF: embedding -> sign-bit bucket id (int64). Arrow-batched
    matmul against the fixed hyperplane matrix — no per-row Python."""
    planes = _hyperplanes(dim, n_planes).T  # (dim, n_planes)

    @F.pandas_udf(LongType())
    def _bucket(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())  # (batch, dim)
        bits = (m @ planes) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits @ weights)

    return _bucket


def lsh_probe_udf(dim: int, n_planes: int = 12, n_probe: int = 4):
    """pandas UDF: embedding -> array of probe buckets (own bucket + the
    n_probe-1 buckets whose single flipped bit had the smallest margin).
    Query-side multi-probe: recall knob with zero extra corpus work."""
    planes = _hyperplanes(dim, n_planes).T

    @F.pandas_udf(ArrayType(LongType()))
    def _probes(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())
        proj = m @ planes  # (batch, n_planes)
        bits = proj > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        base = (bits @ weights).astype(np.int64)
        # flip order: smallest |projection| = most uncertain bit first
        order = np.argsort(np.abs(proj), axis=1)[:, : max(n_probe - 1, 0)]
        flips = base[:, None] ^ weights[order]
        out = np.concatenate([base[:, None], flips], axis=1)
        return pd.Series(list(out))

    return _probes


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 12,
    n_probe: int = 4,
    qid_col: str = "qid",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, vec_id, rank, cosine): approximate top-k via hyperplane LSH.

    corpus is bucketed once (reusable index table at scale: write out
    (bucket, vec_id, unit) partitioned by bucket); queries explode to their
    probe buckets; the equi-join on bucket bounds the scoring work. Exact
    cosine within collisions, so precision is exact — only recall is
    approximate (raise n_probe / lower n_planes to trade).
    """
    bucket = lsh_bucket_udf(dim, n_planes)
    probes = lsh_probe_udf(dim, n_planes, n_probe)
    c = corpus.select(
        F.col(id_col),
        _unit(F.col(vec_col)).alias("uc"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(qid_col).alias("qid"),
        _unit(F.col(vec_col)).alias("uq"),
        F.explode(probes(F.col(vec_col))).alias("bucket"),
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
