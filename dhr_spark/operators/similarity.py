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
    """
    planes = _hyperplanes(dim, n_tables * n_planes).T  # (dim, L*k)
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    table_tag = (np.arange(n_tables, dtype=np.int64) << 28)

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())  # (batch, dim)
        proj = (m @ planes).reshape(len(m), n_tables, n_planes)
        bits = proj > 0
        base = (bits @ weights) + table_tag  # (batch, L)
        if not probe:
            return pd.Series(list(base))
        low = np.argmin(np.abs(proj), axis=2)  # (batch, L)
        flips = base ^ weights[low]
        return pd.Series(list(np.concatenate([base, flips], axis=1)))

    return _buckets


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
