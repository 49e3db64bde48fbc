"""Densification — the reference's core storage transform, as a DataFrame op.

`densify(data, dim, ...)` (/root/reference/densify/densify_corpus.py:29-52)
maps a sparse (term_id -> weight) vector into fixed-width value/index arrays:

    slot   = term_id % dim        (densify_corpus.py:41)
    bucket = term_id // dim       (densify_corpus.py:42)
    per (doc, slot): keep the MAX weight and its bucket (argmax), counting
    collisions (densify_corpus.py:43-51); neural twin DHR/utils.py:5-22.

Our engine's exact inverted index supersedes this (no collisions), but the
operator itself is part of the reference's surface, so it ships as a
first-class op: groupBy(docid, slot) + deterministic argmax (weight DESC,
bucket ASC — the reference keeps whichever came first on ties, which is
file-order-dependent; we pin the tie for engine/oracle rank identity).

Scale shape: one hash-partial-aggregated groupBy over postings; output is
|docs| x dim at most — the same exchange pattern as term_freqs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def densify(
    postings: DataFrame,
    dim: int = 768,
    id_col: str = "docid",
    term_col: str = "term_id",
    weight_col: str = "weight",
) -> DataFrame:
    """(docid, slot, value, bucket): slot-max densification of sparse vectors.

    value is the max weight among terms colliding in the slot; bucket is the
    argmax term's bucket (ties: weight DESC then bucket ASC).
    """
    slotted = postings.select(
        F.col(id_col).alias("docid"),
        F.pmod(F.col(term_col), F.lit(dim)).alias("slot"),
        F.floor(F.col(term_col) / dim).cast("long").alias("bucket"),
        F.col(weight_col).alias("value"),
    )
    w = Window.partitionBy("docid", "slot").orderBy(
        F.col("value").desc(), F.col("bucket").asc()
    )
    return (
        slotted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("docid", "slot", "value", "bucket")
    )


def collision_counts(
    postings: DataFrame,
    dim: int = 768,
    id_col: str = "docid",
    term_col: str = "term_id",
) -> DataFrame:
    """(docid, collisions): how many terms were dropped by slot collisions —
    the reference's per-split collision counter (densify_corpus.py:85-91)."""
    slotted = postings.select(
        F.col(id_col).alias("docid"),
        F.pmod(F.col(term_col), F.lit(dim)).alias("slot"),
    )
    per_slot = slotted.groupBy("docid", "slot").agg(
        (F.count("*") - 1).alias("c")
    )
    return per_slot.groupBy("docid").agg(F.sum("c").alias("collisions"))


def gip_score(
    dense_queries: DataFrame,
    dense_corpus: DataFrame,
    lam: float = 1.0,
) -> DataFrame:
    """(qid, docid, score): gated inner product over densified vectors —
    sum of q.value * d.value where slot AND bucket match
    (/root/reference/retrieval/gip_retrieval.py:117-126). The equi-join on
    (slot, bucket) IS the gate; equals the exact sparse dot product absent
    collisions.

    ``lam`` is the reference's query-side λ-scaling hook
    (gip_retrieval.py:281-283, SURVEY P9): the hybrid-fusion weight applied
    to the lexical score before it is combined with a dense-arm score.
    Rank-neutral for lam > 0 in a pure-lexical run; score-visible."""
    q = dense_queries.select(
        F.col("docid").alias("qid"), "slot", "bucket",
        F.col("value").alias("qv"),
    )
    d = dense_corpus.select("docid", "slot", "bucket", F.col("value").alias("dv"))
    return (
        F.broadcast(q)
        .join(d, ["slot", "bucket"])
        .groupBy("qid", "docid")
        .agg((F.sum(F.col("qv") * F.col("dv")) * F.lit(lam)).alias("score"))
    )
