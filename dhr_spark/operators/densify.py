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


def aggregate_pool(
    postings: DataFrame,
    dims: int,
    vocab_size: int,
    id_col: str = "docid",
    term_col: str = "term_id",
    weight_col: str = "weight",
) -> DataFrame:
    """(docid, slot, value): Aggretriever's agg-pooling (A5/A6) as a lexical
    dataflow twin — the signed-pair slot-max that compresses a vocab-sized
    weight vector into ``dims`` entries.

    Reference semantics (/root/reference/tevatron/Aggretriever/utils.py:16-44,
    full mode; the encoder that feeds it: DHR/modeling.py:297-300):
      1. width = 2*dims; rm = vocab_size % width, minus width when the
         remainder exceeds 1000 ("the first 1000 BERT tokens are useless").
      2. rm >= 0 drops the first rm term ids (tid' = tid - rm); rm < 0 pads
         the tail with zeros — a no-op on sparse rows.
      3. lane = tid' % width, max-pooled over buckets (tid' // width) —
         the same fold as ``densify``.
      4. Lanes pair up (even = positive, odd = negative); each pair emits
         +pos when pos > neg else -neg — the signed select that doubles
         effective capacity per slot.
    Missing lanes are implicit zeros (the dense tensor's semantics): a pair
    with only a negative lane emits -neg because 0 > neg is false for
    positive BM25 weights.

    Scale shape: one groupBy(docid, pair) with map-side partial max — the
    densify exchange, nothing more.
    """
    width = 2 * dims
    rm = vocab_size % width
    if rm > 1000:
        rm -= width
    p = postings.select(
        F.col(id_col).alias("docid"),
        (F.col(term_col) - max(rm, 0)).alias("tid2"),
        F.col(weight_col).alias("weight"),
    )
    if rm > 0:
        p = p.filter(F.col("tid2") >= 0)
    lane = F.pmod(F.col("tid2"), F.lit(width))
    pooled = (
        p.select(
            "docid",
            F.floor(lane / 2).cast("long").alias("slot"),
            F.pmod(lane, F.lit(2)).alias("sign"),
            "weight",
        )
        .groupBy("docid", "slot")
        .agg(
            F.max(F.when(F.col("sign") == 0, F.col("weight"))).alias("pos"),
            F.max(F.when(F.col("sign") == 1, F.col("weight"))).alias("neg"),
        )
    )
    value = F.when(
        F.coalesce(F.col("pos"), F.lit(0.0)) > F.coalesce(F.col("neg"), F.lit(0.0)),
        F.col("pos"),
    ).otherwise(-F.coalesce(F.col("neg"), F.lit(0.0)))
    return pooled.select("docid", "slot", F.round(value, 6).alias("value"))
