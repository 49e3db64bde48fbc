"""BM25F — field-weighted BM25 over multi-field documents, the transcripts
payload's native ranking: a conversation is one retrieval unit whose fields
are its turn roles (user / assistant / tool), and fields contribute with
different weights (a user's words usually matter more than tool output).

Model (Robertson-Zaragoza BM25F, simple variant): per-field term frequencies
are combined BEFORE saturation —

    wtf(d, t)  = sum_f  w_f * tf_f(d, t)        # weighted tf
    wdl(d)     = sum_f  w_f * dl_f(d)           # weighted doc length
    avgwdl     = avg_d wdl(d)
    score(q,d) = sum_t qtf(t) * idf(t) * wtf / (wtf + k1*(1 - b + b*wdl/avgwdl))

with idf from the ordinary document frequency (a doc counts once however
many fields the term appears in). With all weights = 1 this is exactly BM25
over the concatenated text — the degenerate case pins the implementation.

Plan shape (scale): one explode + groupBy((id, term)) with the field weight
applied per occurrence — the SAME single shuffle as plain term-frequency
extraction (operators/termfreq.py); df/avgwdl are the usual tiny aggregate
prepass; scoring reuses the broadcast-join plan of operators/topk.score_all.
Nothing here adds a shuffle over plain BM25, so every 100-TB property of the
lexical pipeline carries over unchanged.

Determinism note: choose field weights that are exact binary fractions
(e.g. 2.0 / 1.0 / 0.5 / 0.25) — then w_f·tf products and their sums are
EXACT in float64 regardless of aggregation order, and Spark and any SQL
oracle agree bit-for-bit on wtf/wdl before the (rounded) score comparison.

Reference anchor: the reference scores single-field passages
(/root/reference/retrieval/sparse_retrieval.py); BM25F is the standard
multi-field extension (Lucene's PerFieldSimilarity / BM25FQuery analogue)
required once the corpus is multi-turn transcripts rather than passages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dhr_spark import B, K1
from dhr_spark.functions.bm25 import bm25_weight_col, idf_col


def _weight_col(field_col: str, weights: dict[str, float], default: float) -> Column:
    pairs = []
    for k, v in sorted(weights.items()):
        pairs += [F.lit(k), F.lit(float(v))]
    return F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(field_col)),
        F.lit(float(default)),
    )


def bm25f_postings(
    turns_tok: DataFrame,
    weights: dict[str, float],
    id_col: str = "conv_id",
    field_col: str = "role",
    tokens_col: str = "tokens",
    k1: float = K1,
    b: float = B,
    default_weight: float = 1.0,
) -> DataFrame:
    """(id_col, term, weight): per-(document, term) BM25F weights.

    ``turns_tok``: one row per field instance (e.g. per turn) with the
    retrieval-unit id, the field label, and its analyzed token array. A
    document may have many rows per field; weights attach per occurrence.
    """
    w = _weight_col(field_col, weights, default_weight)
    occ = turns_tok.select(
        F.col(id_col).alias("_id"), w.alias("_w"),
        F.explode(tokens_col).alias("term"),
    )
    wtf = occ.groupBy("_id", "term").agg(F.sum("_w").alias("wtf"))
    # weighted doc length from array sizes — no explode, and a document whose
    # every field is empty keeps wdl = 0 instead of vanishing
    wdl = (
        turns_tok.select(
            F.col(id_col).alias("_id"),
            (w * F.size(tokens_col).cast("double")).alias("_wl"),
        )
        .groupBy("_id")
        .agg(F.sum("_wl").alias("wdl"))
    )
    cs = wdl.agg(
        F.count("*").alias("n"), F.avg("wdl").alias("avgwdl")
    ).collect()[0]
    n_docs, avgwdl = int(cs["n"]), float(cs["avgwdl"])
    ts = wtf.groupBy("term").agg(F.count("*").alias("df"))
    return (
        wtf.join(wdl, "_id")
        .join(F.broadcast(ts), "term")
        .select(
            F.col("_id").alias(id_col),
            "term",
            bm25_weight_col(
                F.col("wtf"), F.col("wdl"),
                idf_col(F.col("df"), n_docs), F.lit(avgwdl), k1, b,
            ).alias("weight"),
        )
    )


def bm25f_topk(
    qtfs: DataFrame,
    turns_tok: DataFrame,
    weights: dict[str, float],
    k: int = 1000,
    id_col: str = "conv_id",
    field_col: str = "role",
    tokens_col: str = "tokens",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(qid, docid, rank, score): field-weighted top-k. ``qtfs`` = (qid,
    term, qtf). The output id column is named ``docid`` to match every other
    retrieval surface (it carries ``id_col`` values)."""
    from dhr_spark.operators.topk import score_all, topk

    post = bm25f_postings(
        turns_tok, weights, id_col=id_col, field_col=field_col,
        tokens_col=tokens_col, k1=k1, b=b,
    ).withColumnRenamed(id_col, "docid")
    return topk(score_all(qtfs, post, on="term"), k)
