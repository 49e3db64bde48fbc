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


def dismax_topk(
    qtfs: DataFrame,
    turns_tok: DataFrame,
    tie: float = 0.0,
    k: int = 1000,
    id_col: str = "conv_id",
    field_col: str = "role",
    tokens_col: str = "tokens",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(qid, docid, rank, score): Lucene DisjunctionMaxQuery across fields —

        score(q, d) = max_f s_f(q, d) + tie * sum_{f' != best} s_f'(q, d)

    where each field scores as its OWN BM25 sub-index (per-field df,
    docCount, dl, avgdl — Lucene's per-field statistics), the standard
    dis-max shape for "best matching field wins, others tie-break"
    (tie = tieBreakerMultiplier; 0 = pure max, 1 = plain sum).

    Plan shape: ONE explode + groupBy((field, id, term)) builds every
    field's postings simultaneously (no per-field pass); per-field stats
    are a |fields|-row broadcast; scoring is the usual broadcast-qtf join;
    the dis-max combine is a second tiny agg over (qid, id) — rows bounded
    by matching (qid, id, field) triples. Use exact binary ``tie``
    fractions (0.5, 0.25) for cross-engine float determinism.
    """
    from dhr_spark.operators.topk import topk

    occ = turns_tok.select(
        F.col(id_col).alias("_id"),
        F.col(field_col).alias("_f"),
        F.explode(tokens_col).alias("term"),
    )
    tf = occ.groupBy("_f", "_id", "term").agg(F.count("*").alias("tf"))
    dl = (
        turns_tok.select(
            F.col(id_col).alias("_id"),
            F.col(field_col).alias("_f"),
            F.size(tokens_col).alias("_l"),
        )
        .groupBy("_f", "_id")
        .agg(F.sum("_l").alias("dl"))
        .filter(F.col("dl") > 0)
    )
    fstats = dl.groupBy("_f").agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    ts = tf.groupBy("_f", "term").agg(F.count("*").alias("df"))
    post = (
        tf.join(dl, ["_f", "_id"])
        .join(F.broadcast(ts), ["_f", "term"])
        .join(F.broadcast(fstats), "_f")
        .select(
            "_f",
            F.col("_id").alias("docid"),
            "term",
            bm25_weight_col(
                F.col("tf"), F.col("dl"),
                idf_col(F.col("df"), F.col("n_docs")), F.col("avgdl"),
                k1, b,
            ).alias("weight"),
        )
    )
    per_field = (
        F.broadcast(qtfs)
        .join(post, "term")
        .groupBy("qid", "docid", "_f")
        .agg(F.sum(F.col("qtf") * F.col("weight")).alias("s"))
    )
    combined = per_field.groupBy("qid", "docid").agg(
        (
            F.max("s") + F.lit(float(tie)) * (F.sum("s") - F.max("s"))
        ).alias("score")
    )
    return topk(combined, k)
