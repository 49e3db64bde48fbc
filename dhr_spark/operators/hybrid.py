"""Hybrid dense+lexical retrieval — the reference's namesake operation.

dhr fuses a dense [CLS] arm with a lexical (densified BM25) arm in ONE gated
inner product: the CLS dims are always-on (gate padded with 1s,
/root/reference/retrieval/gip_retrieval.py:110-113) and the query-side CLS
block is λ-scaled before scoring (gip_retrieval.py:281-283), so

    score(q, d) = λ · dense(q, d) + lexical_BM25(q, d)

(the reference scales the dense block; any positive rescaling of either arm
is the same family — we expose λ on the dense arm to match its knob).

Spark shape: the two arms are independent DataFrame plans — a broadcast
cosine scan over the embedding table and the broadcast term-join BM25
scorer — fused by a join on (qid, docid) and a weighted sum, then one
top-k window. The dense arm scores every (q, d) pair (dense means dense);
the lexical arm is sparse, so the fusion join is a LEFT join from the dense
side with a 0 default, exactly the semantics of the reference's padded gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhr_spark.operators.similarity import _unit
from dhr_spark.operators.topk import topk


def hybrid_score(
    dense_queries: DataFrame,
    corpus_embs: DataFrame,
    lex_qtfs: DataFrame,
    postings: DataFrame,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on: str = "term",
) -> DataFrame:
    """(qid, docid, score): λ·cosine(q, d) + BM25(q, d).

    dense_queries: (qid, embedding); corpus_embs: (vec_id, embedding) with
    vec_id doubling as the lexical docid; lex_qtfs: (qid, term, qtf);
    postings: (term, docid, weight). Both arms are rounded to 6 decimals
    before fusion so ranks are engine-portable."""
    q = F.broadcast(
        dense_queries.select(F.col("qid"), _unit(F.col(vec_col)).alias("uq"))
    )
    c = corpus_embs.select(
        F.col(id_col).alias("docid"), _unit(F.col(vec_col)).alias("uc")
    )
    dot = F.aggregate(
        F.zip_with(F.col("uq"), F.col("uc"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    dense = q.crossJoin(c).select(
        "qid", "docid", F.round(dot, 6).alias("dense_score")
    )
    lex = (
        F.broadcast(lex_qtfs)
        .join(postings, on)
        .groupBy("qid", "docid")
        .agg(F.round(F.sum(F.col("qtf") * F.col("weight")), 6).alias("lex_score"))
    )
    return dense.join(lex, ["qid", "docid"], "left").select(
        "qid",
        "docid",
        (
            F.lit(lam) * F.col("dense_score")
            + F.coalesce(F.col("lex_score"), F.lit(0.0))
        ).alias("score"),
    )


def hybrid_topk(
    dense_queries: DataFrame,
    corpus_embs: DataFrame,
    lex_qtfs: DataFrame,
    postings: DataFrame,
    k: int = 1000,
    lam: float = 0.5,
    **kw,
) -> DataFrame:
    """(qid, docid, rank, score): fused top-k, standard determinism contract."""
    return topk(
        hybrid_score(dense_queries, corpus_embs, lex_qtfs, postings, lam, **kw), k
    )
