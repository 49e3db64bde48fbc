"""ColBERT MaxSim dataflow shape (SURVEY J7) — per-query-token max over doc
tokens, summed.

The reference scores late-interaction models with
``einsum('aik,bjk->abij').max(-1).sum(-1)``
(/root/reference/tevatron/ColBERT/modeling.py:214-219): for every query
token, take the best-matching doc token's similarity, then sum the per-token
maxima. The neural kernel needs token embeddings (out of lexical scope); the
DATAFLOW is what matters at scale and is reproduced here exactly:

    token-pair join -> groupBy(qid, docid, q-token) max -> groupBy(qid,
    docid) sum -> top-k

with a lexical pair kernel: a (query-token, doc-term) pair scores the doc
term's BM25 weight when the tokens share a match key. The default key is the
4-char prefix (a stem-ish soft gate), so one query token genuinely competes
across several doc terms and the max is load-bearing — with an exact-match
key the shape degenerates to the plain BM25 dot product.

Scale shape: the pair join explodes |q_tokens| x |matching doc terms| rows,
but the two-level aggregation contracts them with map-side partial max/sum —
the full interaction matrix (the reference's ``abij`` tensor, batch x batch x
q_len x d_len in GPU RAM) is never materialized. The query side broadcasts;
the postings side never shuffles before the first partial agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhr_spark.operators.topk import topk


def maxsim_score(
    qtokens: DataFrame,
    postings: DataFrame,
    key_len: int = 4,
) -> DataFrame:
    """(qid, docid, score): MaxSim over a token-pair join.

    qtokens:  (qid, qpos, term) — one row per query-token OCCURRENCE
              (positions keep duplicate query tokens distinct, as ColBERT's
              per-position vectors do).
    postings: (term, docid, weight) — BM25 doc-term weights.
    """
    qk = F.broadcast(
        qtokens.select(
            "qid", "qpos", F.substring("term", 1, key_len).alias("mkey")
        )
    )
    dk = postings.select(
        "docid",
        F.substring("term", 1, key_len).alias("mkey"),
        F.round(F.col("weight"), 6).alias("w"),
    )
    per_qtoken = (
        qk.join(dk, "mkey")
        .groupBy("qid", "docid", "qpos")
        .agg(F.max("w").alias("best"))
    )
    return per_qtoken.groupBy("qid", "docid").agg(F.sum("best").alias("score"))


def maxsim_topk(
    qtokens: DataFrame, postings: DataFrame, k: int = 1000, key_len: int = 4
) -> DataFrame:
    """(qid, docid, rank, score): MaxSim top-k with the engine's standard
    determinism contract (round(score, 6) DESC, docid ASC)."""
    return topk(maxsim_score(qtokens, postings, key_len), k)
