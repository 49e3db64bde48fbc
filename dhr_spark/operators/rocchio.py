"""Rocchio pseudo-relevance feedback (Pyserini ``set_rocchio`` analogue).

The reference's searcher class (pyserini.search.SimpleSearcher,
/root/reference/densify/output_vector.py:1) publicly exposes Rocchio PRF
alongside RM3 as the second feedback ranker over the same Lucene index.
This is the classic Rocchio vector update (public algorithm):

    w(q, t) = alpha * P(t|q)
            + beta  * mean_{d in FB+} P(t|d)
            - gamma * mean_{d in FB-} P(t|d)

with P(t|q) the L1-normalized analyzed query model, P(t|d) = tf(t,d)/|d|,
FB+ the top ``fb_docs`` of a first BM25 pass and FB- the bottom
``bottom_docs`` of the same ranked list (Anserini's use_negative mode;
gamma=0 disables it, the Anserini default). The positive centroid is cut
to the top ``fb_terms`` terms (weight DESC, term ASC) before interpolation,
mirroring rm3.rm3_expand's cut, and terms whose final weight clamps to
<= 0 are dropped (Rocchio never scores with negative weights in Anserini).

Determinism: per-(qid, term) centroid sums use the same integer-micros
representation as rm3.py — round to 6 decimals, scale to int64 — so the
normalizing sums are exact integer arithmetic and bit-identical between
Spark and the DuckDB oracle regardless of partitioning/order.

Scale: identical to RM3 — the feedback set is |Q| * fb_docs rows, every
expansion join broadcasts, and only the second scoring pass touches the
corpus (same broadcast-query x streamed-postings plan as plain BM25).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dhr_spark.operators.topk import score_all, topk

W_DECIMALS = 6


def _centroid_i(
    fb: DataFrame, doc_tfs: DataFrame, doc_lens: DataFrame, n_fb_col: str
) -> DataFrame:
    """(qid, term, cent_i): integer-micros mean of P(t|d) over ``fb`` docs.

    ``fb`` carries (qid, docid, n_fb) where n_fb is that query's feedback-doc
    count (<= fb_docs when the first pass returned fewer)."""
    ptd = fb.join(doc_tfs, "docid").join(doc_lens, "docid").select(
        "qid",
        "term",
        (F.col("tf") / F.col("dl") / F.col(n_fb_col)).alias("contrib"),
    )
    return ptd.groupBy("qid", "term").agg(
        F.round(F.round(F.sum("contrib"), W_DECIMALS) * 1e6)
        .cast("long")
        .alias("cent_i")
    )


def rocchio_expand(
    qtfs: DataFrame,
    first_pass: DataFrame,
    doc_tfs: DataFrame,
    doc_lens: DataFrame,
    fb_docs: int = 10,
    fb_terms: int = 10,
    alpha: float = 1.0,
    beta: float = 0.75,
    gamma: float = 0.0,
    bottom_docs: int = 10,
) -> DataFrame:
    """(qid, term, weight): Rocchio-updated weighted query model.

    ``first_pass``: (qid, docid, rank, score) from a BM25 pass (rank 1-based).
    ``doc_tfs``:    (docid, term, tf);  ``doc_lens``: (docid, dl).
    """
    ranked = first_pass.select("qid", "docid", "rank")
    pos = ranked.filter(F.col("rank") <= fb_docs)
    n_pos = pos.groupBy("qid").agg(F.count("*").alias("n_fb"))
    pos_fb = pos.join(n_pos, "qid").select("qid", "docid", "n_fb")
    cent_pos = _centroid_i(pos_fb, doc_tfs, doc_lens, "n_fb")

    # top-fb_terms cut on the positive centroid (weight DESC, term ASC),
    # then L1-normalize in exact integer arithmetic.
    w_cut = Window.partitionBy("qid").orderBy(
        F.col("cent_i").desc(), F.col("term").asc()
    )
    cent_top = (
        cent_pos.withColumn("_r", F.row_number().over(w_cut))
        .filter((F.col("_r") <= fb_terms) & (F.col("cent_i") > 0))
        .drop("_r")
    )
    cent_norm = cent_top.withColumn(
        "cpos",
        F.col("cent_i") / F.sum("cent_i").over(Window.partitionBy("qid")),
    ).select("qid", "term", "cpos")

    qmodel = qtfs.withColumn(
        "pq", F.col("qtf") / F.sum("qtf").over(Window.partitionBy("qid"))
    ).select("qid", "term", "pq")

    a, b, g = F.lit(float(alpha)), F.lit(float(beta)), F.lit(float(gamma))
    combined = qmodel.join(cent_norm, ["qid", "term"], "full_outer").select(
        "qid",
        "term",
        (
            a * F.coalesce(F.col("pq"), F.lit(0.0))
            + b * F.coalesce(F.col("cpos"), F.lit(0.0))
        ).alias("w_pos"),
    )

    if gamma > 0.0:
        # FB-: bottom ``bottom_docs`` of each query's ranked list. The
        # negative centroid is NOT term-cut (Anserini subtracts the full
        # bottom centroid) but is L1-normalized the same exact-integer way.
        w_max = ranked.groupBy("qid").agg(F.max("rank").alias("max_rank"))
        neg = ranked.join(w_max, "qid").filter(
            F.col("rank") > F.col("max_rank") - bottom_docs
        )
        n_neg = neg.groupBy("qid").agg(F.count("*").alias("n_neg"))
        neg_fb = neg.join(n_neg, "qid").select("qid", "docid", "n_neg")
        cent_neg = _centroid_i(neg_fb, doc_tfs, doc_lens, "n_neg")
        neg_norm = cent_neg.filter(F.col("cent_i") > 0).withColumn(
            "cneg",
            F.col("cent_i") / F.sum("cent_i").over(Window.partitionBy("qid")),
        ).select("qid", "term", "cneg")
        combined = combined.join(neg_norm, ["qid", "term"], "full_outer").select(
            "qid",
            "term",
            (
                F.coalesce(F.col("w_pos"), F.lit(0.0))
                - g * F.coalesce(F.col("cneg"), F.lit(0.0))
            ).alias("w_pos"),
        )

    return combined.select(
        "qid", "term", F.round(F.col("w_pos"), W_DECIMALS).alias("weight")
    ).filter(F.col("weight") > 0)


def rocchio_topk(
    expanded: DataFrame, postings: DataFrame, k: int = 1000, on: str = "term"
) -> DataFrame:
    """Second pass: identical plan to rm3.rm3_topk / the BM25 slow path."""
    q = expanded.select("qid", "term", F.col("weight").alias("qtf"))
    return topk(score_all(q, postings, on=on), k)
