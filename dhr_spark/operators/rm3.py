"""RM3 pseudo-relevance-feedback query expansion (Anserini-style).

The reference's retrieval harness is built on Anserini, whose flagship
lexical ranker is BM25+RM3 (`Rm3Reranker` — public Anserini/pyserini
algorithm; dhr's own runs use the plain BM25 path, SURVEY.md §3.2). RM3 is
the classic relevance-model expansion:

  1. first pass: BM25 top-``fb_docs`` per query,
  2. RM1 relevance model over feedback docs:
         rm1(q, t) ∝ Σ_d  P(t|d) · score(q, d),   P(t|d) = tf(t,d) / |d|
     keep the top ``fb_terms`` terms per query (weight DESC, term ASC),
     L1-normalize,
  3. interpolate with the L1-normalized original query model:
         w(q, t) = β · P(t|q)  +  (1-β) · rm1(q, t)
     (β = ``orig_weight``, Anserini default 0.5),
  4. second pass: score with the weighted expanded query
         score(q, d) = Σ_t w(q, t) · bm25_weight(t, d).

Everything is deterministic DataFrame algebra: the feedback set is tiny
(|Q| · fb_docs rows), so the expansion joins broadcast; the second pass is
the same broadcast-query × streamed-postings plan as the first. Weights are
rounded to 6 decimals before the top-``fb_terms`` cut and before scoring so
ties and value hashes agree bit-for-bit across engines (DuckDB oracle in
``__spark_entry__``).

Scale: only the second-pass scoring touches the corpus; the expanded query
table is ≤ |Q| · (fb_terms + |q|) rows. No new shuffle beyond the scoring
aggregation the plain BM25 path already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dhr_spark.operators.topk import score_all, topk

W_DECIMALS = 6


def rm3_expand(
    qtfs: DataFrame,
    first_pass: DataFrame,
    doc_tfs: DataFrame,
    doc_lens: DataFrame,
    fb_docs: int = 5,
    fb_terms: int = 10,
    orig_weight: float = 0.5,
) -> DataFrame:
    """(qid, term, weight): RM3-expanded weighted query model.

    ``first_pass``: (qid, docid, rank, score) from a BM25 pass (rank 1-based).
    ``doc_tfs``:    (docid, term, tf);  ``doc_lens``: (docid, dl).
    """
    fb = first_pass.filter(F.col("rank") <= fb_docs).select(
        "qid", "docid", "score"
    )
    # RM1: sum over feedback docs of P(t|d) * doc score, L1-normalized after
    # the top-fb_terms cut (weight DESC, term ASC — Anserini tie order).
    ptd = fb.join(doc_tfs, "docid").join(doc_lens, "docid").select(
        "qid",
        "term",
        (F.col("tf") / F.col("dl") * F.col("score")).alias("contrib"),
    )
    # integer-micros representation: per-(qid,term) sums are rounded to 6
    # decimals then scaled to int64, so the per-query normalizing sums are
    # EXACT integer arithmetic — order-independent, hence bit-identical in
    # Spark and the DuckDB oracle (float sums are order-dependent in the
    # last ulp; a 1e-6 round kills that noise, integers remove it entirely).
    rm1 = ptd.groupBy("qid", "term").agg(
        F.round(F.round(F.sum("contrib"), W_DECIMALS) * 1e6)
        .cast("long")
        .alias("rm1_i")
    )
    w_cut = Window.partitionBy("qid").orderBy(
        F.col("rm1_i").desc(), F.col("term").asc()
    )
    rm1_top = (
        rm1.withColumn("_r", F.row_number().over(w_cut))
        .filter((F.col("_r") <= fb_terms) & (F.col("rm1_i") > 0))
        .drop("_r")
    )
    rm1_norm = rm1_top.withColumn(
        "rm1",
        F.col("rm1_i") / F.sum("rm1_i").over(Window.partitionBy("qid")),
    ).select("qid", "term", "rm1")

    qmodel = qtfs.withColumn(
        "pq", F.col("qtf") / F.sum("qtf").over(Window.partitionBy("qid"))
    ).select("qid", "term", "pq")

    beta = F.lit(float(orig_weight))
    return (
        qmodel.join(rm1_norm, ["qid", "term"], "full_outer")
        .select(
            "qid",
            "term",
            F.round(
                beta * F.coalesce(F.col("pq"), F.lit(0.0))
                + (F.lit(1.0) - beta) * F.coalesce(F.col("rm1"), F.lit(0.0)),
                W_DECIMALS,
            ).alias("weight"),
        )
        .filter(F.col("weight") > 0)
    )


def rm3_topk(
    expanded: DataFrame, postings: DataFrame, k: int = 1000, on: str = "term"
) -> DataFrame:
    """Second pass: expanded (qid, term, weight) against (term, docid,
    weight) postings — identical plan to the plain BM25 slow path."""
    q = expanded.select("qid", "term", F.col("weight").alias("qtf"))
    return topk(score_all(q, postings, on=on), k)
