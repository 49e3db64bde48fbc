"""Lucene SynonymQuery semantics as DataFrame algebra.

The reference's Lucene backend (Pyserini ``SimpleSearcher``,
/root/reference/densify/output_vector.py:1) scores analyzer-produced
synonyms through ``org.apache.lucene.search.SynonymQuery``: a group of
terms is scored AS IF it were one term —

    tf(group, d)   = Σ member tf            (summed BEFORE saturation)
    docFreq(group) = max member df          (Lucene's blended docFreq)
    w(group, d)    = idf(docFreq) · tf_g / (tf_g + k1(1-b+b·dl/avgdl))

This is NOT the same as an OR of the members (which saturates each term
separately and sums the weights) — a doc mentioning every member of a
group is not over-rewarded. The classic use is query-time synonym
expansion ("nyc" ≡ "new york city") from an analyzer synonym filter.

Dataflow: one broadcast join of the (term, syn) membership table against
the tf relation, re-aggregation at (docid, group), df blended by a max
over the per-term dictionary — all codegen column math; the scoring join
is the BM25 slow-path plan (broadcast query × postings, operators/topk).
At 100 TB the membership table is dictionary-sized (broadcast), and the
(docid, group) re-aggregation is map-side combinable: group keys are a
projection of term keys, so no extra shuffle beyond the TF table's own.

Query side: each query term is rewritten to its group (terms outside any
group form singleton groups of themselves); duplicate clauses merge with
qtf summed, matching a Lucene BooleanQuery holding one SynonymQuery per
group with per-clause boost = occurrence count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark import B, K1
from dhr_spark.functions.bm25 import bm25_weight_col, idf_col
from dhr_spark.operators.topk import score_all, topk


def synonym_groups_df(
    spark: SparkSession, groups: list[list[str]]
) -> DataFrame:
    """(term, syn) membership rows from explicit synonym sets. The group
    label is the lexicographically-least member (deterministic across
    engines). Overlapping sets raise — Lucene synonym graphs are flat."""
    rows: list[tuple[str, str]] = []
    seen: set[str] = set()
    for g in groups:
        if len(g) < 2:
            raise ValueError(f"synonym set needs >= 2 terms, got {g!r}")
        label = min(g)
        for t in g:
            if t in seen:
                raise ValueError(f"term {t!r} appears in two synonym sets")
            seen.add(t)
            rows.append((t, label))
    return spark.createDataFrame(rows, "term string, syn string")


def _with_groups(df: DataFrame, groups: DataFrame, term_col: str) -> DataFrame:
    """Rewrite ``term_col`` to its synonym group (identity for non-members)."""
    g = groups.select(
        F.col("term").alias("_syn_term"), F.col("syn").alias("_syn_grp")
    )
    return (
        df.join(F.broadcast(g), df[term_col] == g["_syn_term"], "left")
        .withColumn(term_col, F.coalesce("_syn_grp", term_col))
        .drop("_syn_term", "_syn_grp")
    )


def synonym_weights(
    tfs: DataFrame,
    dls: DataFrame,
    groups: DataFrame,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(term, docid, weight): BM25 weights over synonym-merged pseudo-terms.

    ``tfs``: (docid, term, tf); ``dls``: (docid, dl); ``groups``:
    (term, syn) membership. tf sums within (docid, group) BEFORE the BM25
    saturation; the group's docFreq is the max of its members' df (Lucene
    SynonymQuery's blended statistic — an upper-bound approximation of the
    union df that never needs a distinct-doc count)."""
    row = dls.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"])
    tf_g = (
        _with_groups(tfs, groups, "term")
        .groupBy("docid", "term")
        .agg(F.sum("tf").alias("tf"))
    )
    df_term = tfs.groupBy("term").agg(F.count("*").alias("df"))
    df_g = (
        _with_groups(df_term, groups, "term")
        .groupBy("term")
        .agg(F.max("df").alias("df"))
        .withColumn("idf", idf_col(F.col("df"), n_docs))
    )
    return (
        tf_g.join(dls, "docid")
        .join(F.broadcast(df_g.select("term", "idf")), "term")
        .select(
            "term",
            "docid",
            F.round(
                bm25_weight_col(
                    F.col("tf"), F.col("dl"), F.col("idf"),
                    F.lit(avgdl), k1, b,
                ),
                6,
            ).alias("weight"),
        )
    )


def synonym_topk(
    qtfs: DataFrame,
    tfs: DataFrame,
    dls: DataFrame,
    groups: DataFrame,
    k: int = 1000,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(qid, docid, rank, score): BM25 top-k where each query term scores
    its synonym group as one Lucene SynonymQuery clause. Query terms merge
    into group clauses with qtf summed."""
    q_g = (
        _with_groups(qtfs, groups, "term")
        .groupBy("qid", "term")
        .agg(F.sum("qtf").alias("qtf"))
    )
    return topk(
        score_all(q_g, synonym_weights(tfs, dls, groups, k1=k1, b=b), on="term"),
        k,
    )
