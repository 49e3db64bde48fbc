"""Axiomatic F2EXP similarity (Fang & Zhai, SIGIR 2005).

The reference retrieves through Pyserini/Anserini searchers
(/root/reference/densify/output_vector.py:1), and Anserini ships the
axiomatic similarity family alongside BM25/QLD (class AxiomaticF2EXP,
``-axiom.f2exp`` in SearchCollection). F2EXP is derived from retrieval
constraints rather than a probabilistic model:

    w(t, d) = ((N + 1) / df(t))^kexp  ·  tf / (tf + s + s·dl/avgdl)

with s = 0.5 and kexp = 0.35 (Anserini defaults, from the paper's "An
Exploration of Axiomatic Approaches to Information Retrieval"). The tf
saturation term is BM25's with k1 folded to the pivoted-length constant s;
the idf term is a power law instead of a log.

Plan shape: identical to the BM25/QLD slow paths — per-match weights from
one broadcast(df stats) join, then broadcast(query) × postings equi-join +
(qid, docid) aggregation (operators/topk.py). Nothing here shuffles the
postings. Weights round to 6 decimals (topk.SCORE_DECIMALS contract).

Index-backed twin: ``Searcher.search_f2exp`` (operators/wand.py) runs the
same formula through block-max WAND over the stats-free segments — the
weight is monotone ↑tf ↓dl like BM25/QLD/LMJM, so the (max_tf, min_dl)
block bound stays admissible; the per-term stat ((N+1)/df)^kexp rides in on
the query side from the dictionary's df column. Entry
``f2exp_vs_slow_identity`` pins the two paths against each other; entry
``f2exp_topk`` oracles this module against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhr_spark.operators.topk import score_all, topk

DEFAULT_S = 0.5  # Anserini AxiomaticF2EXP s default
DEFAULT_KEXP = 0.35  # idf power-law exponent default


def f2exp_weights(
    tfs: DataFrame,
    dls: DataFrame,
    s: float = DEFAULT_S,
    kexp: float = DEFAULT_KEXP,
) -> DataFrame:
    """(term, docid, weight): per-match axiomatic F2EXP weights.

    ``tfs``: (docid, term, tf);  ``dls``: (docid, dl). N, avgdl and df are
    derived here (same two tiny aggregates every lexical slow path pays);
    index-backed scoring reads them from the dictionary instead.
    """
    if s <= 0:
        raise ValueError(f"s must be > 0, got {s}")
    if kexp <= 0:
        raise ValueError(f"kexp must be > 0, got {kexp}")
    row = dls.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"])
    df_stats = tfs.groupBy("term").agg(F.count("*").alias("df"))
    s_l = F.lit(float(s))
    # op order pinned to the WAND kernel's stat·tf/(tf + s + s·dl/avgdl)
    # so the index path is bit-identical before the 6-decimal round
    w = (
        F.pow(F.lit(float(n_docs + 1)) / F.col("df"), F.lit(float(kexp)))
        * F.col("tf")
        / (F.col("tf") + s_l + s_l * F.col("dl") / F.lit(avgdl))
    )
    return (
        tfs.join(dls, "docid")
        .join(F.broadcast(df_stats), "term")
        .select("term", "docid", F.round(w, 6).alias("weight"))
    )


def f2exp_topk(
    qtfs: DataFrame,
    tfs: DataFrame,
    dls: DataFrame,
    k: int = 1000,
    s: float = DEFAULT_S,
    kexp: float = DEFAULT_KEXP,
) -> DataFrame:
    """(qid, docid, rank, score): F2EXP top-k — the BM25 slow-path plan with
    the axiomatic weight formula. Duplicate query terms contribute qtf
    times (Anserini's per-clause summation)."""
    return topk(
        score_all(qtfs, f2exp_weights(tfs, dls, s=s, kexp=kexp), on="term"), k
    )


def f2log_weights(
    tfs: DataFrame,
    dls: DataFrame,
    s: float = DEFAULT_S,
) -> DataFrame:
    """(term, docid, weight): per-match axiomatic F2LOG weights (Anserini
    AxiomaticF2LOG) — F2EXP's sibling with a log idf instead of the power
    law:

        w(t, d) = ln((N + 1) / df(t)) · tf / (tf + s + s·dl/avgdl)

    Same plan shape and 6-decimal rounding contract as f2exp_weights."""
    if s <= 0:
        raise ValueError(f"s must be > 0, got {s}")
    row = dls.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"])
    df_stats = tfs.groupBy("term").agg(F.count("*").alias("df"))
    s_l = F.lit(float(s))
    # op order pinned to the WAND kernel's stat·tf/(tf + s + s·dl/avgdl)
    w = (
        F.log(F.lit(float(n_docs + 1)) / F.col("df"))
        * F.col("tf")
        / (F.col("tf") + s_l + s_l * F.col("dl") / F.lit(avgdl))
    )
    return (
        tfs.join(dls, "docid")
        .join(F.broadcast(df_stats), "term")
        .select("term", "docid", F.round(w, 6).alias("weight"))
    )


def f2log_topk(
    qtfs: DataFrame,
    tfs: DataFrame,
    dls: DataFrame,
    k: int = 1000,
    s: float = DEFAULT_S,
) -> DataFrame:
    """(qid, docid, rank, score): F2LOG top-k — F2EXP's plan with the log
    idf. NOTE: a term with df = N+1 is impossible and df = N gives a small
    positive weight, so F2LOG weights are always > 0 like F2EXP's."""
    return topk(score_all(qtfs, f2log_weights(tfs, dls, s=s), on="term"), k)
