"""Query-likelihood with Dirichlet smoothing (Lucene LMDirichletSimilarity).

The reference drives retrieval through Pyserini's ``SimpleSearcher``
(/root/reference/densify/output_vector.py:1), whose public API exposes the
two classic lexical rankers over the same Lucene index: ``set_bm25(k1, b)``
and ``set_qld(mu)``. BM25 is this engine's default scorer; this module is
the QLD twin so a reference user can flip ranking models without rebuilding.

Lucene's LMDirichletSimilarity scores each matching (query term, doc) pair

    w(t, d) = max(0,  log(1 + tf(t,d) / (mu * P(t|C)))  +  log(mu / (dl + mu)))

with P(t|C) = ctf(t) / |C| (collection term frequency over total collection
length) and the per-term clamp to >= 0 that Lucene applies so scores stay
non-negative (org.apache.lucene.search.similarities.LMDirichletSimilarity).
Duplicate query terms contribute qtf times, exactly like Lucene's per-clause
summation — so the final plan is the same broadcast(query) x postings
equi-join + (qid, docid) aggregation the BM25 slow path uses (topk.py).

Scale: the only corpus-wide inputs are ctf per term (one groupBy over the
tf table, reusable from the index dictionary) and the scalar |C|; the
scoring join never shuffles the postings (query side broadcast). Weights
are rounded to 6 decimals before ranking for cross-engine determinism
(same contract as topk.SCORE_DECIMALS).

Index-backed twin: ``Searcher.search_qld`` (operators/wand.py) runs QLD
through the block-max WAND kernel over the SAME stats-free segments — the
QLD weight is also monotone ↑tf ↓dl, so max(0, log(1 + max_tf/(mu·P(t|C)))
+ log(mu/(min_dl + mu))) is an admissible block bound. P(t|C) comes from
the dictionary's ctf column (written at build, additive under append,
subtractive under exact-stats delete); this module is the oracle-checked
slow path the index path is pytest-pinned against (entry
qld_vs_slow_identity counts disagreements; oracle pins 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhr_spark.operators.topk import score_all, topk

DEFAULT_MU = 1000.0  # Lucene / Pyserini set_qld default


def qld_weights(
    tfs: DataFrame,
    dls: DataFrame,
    mu: float = DEFAULT_MU,
) -> DataFrame:
    """(term, docid, weight): per-match LM-Dirichlet weights.

    ``tfs``: (docid, term, tf);  ``dls``: (docid, dl). Collection stats
    (ctf per term, total length) are derived here; callers holding a
    prebuilt dictionary can pass the same frames the BM25 path uses.
    """
    totals = dls.agg(F.sum("dl").alias("cl")).collect()[0]
    coll_len = float(totals["cl"])
    ctf = tfs.groupBy("term").agg(F.sum("tf").alias("ctf"))
    mu_l = F.lit(float(mu))
    raw = (
        F.log(F.lit(1.0) + F.col("tf") / (mu_l * (F.col("ctf") / F.lit(coll_len))))
        + F.log(mu_l / (F.col("dl") + mu_l))
    )
    return (
        tfs.join(dls, "docid")
        .join(F.broadcast(ctf), "term")
        .select(
            "term",
            "docid",
            F.round(F.greatest(raw, F.lit(0.0)), 6).alias("weight"),
        )
        # Lucene never emits zero-weight matches into the score; dropping
        # them keeps the postings sparse (a term occurring in nearly every
        # long doc can clamp to 0) and cannot change any sum.
        .filter(F.col("weight") > 0)
    )


def qld_topk(
    qtfs: DataFrame,
    tfs: DataFrame,
    dls: DataFrame,
    k: int = 1000,
    mu: float = DEFAULT_MU,
) -> DataFrame:
    """(qid, docid, rank, score): QLD top-k — identical plan shape to the
    BM25 slow path, only the per-match weight formula differs."""
    return topk(score_all(qtfs, qld_weights(tfs, dls, mu=mu), on="term"), k)


DEFAULT_JM_LAMBDA = 0.1  # Lucene LMJelinekMercerSimilarity title default


def lmjm_weights(
    tfs: DataFrame,
    dls: DataFrame,
    lam: float = DEFAULT_JM_LAMBDA,
) -> DataFrame:
    """(term, docid, weight): LM Jelinek-Mercer weights (Lucene
    LMJelinekMercerSimilarity) —

        w(t, d) = log(1 + ((1-λ)·tf/dl) / (λ·P(t|C)))

    the linear-interpolation smoothing twin of Dirichlet; always positive
    for tf > 0 so there is no clamp. Same plan/stats as qld_weights."""
    totals = dls.agg(F.sum("dl").alias("cl")).collect()[0]
    coll_len = float(totals["cl"])
    ctf = tfs.groupBy("term").agg(F.sum("tf").alias("ctf"))
    # op order pinned to the WAND kernel's ((jm·tf)/dl)/P so the index path
    # is bit-identical before the 6-decimal round
    jm = F.lit((1.0 - float(lam)) / float(lam))
    raw = F.log(
        F.lit(1.0)
        + jm * F.col("tf") / F.col("dl") / (F.col("ctf") / F.lit(coll_len))
    )
    return (
        tfs.join(dls, "docid")
        .join(F.broadcast(ctf), "term")
        .select("term", "docid", F.round(raw, 6).alias("weight"))
    )


def lmjm_topk(
    qtfs: DataFrame,
    tfs: DataFrame,
    dls: DataFrame,
    k: int = 1000,
    lam: float = DEFAULT_JM_LAMBDA,
) -> DataFrame:
    """(qid, docid, rank, score): Jelinek-Mercer top-k."""
    return topk(score_all(qtfs, lmjm_weights(tfs, dls, lam=lam), on="term"), k)
