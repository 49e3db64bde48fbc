"""DFR InL2 + information-based SPL similarities (slow DataFrame paths).

The reference retrieves through Pyserini/Anserini searchers
(/root/reference/densify/output_vector.py:1), and Anserini's similarity
surface extends past BM25/QLD/JM/axiomatic to the divergence-from-randomness
and information-based families (SearchCollection ``-inl2`` / ``-spl``).
These are the published formulas (Amati & van Rijsbergen TOIS 2002;
Clinchant & Gaussier SIGIR 2010), both built on the same "normalization 2"
length-normalized term frequency:

    tfn = tf · log2(1 + c · avgdl / dl)                    (c > 0)

InL2 — inverse document frequency model with Laplace after-effect:

    w(t, d) = log2((N + 1) / (df + 0.5)) · tfn / (tfn + 1)

SPL — smoothed power law, λ_t = ctf(t) / N (mean per-doc frequency):

    x = tfn / (tfn + 1)
    w(t, d) = −log2((λ^x − λ) / (1 − λ))                   (0 < λ < 1)

SPL's domain needs λ < 1; a term with λ = ctf/N ≥ SPL_LAMBDA_LIMIT (head
stopwords appear in more collection occurrences than there are documents)
scores with the formula's analytic λ→1 limit instead:

    w(t, d) = log2(tfn + 1)                                (λ ≥ 1 − 1e−6)

A λ-clamp would be the obvious alternative, but λ^x − λ at λ ≈ 1 is a
catastrophic cancellation (the difference is ~(1−x)·(1−λ), so one ulp of
pow() noise becomes ~1e−9 of weight noise — far beyond the 6-decimal
score contract, and it flips round-6 boundaries across engines). The
limit branch is a single well-conditioned log2; the branch predicate
compares the identically-computed double ctf/N, so every engine (numpy
kernel, JVM column math, DuckDB oracle) takes the same branch.

Both weights are monotone ↑tf ↓dl (tfn rises with tf, falls with dl; both
outer shapes rise with tfn), so the stats-free (max_tf, min_dl) block bound
of the WAND kernel stays admissible — ``Searcher.search_inl2`` /
``search_spl`` (operators/wand.py) run the same formulas index-backed, and
the ``inl2_vs_slow_identity`` / ``spl_vs_slow_identity`` entries pin the
two paths against each other. Both weights are strictly positive for
tf > 0. Weights round to 6 decimals (topk.SCORE_DECIMALS contract).

Plan shape: identical to the BM25/QLD/axiomatic slow paths — two tiny
corpus aggregates, one broadcast(term stats) join into the postings, then
broadcast(query) × postings equi-join + (qid, docid) aggregation. Nothing
here shuffles the postings relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhr_spark.operators.topk import score_all, topk

DEFAULT_C = 0.1  # tfn normalization-2 hyperparameter (Anserini's default)

SPL_LAMBDA_LIMIT = 1.0 - 1e-6  # λ >= this scores the λ→1 limit (module doc)


def _tfn(c: float, avgdl: float):
    """Normalization-2 length-normalized tf as a Column expression; op
    order pinned to the WAND kernel's tf · log2(1 + c·avgdl/dl)."""
    return F.col("tf") * F.log2(
        F.lit(1.0) + F.lit(float(c)) * F.lit(float(avgdl)) / F.col("dl")
    )


def inl2_weights(
    tfs: DataFrame,
    dls: DataFrame,
    c: float = DEFAULT_C,
) -> DataFrame:
    """(term, docid, weight): per-match DFR InL2 weights.

    ``tfs``: (docid, term, tf);  ``dls``: (docid, dl). N, avgdl and df are
    derived here (same two tiny aggregates every lexical slow path pays);
    index-backed scoring reads them from the dictionary instead."""
    if c <= 0:
        raise ValueError(f"c must be > 0, got {c}")
    row = dls.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"])
    df_stats = tfs.groupBy("term").agg(F.count("*").alias("df"))
    tfn = _tfn(c, avgdl)
    w = (
        F.log2(F.lit(float(n_docs + 1)) / (F.col("df") + F.lit(0.5)))
        * tfn
        / (tfn + F.lit(1.0))
    )
    return (
        tfs.join(dls, "docid")
        .join(F.broadcast(df_stats), "term")
        .select("term", "docid", F.round(w, 6).alias("weight"))
    )


def inl2_topk(
    qtfs: DataFrame,
    tfs: DataFrame,
    dls: DataFrame,
    k: int = 1000,
    c: float = DEFAULT_C,
) -> DataFrame:
    """(qid, docid, rank, score): InL2 top-k — the BM25 slow-path plan with
    the DFR weight formula. Duplicate query terms contribute qtf times
    (Anserini's per-clause summation)."""
    return topk(score_all(qtfs, inl2_weights(tfs, dls, c=c), on="term"), k)


def spl_weights(
    tfs: DataFrame,
    dls: DataFrame,
    c: float = DEFAULT_C,
) -> DataFrame:
    """(term, docid, weight): per-match information-based SPL weights.

    λ_t = ctf(t)/N — the per-term stat is a collection frequency like
    QLD's P(t|C), but per-document (÷N, not ÷total_dl); λ ≥
    SPL_LAMBDA_LIMIT takes the analytic limit branch (module doc)."""
    if c <= 0:
        raise ValueError(f"c must be > 0, got {c}")
    row = dls.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"])
    ctf_stats = tfs.groupBy("term").agg(F.sum("tf").alias("ctf"))
    lam = F.col("ctf") / F.lit(float(n_docs))
    tfn = _tfn(c, avgdl)
    x = tfn / (tfn + F.lit(1.0))
    w = F.when(
        lam >= F.lit(SPL_LAMBDA_LIMIT), F.log2(tfn + F.lit(1.0))
    ).otherwise(
        -F.log2((F.pow(lam, x) - lam) / (F.lit(1.0) - lam))
    )
    return (
        tfs.join(dls, "docid")
        .join(F.broadcast(ctf_stats), "term")
        .select("term", "docid", F.round(w, 6).alias("weight"))
    )


def spl_topk(
    qtfs: DataFrame,
    tfs: DataFrame,
    dls: DataFrame,
    k: int = 1000,
    c: float = DEFAULT_C,
) -> DataFrame:
    """(qid, docid, rank, score): SPL top-k — same plan, information-based
    weight. Every weight is > 0 (λ^x > λ for x < 1; log2(tfn+1) > 0 on the
    limit branch), so no clamp/filter."""
    return topk(score_all(qtfs, spl_weights(tfs, dls, c=c), on="term"), k)


# 2π as ONE shared double literal: the numpy kernel, the Column path and the
# DuckDB oracle must multiply by the identical constant or round-6
# boundaries drift across engines
TWO_PI = 6.283185307179586


def dph_weights(tfs: DataFrame, dls: DataFrame) -> DataFrame:
    """(term, docid, weight): per-match DFR DPH weights (Amati's
    hypergeometric model with Popper normalization — Terrier's
    parameter-free default similarity):

        f    = tf / dl
        norm = (1 − f)² / (tf + 1)
        w    = norm · (tf·log2((tf·avgdl/dl) / λ) + 0.5·log2(2π·tf·(1−f)))

    with λ = ctf/N (the SPL collection stat, same dictionary column).

    Two defined edge semantics:
    * tf == dl (a one-term document): the raw formula is 0·(−∞); the
      (1 − f)² → 0 quadratic limit dominates the logarithmic pole, so the
      weight is its analytic limit 0 — emitted as an explicit branch in
      every engine (numpy would produce NaN, DuckDB too).
    * common terms (λ high enough that the inner log goes negative) can
      take the raw formula negative; weights CLAMP at 0 exactly like the
      repo's QLD (Lucene LMDirichletSimilarity precedent) — a negative
      information contribution is a non-match. This is also what makes
      block-max pruning sound: WAND's theta bootstrap (k-th best
      single-term score as a lower bound on the final k-th score) is
      invalid under negative contributions.

    DPH is NOT monotone ↑tf at fixed dl (norm falls as f → 1), so the
    point evaluation w(max_tf, min_dl) is NOT an admissible block bound.
    The kernel uses the factored bound

        max(0, log2((max_tf·avgdl/min_dl)/λ)) + 0.5·max(0, Bmax),
        Bmax = 0.5·log2(2π·max_tf)

    admissible because w ≤ max(0, norm·A) + max(0, norm·B) with
    norm·A ≤ (tf/(tf+1))·Lmax ≤ Lmax (L is monotone ↑tf ↓dl) and
    norm·B ≤ B/(tf+1) ≤ Bmax/2 (tf+1 ≥ 2, (1−f) < 1). Looser than a
    monotone sim's bound — less pruning, never a wrong result."""
    row = dls.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"])
    ctf_stats = tfs.groupBy("term").agg(F.sum("tf").alias("ctf"))
    lam = F.col("ctf") / F.lit(float(n_docs))
    f = F.col("tf") / F.col("dl")
    om = F.lit(1.0) - f
    norm = om * om / (F.col("tf") + F.lit(1))
    a = F.col("tf") * F.log2(
        F.col("tf") * F.lit(avgdl) / F.col("dl") / lam
    )
    bb = F.lit(0.5) * F.log2(F.lit(TWO_PI) * F.col("tf") * om)
    w = F.when(F.col("tf") >= F.col("dl"), F.lit(0.0)).otherwise(
        F.round(F.greatest(norm * (a + bb), F.lit(0.0)), 6)
    )
    return (
        tfs.join(dls, "docid")
        .join(F.broadcast(ctf_stats), "term")
        .select("term", "docid", w.alias("weight"))
        .filter(F.col("weight") > 0)
    )


def dph_topk(
    qtfs: DataFrame,
    tfs: DataFrame,
    dls: DataFrame,
    k: int = 1000,
) -> DataFrame:
    """(qid, docid, rank, score): DPH top-k — parameter-free (no c/mu/s
    knob anywhere); zero-clamped matches are non-matches (QLD contract)."""
    return topk(score_all(qtfs, dph_weights(tfs, dls), on="term"), k)
