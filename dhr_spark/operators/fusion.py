"""Run fusion — Reciprocal Rank Fusion + score interpolation.

The reference is a hybrid retriever: it fuses its lexical and semantic
arms by weighted score sum inside one model
(/root/reference/tevatron/DHR/modeling.py:169 ``scores = lexical_scores +
self.lamb * semantic_scores``; served twin: operators/hybrid.py). Its
ecosystem fuses at the RUN level too — Pyserini's fusion module ships
reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) and
score interpolation for combining sparse and dense runs. These are those
two operators over (qid, docid, rank, score) run frames.

RRF:  score(d) = Σ_runs 1 / (k_rrf + rank_run(d)),  k_rrf = 60

Exactness contract: each reciprocal contributes as the exact integer
round(1e6/(k_rrf + rank)) and the fused score is ONE final /1e6 — the sum
is order-independent integer arithmetic, so the fused ranking hashes
identically across engines (repo-wide integer-micros lesson). The only
half-way reciprocals in range (k_rrf + rank ∈ {128, 640} ⇒ …2.5 micros)
round half-away-from-zero in Spark (HALF_UP) and DuckDB (C round) alike.

Interpolation:  score(d) = α·score_A(d) + (1−α)·score_B(d), missing
side = 0 (full outer join — Pyserini's ``interpolation`` with default
fill). Raw scores must be comparable; normalize upstream if not.

Scale shape: both are |Q|·k-row unions + one groupBy — the runs are tiny
relative to the corpus, so fusion never touches postings or embeddings.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60  # Cormack et al. 2009 default; Pyserini --rrf.k default


def rrf_fuse(
    runs: list[DataFrame], k_rrf: int = RRF_K, k: int = 1000
) -> DataFrame:
    """(qid, docid, rank, score): reciprocal-rank fusion of ≥ 2 runs.

    Ties in the fused integer score break on docid ascending (the repo's
    universal tie order). A doc absent from a run simply contributes
    nothing for it (standard RRF)."""
    if len(runs) < 2:
        raise ValueError(f"rrf_fuse needs >= 2 runs, got {len(runs)}")
    if k_rrf <= 0:
        raise ValueError(f"k_rrf must be > 0, got {k_rrf}")
    contribs = [
        r.select(
            "qid",
            "docid",
            F.round(F.lit(1e6) / (F.lit(k_rrf) + F.col("rank")))
            .cast("long")
            .alias("c"),
        )
        for r in runs
    ]
    u = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = u.groupBy("qid", "docid").agg(F.sum("c").alias("t"))
    w = Window.partitionBy("qid").orderBy(
        F.col("t").desc(), F.col("docid").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            "docid",
            F.col("rank").cast("int").alias("rank"),
            (F.col("t").cast("double") / F.lit(1e6)).alias("score"),
        )
    )


def interpolate_fuse(
    run_a: DataFrame,
    run_b: DataFrame,
    alpha: float = 0.5,
    k: int = 1000,
) -> DataFrame:
    """(qid, docid, rank, score): α·A + (1−α)·B score interpolation with
    0-fill for docs one run missed. Scores round to 6 decimals before
    ranking (topk.SCORE_DECIMALS contract); ties break docid-ascending."""
    if not (0.0 <= alpha <= 1.0):
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    a = run_a.select("qid", "docid", F.col("score").alias("sa"))
    b = run_b.select("qid", "docid", F.col("score").alias("sb"))
    al = F.lit(float(alpha))
    fused = a.join(b, ["qid", "docid"], "full_outer").select(
        "qid",
        "docid",
        F.round(
            al * F.coalesce(F.col("sa"), F.lit(0.0))
            + (F.lit(1.0) - al) * F.coalesce(F.col("sb"), F.lit(0.0)),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", F.col("rank").cast("int").alias("rank"), "score")
    )


def combsum_fuse(
    runs: list[DataFrame], k: int = 1000, mnz: bool = False
) -> DataFrame:
    """(qid, docid, rank, score): CombSUM / CombMNZ fusion (Fox & Shaw,
    TREC-2) with per-(run, qid) min-max score normalization — the classic
    score-based fusion baselines alongside rank-based RRF. ``mnz=True``
    multiplies the normalized sum by the number of runs that retrieved the
    doc (CombMNZ's hit-count reward).

    Exactness contract: scores lift to integer micros, the min-max
    normalization is computed as PURE integer arithmetic — round-half-up
    via ``(2·(s−mn)·1e6 + d) div (2·d)`` with ``d = mx−mn`` — and fused
    totals stay integers until ONE final /1e6, so the fused ranking (which
    orders by the integer total, never a float) hashes identically across
    engines. A run whose scores are all equal for a qid carries no ranking
    signal; every its doc normalizes to 1.0 (it *is* the max), keeping MNZ
    counts meaningful.

    Scale shape: identical to rrf_fuse — |Q|·k-row unions, per-qid window
    for min/max, one groupBy; never touches postings."""
    if len(runs) < 2:
        raise ValueError(f"combsum_fuse needs >= 2 runs, got {len(runs)}")
    wq = Window.partitionBy("qid")
    parts = []
    for r in runs:
        t = (
            r.select(
                "qid",
                "docid",
                F.round(F.col("score") * F.lit(1e6)).cast("long").alias("si"),
            )
            .withColumn("mn", F.min("si").over(wq))
            .withColumn("mx", F.max("si").over(wq))
        )
        parts.append(
            t.select(
                "qid",
                "docid",
                F.when(
                    F.col("mx") > F.col("mn"),
                    F.expr(
                        "(2 * (si - mn) * 1000000 + (mx - mn)) "
                        "div (2 * (mx - mn))"
                    ),
                )
                .otherwise(F.lit(1_000_000))
                .cast("long")
                .alias("ni"),
            )
        )
    u = reduce(DataFrame.unionByName, parts)
    agg = u.groupBy("qid", "docid").agg(
        F.sum("ni").alias("t"), F.count("*").alias("m")
    )
    ti = (F.col("t") * F.col("m")) if mnz else F.col("t")
    scored = agg.select("qid", "docid", ti.cast("long").alias("ti"))
    w = Window.partitionBy("qid").orderBy(
        F.col("ti").desc(), F.col("docid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            "docid",
            F.col("rank").cast("int").alias("rank"),
            (F.col("ti") / F.lit(1e6)).alias("score"),
        )
    )
