"""Top-k retrieval — DataFrame slow path (the engine's oracle-checkable plan).

Semantics = the reference's gated inner product: score(q,d) =
sum_t qtf(t) * w(t,d) over matching terms — the equi-join IS the gate
(/root/reference/retrieval/gip_retrieval.py:117-126, SURVEY.md J1/A4/T1).

Plan shape: broadcast(query term table) JOIN postings ON term key ->
partial+final hash agg on (qid, docid) -> per-qid window top-k. The query
side is always tiny relative to the corpus, so the join never shuffles the
postings: it streams them map-side against the broadcast hash table.

Determinism: rank by round(score, 6) DESC, docid ASC (float summation order
varies across partitions/engines; rounding before ranking pins ties the same
way in Spark, DuckDB and the pandas oracle — SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCORE_DECIMALS = 6


def score_all(qtfs: DataFrame, postings: DataFrame, on: str = "term_id") -> DataFrame:
    """(qid, docid, score): full scored candidate set (no cutoff)."""
    return (
        F.broadcast(qtfs)
        .join(postings, on)
        .groupBy("qid", "docid")
        .agg(F.sum(F.col("qtf") * F.col("weight")).alias("score"))
    )


def topk(scored: DataFrame, k: int = 1000) -> DataFrame:
    """(qid, docid, rank, score): per-query top-k, ties score DESC, docid ASC."""
    r = F.round(F.col("score"), SCORE_DECIMALS).alias("score")
    w = Window.partitionBy("qid").orderBy(
        F.round(F.col("score"), SCORE_DECIMALS).desc(), F.col("docid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "docid", "rank", r)
    )


def search_slow_path(
    qtfs: DataFrame, postings: DataFrame, k: int = 1000, on: str = "term_id"
) -> DataFrame:
    return topk(score_all(qtfs, postings, on=on), k)


def two_stage_topk(
    qtfs: DataFrame,
    postings: DataFrame,
    k: int = 1000,
    candidate_pool: int = 10_000,
    theta: float = 1.0,
    on: str = "term_id",
) -> DataFrame:
    """Reference two-stage contract (gip_retrieval.py:128-156, T2/J3):
    stage 1 scores only query terms with qweight > theta (approx), takes the
    top ``candidate_pool`` per query; stage 2 rescores candidates exactly with
    ALL query terms (semi-join) and cuts to k. Candidates whose approx score
    ranks in-pool but exact score doesn't can differ from exact top-k at the
    tail — same approximation the reference accepts."""
    heavy = qtfs.filter(F.col("qtf").cast("double") > theta)
    # queries where nothing exceeds theta fall back to all their terms
    fallback = qtfs.join(heavy.select("qid").distinct(), "qid", "left_anti")
    stage1 = score_all(heavy.unionByName(fallback), postings, on=on)
    cands = topk(stage1, candidate_pool).select("qid", "docid")
    exact = score_all(qtfs, postings, on=on).join(cands, ["qid", "docid"], "left_semi")
    return topk(exact, k)
