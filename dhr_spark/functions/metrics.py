"""Ranking-quality metrics as DataFrame aggregates.

Port of the reference's evaluation semantics — MRR / Recall@k / NDCG@k /
R_cap / Hole (/root/reference/tevatron/utils/custom_metrics.py:17-116,
/root/reference/tevatron/utils/metrics.py:4-92) — re-expressed as joins +
window/grouped aggregates so a million-query eval is one shuffle, not a
python loop over queries.

Inputs:
  run   (qid, docid, rank, score)  — rank 1-based, unique per (qid, rank)
  qrels (qid, docid [, rel])       — binary relevance if `rel` absent

Every metric returns one row per qid (missing qids -> 0.0), plus a
``mean_*`` helper collapsing to the global mean the reference reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _qids(run: DataFrame, qrels: DataFrame) -> DataFrame:
    return run.select("qid").union(qrels.select("qid")).distinct()


def mrr_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(qid, rr): reciprocal rank of the first relevant hit within top-k
    (custom_metrics.py:17-31)."""
    hits = (
        run.filter(F.col("rank") <= k)
        .join(qrels.select("qid", "docid"), ["qid", "docid"], "left_semi")
        .groupBy("qid")
        .agg(F.min("rank").alias("first_rank"))
    )
    return (
        _qids(run, qrels)
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.round(
                F.coalesce(F.lit(1.0) / F.col("first_rank"), F.lit(0.0)), 6
            ).alias("rr"),
        )
    )


def recall_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(qid, recall): |relevant ∩ top-k| / |relevant| (custom_metrics.py:46-57)."""
    rel_counts = qrels.groupBy("qid").agg(F.count("*").alias("n_rel"))
    hit_counts = (
        run.filter(F.col("rank") <= k)
        .join(qrels.select("qid", "docid"), ["qid", "docid"], "left_semi")
        .groupBy("qid")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        _qids(run, qrels)
        .join(rel_counts, "qid", "left")
        .join(hit_counts, "qid", "left")
        .select(
            "qid",
            F.round(
                F.when(
                    F.col("n_rel") > 0,
                    F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_rel"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("recall"),
        )
    )


def ndcg_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(qid, ndcg): binary-gain NDCG@k (utils/metrics.py:30-54).

    dcg  = Σ over relevant docs in top-k of 1/log2(rank+1)
    idcg = Σ_{i=1..min(|rel|,k)} 1/log2(i+1)
    """
    dcg = (
        run.filter(F.col("rank") <= k)
        .join(qrels.select("qid", "docid"), ["qid", "docid"], "left_semi")
        .groupBy("qid")
        .agg(F.sum(F.lit(1.0) / F.log2(F.col("rank") + 1)).alias("dcg"))
    )
    idcg = qrels.groupBy("qid").agg(F.count("*").alias("n_rel")).select(
        "qid",
        F.aggregate(
            F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(k)).cast("int")),
            F.lit(0.0),
            lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 1),
        ).alias("idcg"),
    )
    return (
        _qids(run, qrels)
        .join(dcg, "qid", "left")
        .join(idcg, "qid", "left")
        .select(
            "qid",
            F.round(
                F.when(
                    F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                    F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg"),
        )
    )


def recall_cap_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(qid, r_cap): capped recall — hits / min(|rel|, k)
    (custom_metrics.py:78-87, the reference's BEIR R_cap)."""
    rel_counts = qrels.groupBy("qid").agg(F.count("*").alias("n_rel"))
    hit_counts = (
        run.filter(F.col("rank") <= k)
        .join(qrels.select("qid", "docid"), ["qid", "docid"], "left_semi")
        .groupBy("qid")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        _qids(run, qrels)
        .join(rel_counts, "qid", "left")
        .join(hit_counts, "qid", "left")
        .select(
            "qid",
            F.round(
                F.when(
                    F.col("n_rel") > 0,
                    F.coalesce(F.col("n_hit"), F.lit(0))
                    / F.least(F.col("n_rel"), F.lit(k)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("r_cap"),
        )
    )


def hole_at_k(run: DataFrame, annotated: DataFrame, k: int = 10) -> DataFrame:
    """(qid, hole): fraction of top-k docs absent from the annotated pool
    (custom_metrics.py:70-82) — a left-anti join per query."""
    topk = run.filter(F.col("rank") <= k)
    unjudged = topk.join(
        annotated.select("qid", "docid"), ["qid", "docid"], "left_anti"
    ).groupBy("qid").agg(F.count("*").alias("n_unjudged"))
    denom = topk.groupBy("qid").agg(F.count("*").alias("n_top"))
    return (
        denom.join(unjudged, "qid", "left")
        .select(
            "qid",
            F.round(
                F.coalesce(F.col("n_unjudged"), F.lit(0)) / F.col("n_top"), 6
            ).alias("hole"),
        )
    )


def top_k_accuracy_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(qid, acc): 1.0 if ANY relevant doc appears in the top-k, else 0.0
    (custom_metrics.py:103-116 — the reference's BEIR Accuracy@k)."""
    hits = (
        run.filter(F.col("rank") <= k)
        .join(qrels.select("qid", "docid"), ["qid", "docid"], "left_semi")
        .select("qid")
        .distinct()
        .withColumn("acc", F.lit(1.0))
    )
    return (
        _qids(run, qrels)
        .join(hits, "qid", "left")
        .select("qid", F.round(F.coalesce(F.col("acc"), F.lit(0.0)), 6).alias("acc"))
    )


def map_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(qid, ap): average precision@k with binary gains
    (utils/metrics.py:4-28): AP = Σ_{relevant hit at rank r} P@r / |rel|."""
    topk = run.filter(F.col("rank") <= k)
    hits = topk.join(qrels.select("qid", "docid"), ["qid", "docid"], "left_semi")
    w = Window.partitionBy("qid").orderBy("rank")
    prec = hits.withColumn("hit_no", F.row_number().over(w)).select(
        "qid", (F.col("hit_no") / F.col("rank")).alias("p_at_r")
    )
    ap_num = prec.groupBy("qid").agg(F.sum("p_at_r").alias("num"))
    n_rel = qrels.groupBy("qid").agg(F.count("*").alias("n_rel"))
    return (
        _qids(run, qrels)
        .join(ap_num, "qid", "left")
        .join(n_rel, "qid", "left")
        .select(
            "qid",
            F.round(
                F.when(
                    F.coalesce(F.col("n_rel"), F.lit(0)) > 0,
                    F.coalesce(F.col("num"), F.lit(0.0)) / F.col("n_rel"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ap"),
        )
    )


def r_precision(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """(qid, rprec): precision at the per-query cutoff R = |relevant docs| —
    |relevant ∩ top-R| / max(1, R) (reference tevatron/utils/metrics.py:69-71:
    ``intersec = len(gt & set(pred[:len(gt)]))``).  The cutoff varies per
    query, unlike precision_at_k's fixed k; queries with no qrels score 0.0
    via the reference's max(1, |gt|) denominator.  Ranks beyond the run's
    depth count as misses (the reference's pred list is likewise finite)."""
    n_rel = qrels.groupBy("qid").agg(F.count("*").alias("n_rel"))
    hits = (
        run.join(n_rel, "qid")
        .filter(F.col("rank") <= F.col("n_rel"))
        .join(qrels.select("qid", "docid"), ["qid", "docid"], "left_semi")
        .groupBy("qid")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        _qids(run, qrels)
        .join(n_rel, "qid", "left")
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0))
                / F.greatest(
                    F.coalesce(F.col("n_rel"), F.lit(0)), F.lit(1)
                ),
                6,
            ).alias("rprec"),
        )
    )


def precision_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(qid, prec): |relevant ∩ top-k| / k — trec_eval ``P_k`` semantics:
    the denominator is the cutoff k even when fewer than k docs were
    retrieved (unretrieved slots count as misses).  Same join shape as
    recall_at_k (custom_metrics.py:46-57), different denominator."""
    hit_counts = (
        run.filter(F.col("rank") <= k)
        .join(qrels.select("qid", "docid"), ["qid", "docid"], "left_semi")
        .groupBy("qid")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        _qids(run, qrels)
        .join(hit_counts, "qid", "left")
        .select(
            "qid",
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(float(k)), 6
            ).alias("prec"),
        )
    )


def judged_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(qid, judged): fraction of the retrieved top-k that appears in the
    judgment pool at all (any qrels row, relevant or not) — Anserini's
    ``-judged`` diagnostic, the complement of hole_at_k over the qrels pool.
    Denominator = number retrieved within the cutoff (min(k, |run_q|));
    qids with no retrieved docs score 0.0."""
    topk = run.filter(F.col("rank") <= k)
    judged = (
        topk.join(qrels.select("qid", "docid"), ["qid", "docid"], "left_semi")
        .groupBy("qid")
        .agg(F.count("*").alias("n_judged"))
    )
    denom = topk.groupBy("qid").agg(F.count("*").alias("n_top"))
    return (
        _qids(run, qrels)
        .join(denom, "qid", "left")
        .join(judged, "qid", "left")
        .select(
            "qid",
            F.round(
                F.when(
                    F.coalesce(F.col("n_top"), F.lit(0)) > 0,
                    F.coalesce(F.col("n_judged"), F.lit(0)) / F.col("n_top"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("judged"),
        )
    )


def bpref_at_k(run: DataFrame, qrels_graded: DataFrame, k: int = 10) -> DataFrame:
    """(qid, bpref): binary preference (Buckley & Voorhees, SIGIR 2004;
    trec_eval ``bpref``) over the top-k — the incomplete-judgments metric:
    unjudged retrieved docs are IGNORED (that is bpref's whole point), and
    each retrieved relevant doc is penalized by the judged-NONrelevant
    docs ranked above it:

        bpref = (1/R) Σ_{rel r retrieved} 1 − min(nonrel_above_r, D) / D
        D = min(R, N); R = |judged relevant|, N = |judged nonrelevant|

    ``qrels_graded`` must carry (qid, docid, rel): rel > 0 relevant,
    rel = 0 explicitly judged nonrelevant. With D = 0 each retrieved
    relevant doc contributes a full 1 (trec_eval's guard). The sum runs
    in exact integers with ONE final division by R·D (the repo-wide
    integer-micros contract), so per-query bpref is bit-stable across
    engines."""
    topk = run.filter(F.col("rank") <= k)
    pool = qrels_graded.select(
        "qid", "docid", (F.col("rel") > 0).cast("int").alias("is_rel")
    )
    counts = pool.groupBy("qid").agg(
        F.sum("is_rel").alias("n_rel"),
        F.sum(F.lit(1) - F.col("is_rel")).alias("n_nonrel"),
    )
    judged = topk.join(pool, ["qid", "docid"])
    w = (
        Window.partitionBy("qid")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_rel = (
        judged.withColumn(
            "nonrel_above",
            F.coalesce(F.sum(F.lit(1) - F.col("is_rel")).over(w), F.lit(0)),
        )
        .filter(F.col("is_rel") == 1)
        .join(F.broadcast(counts), "qid")
        .withColumn("d", F.least("n_rel", "n_nonrel").cast("long"))
        .select(
            "qid",
            F.when(
                F.col("d") > 0,
                F.col("d") - F.least(F.col("nonrel_above"), F.col("d")),
            )
            .otherwise(F.lit(1))
            .cast("long")
            .alias("numer"),
        )
    )
    sums = per_rel.groupBy("qid").agg(F.sum("numer").alias("s"))
    return (
        _qids(run, qrels_graded)
        .join(counts, "qid", "left")
        .join(sums, "qid", "left")
        .select(
            "qid",
            F.round(
                F.when(
                    F.coalesce(F.col("n_rel"), F.lit(0)) > 0,
                    F.coalesce(F.col("s"), F.lit(0)).cast("double")
                    / (
                        F.col("n_rel")
                        * F.greatest(
                            F.least("n_rel", "n_nonrel"), F.lit(1)
                        )
                    ).cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("bpref"),
        )
    )


def rbo_weights(k: int, p_sixteenths: int) -> dict[int, int]:
    """Exact integer RBO weight table: W(m) = (16−p)·Σ_{d=m..k}
    (2520/d)·p^{d−1}·16^{k−d}, where p rides as p_sixteenths/16. A doc in
    both top-k prefixes with m = max(rank_a, rank_b) contributes to every
    prefix depth d >= m, so Σ_docs W(m) is the exact-common-denominator
    numerator of the truncated RBO sum (denominator 2520·16^k). 2520 =
    lcm(1..10) clears every 1/d; all terms stay far inside int64."""
    return {
        m: (16 - p_sixteenths) * sum(
            (2520 // d) * p_sixteenths ** (d - 1) * 16 ** (k - d)
            for d in range(m, k + 1)
        )
        for m in range(1, k + 1)
    }


def rbo_at_k(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
    p_sixteenths: int = 14,
) -> DataFrame:
    """(qid, rbo): truncated rank-biased overlap of two runs' top-k
    prefixes (Webber, Moffat & Zobel, TOIS 2010) — the rank-similarity
    companion to the paired t-test / Wilcoxon metric comparisons: "how
    differently do these two systems RANK", not "which scores higher".

        RBO_ext@k = (1−p)·Σ_{d=1..k} p^{d−1}·A_d  +  p^k·A_k,
        A_d = |top_d(a) ∩ top_d(b)| / d

    (the paper's extrapolated point estimate at even depth l = s = k:
    identical prefixes score exactly 1.0, disjoint ones 0.0). Top-
    weighted: agreement at rank 1 counts most, tail agreement decays
    geometrically with persistence p. Determinism contract: p must be a
    multiple of 1/16 in (0, 1) (``p_sixteenths``/16; default 14/16 =
    0.875) and k <= 10, which makes every term an exact binary rational —
    the per-qid numerator is an exact int64 sum over a precomputed weight
    table (rbo_weights + the p^k·A_k extrapolation term, which every
    joined doc carries since I_k counts all of them) and the emitted
    value is ONE IEEE division, so Spark and DuckDB agree bit-for-bit
    with no rounding.

    Output rows cover every qid present in BOTH runs; disjoint prefixes
    score 0.0. One (qid, docid) inner join of two k-row-per-qid prefixes
    + a per-qid sum — no corpus access."""
    if not 1 <= int(p_sixteenths) <= 15:
        raise ValueError(
            f"p_sixteenths must be in [1, 15] (p = n/16 < 1), "
            f"got {p_sixteenths}"
        )
    if not 1 <= int(k) <= 10:
        raise ValueError(
            f"k must be in [1, 10] (the lcm(1..10) exactness window), "
            f"got {k}"
        )
    ki, p = int(k), int(p_sixteenths)
    ext = (2520 // ki) * p ** ki  # p^k·A_k term: every joined doc is in I_k
    wt = {m: w + ext for m, w in rbo_weights(ki, p).items()}
    den = float(2520 * 16 ** ki)
    a = run_a.filter(F.col("rank") <= k).select(
        "qid", "docid", F.col("rank").alias("ra")
    )
    b = run_b.filter(F.col("rank") <= k).select(
        "qid", "docid", F.col("rank").alias("rb")
    )
    m = F.greatest(F.col("ra"), F.col("rb"))
    wexpr = F.lit(0).cast("long")
    for mm, w in sorted(wt.items()):
        wexpr = F.when(m == mm, F.lit(w).cast("long")).otherwise(wexpr)
    nums = (
        a.join(b, ["qid", "docid"])
        .select("qid", wexpr.alias("w"))
        .groupBy("qid")
        .agg(F.sum("w").alias("num"))
    )
    both = (
        a.select("qid").distinct()
        .join(b.select("qid").distinct(), "qid")
    )
    return both.join(nums, "qid", "left").select(
        "qid",
        (F.coalesce(F.col("num"), F.lit(0)).cast("double") / F.lit(den))
        .alias("rbo"),
    )


def err_at_k(
    run: DataFrame,
    qrels_graded: DataFrame,
    k: int = 10,
    max_grade: int = 4,
) -> DataFrame:
    """(qid, err): Expected Reciprocal Rank at k (Chapelle, Metlzer, Zhang
    & Grinspan, CIKM 2009; trec_eval ``err``) — the cascade-model graded
    metric: a user scans down the ranking and stops at rank r with
    probability R_r·Π_{i<r}(1−R_i), where R = (2^g − 1)/2^gmax:

        ERR@k = Σ_{r=1..k} (1/r) · R_r · Π_{i<r} (1 − R_i)

    ``qrels_graded`` carries (qid, docid, rel); unjudged and rel=0 docs
    have R = 0 — they neither contribute nor attenuate, exactly the
    trec_eval treatment, so only judged-relevant hits enter the per-qid
    walk (rank gaps still count through 1/r).

    Determinism contract: every R_r is a binary rational, so with
    k <= 10 (lcm(1..10) = 2520 clears each 1/r) the whole sum is ONE
    exact int64 numerator over the common denominator 2520·2^(gmax·k),
    and the emitted value is ONE IEEE division — bit-identical across
    Spark and DuckDB (the oracle replays the same integers; each term
    stays < 2^53 so even a double-typed replay is exact). The walk runs
    as an F.aggregate fold over each qid's <= k judged hits (JVM-side,
    no UDF); gmax·k <= 62 guards int64.
    """
    ki, g_max = int(k), int(max_grade)
    if not 1 <= ki <= 10:
        raise ValueError(
            f"k must be in [1, 10] (the lcm(1..10) exactness window), got {k}"
        )
    if not 1 <= g_max <= 5:
        raise ValueError(f"max_grade must be in [1, 5], got {max_grade}")
    den = float(2520) * float(2 ** (g_max * ki))
    hits = (
        run.filter(F.col("rank") <= ki)
        .join(
            qrels_graded.filter(F.col("rel") > 0).select("qid", "docid", "rel"),
            ["qid", "docid"],
        )
        .select("qid", "rank", F.least(F.col("rel"), F.lit(g_max)).alias("g"))
    )
    walk = (
        hits.groupBy("qid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rank", "g"))
            ).alias("hits")
        )
        .select(
            "qid",
            F.aggregate(
                "hits",
                F.struct(
                    F.lit(0).cast("long").alias("num"),
                    F.lit(1).cast("long").alias("p"),
                    F.lit(0).cast("int").alias("c"),
                ),
                lambda acc, h: F.struct(
                    (
                        acc["num"]
                        + (F.lit(2520) / h["rank"]).cast("long")
                        * (F.pow(F.lit(2.0), h["g"]).cast("long") - 1)
                        * acc["p"]
                        * F.pow(
                            F.lit(2.0),
                            F.lit(g_max) * (F.lit(ki) - acc["c"] - 1),
                        ).cast("long")
                    ).alias("num"),
                    (
                        acc["p"]
                        * (
                            F.lit(2 ** g_max).cast("long")
                            - F.pow(F.lit(2.0), h["g"]).cast("long")
                            + 1
                        )
                    ).alias("p"),
                    (acc["c"] + 1).alias("c"),
                ),
                lambda acc: acc["num"],
            ).alias("num"),
        )
    )
    return (
        _qids(run, qrels_graded)
        .join(walk, "qid", "left")
        .select(
            "qid",
            (
                F.coalesce(F.col("num"), F.lit(0)).cast("double") / F.lit(den)
            ).alias("err"),
        )
    )


def rbp_at_k(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    p_sixteenths: int = 8,
) -> DataFrame:
    """(qid, rbp): truncated Rank-Biased Precision (Moffat & Zobel, TOIS
    2008) — the user-persistence metric: a user inspects rank r with
    probability p^(r−1) and the score is the expected rate of relevant
    docs seen,

        RBP@k = (1 − p) · Σ_{r=1..k} rel_r · p^(r−1)

    with binary relevance (rel > 0 counts when ``qrels`` carries a rel
    column). Truncation at k makes this the paper's lower-bound ("base")
    estimate; the residual p^k is the unjudged-tail uncertainty, which a
    caller can add as the upper bound. Same determinism contract as
    rbo_at_k: p = p_sixteenths/16 (default 8/16 = 0.5, the paper's
    impatient-user setting) and k <= 10 keep every term an exact integer
    over the denominator 16^k — a precomputed per-rank weight table and
    ONE final IEEE division, bit-identical across engines."""
    ki, p = int(k), int(p_sixteenths)
    if not 1 <= p <= 15:
        raise ValueError(
            f"p_sixteenths must be in [1, 15] (p = n/16 < 1), got {p_sixteenths}"
        )
    if not 1 <= ki <= 10:
        raise ValueError(f"k must be in [1, 10], got {k}")
    # (16−p)·p^(r−1)·16^(k−r): integer numerator of (1−p)·p^(r−1) over 16^k
    wt = {r: (16 - p) * p ** (r - 1) * 16 ** (ki - r) for r in range(1, ki + 1)}
    den = float(16 ** ki)
    rel = (
        qrels.select("qid", "docid", F.col("rel").alias("rel"))
        if "rel" in qrels.columns
        else qrels.select("qid", "docid", F.lit(1).alias("rel"))
    )
    wexpr = F.lit(0).cast("long")
    for r, w in sorted(wt.items()):
        wexpr = F.when(F.col("rank") == r, F.lit(w).cast("long")).otherwise(wexpr)
    nums = (
        run.filter(F.col("rank") <= ki)
        .join(rel.filter(F.col("rel") > 0).select("qid", "docid"), ["qid", "docid"], "left_semi")
        .select("qid", wexpr.alias("w"))
        .groupBy("qid")
        .agg(F.sum("w").alias("num"))
    )
    return (
        _qids(run, qrels)
        .join(nums, "qid", "left")
        .select(
            "qid",
            (
                F.coalesce(F.col("num"), F.lit(0)).cast("double") / F.lit(den)
            ).alias("rbp"),
        )
    )


def iprec_at_recall(run: DataFrame, qrels: DataFrame, k: int = 1000) -> DataFrame:
    """(qid, level, iprec): the 11-point interpolated precision-recall
    curve (trec_eval ``iprec_at_recall_0.00`` .. ``_1.00``; Salton &
    McGill's standard eval plot) over the top-k:

        iprec(r) = max{ prec(j) : recall(j) >= r },  r = level/10

    maximized over the ranks j of retrieved relevant docs (0.0 when no
    relevant doc reaches recall r). With i = cumulative relevant count at
    rank j and R = |relevant|, prec(j) = i/j and the recall gate is the
    EXACT integer predicate 10·i >= level·R — no float recall ever
    compared. prec values are single IEEE divisions of small ints, and
    the suffix max picks among identical doubles on every engine, so the
    curve is bit-stable cross-engine. One join + two windows; queries
    with no relevant docs emit the all-zero curve (trec_eval behavior).
    Relevance is binary over graded qrels: when a ``rel`` column is
    present only rel > 0 rows are relevant (trec_eval's iprec uses the
    judged-RELEVANT pool; judged-nonrelevant rel=0 rows must neither
    inflate R nor count as hits), matching rbp_at_k's column check.
    """
    levels = F.explode(F.array(*[F.lit(i) for i in range(11)])).alias("level")
    rel_pool = (
        qrels.filter(F.col("rel") > 0)
        if "rel" in qrels.columns
        else qrels
    )
    rel_counts = rel_pool.select("qid", "docid").distinct().groupBy("qid").agg(
        F.count("*").alias("n_rel")
    )
    hits = (
        run.filter(F.col("rank") <= k)
        .join(rel_pool.select("qid", "docid").distinct(), ["qid", "docid"], "left_semi")
    )
    w_cum = (
        Window.partitionBy("qid")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_suffix = (
        Window.partitionBy("qid")
        .orderBy("rank")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    curves = (
        hits.withColumn("i", F.count("*").over(w_cum))
        .withColumn(
            "prec", F.col("i").cast("double") / F.col("rank").cast("double")
        )
        .withColumn("mprec", F.max("prec").over(w_suffix))
        .join(F.broadcast(rel_counts), "qid")
        .select("qid", "i", "mprec", "n_rel")
        .select("qid", levels, "i", "mprec", "n_rel")
        .filter(F.lit(10) * F.col("i") >= F.col("level") * F.col("n_rel"))
        .groupBy("qid", "level")
        .agg(F.max("mprec").alias("iprec"))
    )
    grid = _qids(run, qrels).select("qid", levels)
    return (
        grid.join(curves, ["qid", "level"], "left")
        .select(
            "qid",
            F.col("level").cast("int").alias("level"),
            F.coalesce(F.col("iprec"), F.lit(0.0)).alias("iprec"),
        )
    )


def ndcg_graded_at_k(
    run: DataFrame, qrels_graded: DataFrame, k: int = 10
) -> DataFrame:
    """(qid, ndcg): graded-gain NDCG@k (trec_eval ``ndcg`` / Burges gains):

        dcg  = Σ over judged hits of (2^rel − 1) / log2(rank + 1)
        idcg = Σ_{i=1..min(#rel>0, k)} (2^g_(i) − 1) / log2(i + 1)

    with g_(i) the grades sorted descending — the ideal ordering. The
    binary-gain twin (ndcg_at_k) keeps the reference's BEIR parity;
    this is the graded companion ERR/bpref callers expect. rel is
    capped at 30 so 2^rel stays in int64; rel <= 0 contributes nothing.
    Same rounding contract as ndcg_at_k (round 6)."""
    gain = F.pow(F.lit(2.0), F.least(F.col("rel"), F.lit(30))) - 1
    pool = qrels_graded.filter(F.col("rel") > 0).select(
        "qid", "docid", gain.alias("gain"), F.col("rel").alias("rel")
    )
    dcg = (
        run.filter(F.col("rank") <= k)
        .join(pool, ["qid", "docid"])
        .groupBy("qid")
        .agg(F.sum(F.col("gain") / F.log2(F.col("rank") + 1)).alias("dcg"))
    )
    idcg = (
        pool.groupBy("qid")
        .agg(F.reverse(F.array_sort(F.collect_list("rel"))).alias("gs"))
        .select(
            "qid",
            F.aggregate(
                F.slice("gs", 1, k),
                F.struct(
                    F.lit(0.0).alias("s"), F.lit(0).cast("int").alias("i")
                ),
                lambda acc, g: F.struct(
                    (
                        acc["s"]
                        + (
                            F.pow(F.lit(2.0), F.least(g, F.lit(30))) - 1
                        )
                        / F.log2(acc["i"].cast("double") + 2)
                    ).alias("s"),
                    (acc["i"] + 1).alias("i"),
                ),
                lambda acc: acc["s"],
            ).alias("idcg"),
        )
    )
    return (
        _qids(run, qrels_graded)
        .join(dcg, "qid", "left")
        .join(idcg, "qid", "left")
        .select(
            "qid",
            F.round(
                F.when(
                    F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                    F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg"),
        )
    )


def mean_metric(per_query: DataFrame, col: str) -> DataFrame:
    """Collapse a per-qid metric to its global mean (the reference's headline
    number, e.g. MRR@10 over all dev queries)."""
    return per_query.agg(F.round(F.avg(col), 6).alias(f"mean_{col}"))


def paired_diff_test(
    a: DataFrame, b: DataFrame, col_a: str, col_b: str | None = None
) -> DataFrame:
    """(n, mean_a, mean_b, mean_diff, t_stat): paired Student's t over
    per-query metric differences — the IR-standard significance test for
    comparing two runs on the same query set (trec_eval users feed the
    per-query -q output to this exact test; ranx's compare() default).
    ``a``/``b`` are per-query frames like mrr_at_k's (qid, rr); only
    queries present in BOTH sides pair up (inner join — the paired test
    is undefined for unpaired observations).

    Cross-engine determinism: the round6 metric values are lifted to
    exact integer micros, so n, Σd and Σd² are exact integers (Σd² in
    38-digit decimal — int64 would overflow past ~10^6 queries);
    mean_* and

        t = Σd · sqrt(n−1) / sqrt(n·Σd² − (Σd)²)

    then touch floats only through exactly-rounded IEEE ops (sqrt,
    divide), so Spark and DuckDB agree bit-for-bit. t_stat is NULL when
    every difference is identical (zero variance) or n < 2."""
    cb = col_b or col_a
    am = F.round(F.col(col_a) * F.lit(1e6), 0).cast("long").alias("am")
    bm = F.round(F.col(cb) * F.lit(1e6), 0).cast("long").alias("bm")
    d = F.col("am") - F.col("bm")
    agg = (
        a.select("qid", am)
        .join(b.select("qid", bm), "qid")
        .agg(
            F.count("*").alias("n"),
            F.sum("am").alias("sa"),
            F.sum("bm").alias("sb"),
            F.sum(d).alias("s1"),
            F.sum((d * d).cast("decimal(38,0)")).alias("s2"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    den2 = (dec("n") * F.col("s2") - dec("s1") * dec("s1")).cast("double")
    t = F.when(
        (F.col("n") < 2) | (den2 <= 0), F.lit(None).cast("double")
    ).otherwise(
        F.col("s1").cast("double")
        * F.sqrt((F.col("n") - 1).cast("double"))
        / F.sqrt(den2)
    )
    return agg.select(
        "n",
        (F.col("sa").cast("double") / F.col("n") / F.lit(1e6)).alias("mean_a"),
        (F.col("sb").cast("double") / F.col("n") / F.lit(1e6)).alias("mean_b"),
        (F.col("s1").cast("double") / F.col("n") / F.lit(1e6)).alias(
            "mean_diff"
        ),
        t.alias("t_stat"),
    )


def wilcoxon_signed_rank(
    a: DataFrame, b: DataFrame, col_a: str, col_b: str | None = None
) -> DataFrame:
    """(n, w_plus, w_minus, z_stat): Wilcoxon signed-rank test over paired
    per-query metric values — the standard NON-parametric companion to
    ``paired_diff_test`` (IR evaluations report both; Wilcoxon is preferred
    when per-query metric differences are skewed, which RR/AP deltas
    usually are). Inputs are per-query frames like mrr_at_k's (qid, rr);
    only queries in BOTH sides pair up, and zero-difference pairs are
    dropped (the classic Wilcoxon treatment).

    Ranks are average ranks over ties of |d|, carried as DOUBLED integer
    ranks (2·rank = min_rownum + max_rownum of the tie group) so every sum
    is exact int64 arithmetic. The normal approximation uses the
    tie-corrected variance

        z = (W+ − n(n+1)/4) / sqrt( n(n+1)(2n+1)/24 − Σ(t³−t)/48 )
          = (2·W2+ − n(n+1)) · sqrt(3) / sqrt(48·Var)

    where ``48·Var = 2n(n+1)(2n+1) − Σ(t³−t)`` is an exact integer
    (decimal(38,0) against overflow past ~10^6 queries); floats enter only
    through exactly-rounded sqrt/multiply/divide, so Spark and the DuckDB
    oracle agree bit-for-bit. z_stat is NULL when n == 0 (all pairs tied).

    Scale note: ranking is a single global sort of the NONZERO differences
    — |Q|-bounded, the same query-set scale every paired test (and the
    driver-side query prep) already holds; never corpus-scale.
    """
    from pyspark.sql import Window

    cb = col_b or col_a
    am = F.round(F.col(col_a) * F.lit(1e6), 0).cast("long").alias("am")
    bm = F.round(F.col(cb) * F.lit(1e6), 0).cast("long").alias("bm")
    d = (
        a.select("qid", am)
        .join(b.select("qid", bm), "qid")
        .select(
            (F.col("am") - F.col("bm")).alias("d"),
            F.abs(F.col("am") - F.col("bm")).alias("ad"),
        )
        .filter(F.col("d") != 0)
    )
    rn = F.row_number().over(Window.orderBy("ad", "d"))
    w_tie = Window.partitionBy("ad")
    ranked = d.withColumn("_rn", rn).withColumn(
        "rank2", F.min("_rn").over(w_tie) + F.max("_rn").over(w_tie)
    )
    ties = (
        d.groupBy("ad")
        .agg(F.count("*").cast("decimal(38,0)").alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("tie3")
        )
    )
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("d") > 0, F.col("rank2"))), F.lit(0)
        ).alias("w2p"),
    ).crossJoin(ties)
    nn = F.col("n").cast("decimal(38,0)")
    var48 = (
        F.lit(2).cast("decimal(38,0)")
        * nn
        * (nn + 1)
        * (F.lit(2).cast("decimal(38,0)") * nn + 1)
        - F.col("tie3")
    ).cast("double")
    num = (
        F.lit(2).cast("decimal(38,0)") * F.col("w2p").cast("decimal(38,0)")
        - nn * (nn + 1)
    ).cast("double")
    z = F.when((F.col("n") < 1) | (var48 <= 0), F.lit(None).cast("double")
    ).otherwise(num * F.sqrt(F.lit(3.0)) / F.sqrt(var48))
    return agg.select(
        "n",
        (F.col("w2p").cast("double") / 2).alias("w_plus"),
        (
            (nn * (nn + 1)).cast("double") / 2
            - F.col("w2p").cast("double") / 2
        ).alias("w_minus"),
        z.alias("z_stat"),
    )
