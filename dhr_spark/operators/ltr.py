"""Learning-to-rank feature extraction: every lexical similarity plus
match-shape features for each (query, document) pair in ONE scoring pass.

A ranker-training (or reranker-distillation) pipeline wants the classic
LTR feature set — BM25, TF-IDF, LM-Dirichlet, LM-Jelinek-Mercer, match
counts, coverage, length stats — per candidate pair. Running the four
similarity scorers separately pays four (term)-keyed joins and four
(qid, docid) aggregations over the same rows; this operator joins ONCE
(qtfs ⋈ tfs ⋈ dls ⋈ broadcast stats) and computes every weight column in
the same whole-stage-codegen select, then reduces with a single
(qid, docid) aggregation — the feature matrix costs what one scorer
costs. At 100 TB the optional ``candidates`` semi-join turns it into the
standard two-stage shape: first-pass top-k prunes, features compute only
for the k·|Q| surviving pairs.

Formula parity: each weight column replicates its dedicated operator's
pinned op order and 6-decimal round (operators/postings.py BM25,
classic.py TF-IDF, qld.py Dirichlet clamp + Jelinek-Mercer), so each
feature equals the corresponding ``*_topk`` score exactly — pinned by
tests and by the full DuckDB oracle of the ``ltr_features`` entry.

Reference anchor: the feature-extraction stage of LTR stacks (e.g.
Anserini/Pyserini's ``ltr`` feature extractors over Lucene indexes);
castorini/dhr trains dense models from exactly such per-pair lexical
signals (SURVEY.md §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhr_spark import B, K1


def ltr_features(
    qtfs: DataFrame,
    tfs: DataFrame,
    dls: DataFrame,
    k1: float = K1,
    b: float = B,
    mu: float = 1000.0,
    lam: float = 0.1,
    candidates: DataFrame | None = None,
    stats: tuple[int, float, float] | None = None,
    term_stats: DataFrame | None = None,
) -> DataFrame:
    """(qid, docid, bm25, tfidf, qld, lmjm, matched, qlen, coverage,
    sum_tf, dl) for every (query, doc) pair sharing at least one term —
    or only the ``candidates`` (qid, docid) pairs when given (the
    rerank/training shape).

    ``qtfs``: (qid, term, qtf); ``tfs``: (docid, term, tf); ``dls``:
    (docid, dl). coverage = matched / qlen is one exact IEEE division of
    two integers; similarity features are sums of 6-rounded per-term
    weights, rounded to 6 — each equal to its dedicated scorer's output.
    """
    if stats is None:
        row = dls.agg(
            F.count("*").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            F.sum("dl").alias("cl"),
        ).collect()[0]
        stats = (int(row["n_docs"]), float(row["avgdl"]), float(row["cl"]))
    n_docs, avgdl, cl = int(stats[0]), float(stats[1]), float(stats[2])
    # collection stats may be passed in (the index twin reads them from the
    # dictionary/manifest; tfs/dls then only need to COVER the candidates)
    ts = term_stats
    if ts is None:
        ts = tfs.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("ctf")
        )
    qlen = qtfs.groupBy("qid").agg(F.count("*").cast("long").alias("qlen"))

    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    # BM25 (functions/bm25.py bm25_weight_col op order)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    w_bm25 = idf * tf / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
    )
    # ClassicSimilarity TF-IDF (operators/classic.py op order)
    cidf = F.lit(1.0) + F.log(
        F.lit(float(n_docs)) / (F.col("df") + F.lit(1.0))
    )
    w_tfidf = (cidf * cidf) * F.sqrt(tf) / F.sqrt(dl)
    # LM-Dirichlet with the >= 0 clamp (operators/qld.py op order)
    mu_l = F.lit(float(mu))
    w_qld = F.greatest(
        F.log(F.lit(1.0) + tf / (mu_l * (F.col("ctf") / F.lit(cl))))
        + F.log(mu_l / (dl + mu_l)),
        F.lit(0.0),
    )
    # LM Jelinek-Mercer (operators/qld.py lmjm op order)
    jm = F.lit((1.0 - float(lam)) / float(lam))
    w_lmjm = F.log(
        F.lit(1.0) + jm * tf / dl / (F.col("ctf") / F.lit(cl))
    )

    pairs = (
        qtfs.join(tfs, "term")
        .join(dls, "docid")
        .join(F.broadcast(ts), "term")
    )
    if candidates is not None:
        pairs = pairs.join(
            candidates.select("qid", "docid"), ["qid", "docid"], "left_semi"
        )
    qtf = F.col("qtf").cast("double")
    agg = pairs.groupBy("qid", "docid").agg(
        F.round(F.sum(qtf * F.round(w_bm25, 6)), 6).alias("bm25"),
        F.round(F.sum(qtf * F.round(w_tfidf, 6)), 6).alias("tfidf"),
        F.round(F.sum(qtf * F.round(w_qld, 6)), 6).alias("qld"),
        F.round(F.sum(qtf * F.round(w_lmjm, 6)), 6).alias("lmjm"),
        F.count("*").cast("long").alias("matched"),
        F.sum("tf").cast("long").alias("sum_tf"),
        F.first("dl").cast("long").alias("dl"),
    )
    return agg.join(F.broadcast(qlen), "qid").select(
        "qid",
        "docid",
        "bm25",
        "tfidf",
        "qld",
        "lmjm",
        "matched",
        "qlen",
        (F.col("matched").cast("double") / F.col("qlen").cast("double"))
        .alias("coverage"),
        "sum_tf",
        "dl",
    )
