"""Pre-retrieval query performance prediction (QPP).

The classic dictionary-only difficulty predictors — no postings are read,
no query is executed, so prediction costs O(|q|) dictionary rows per query:

* ``avg_idf`` / ``max_idf`` (He & Ounis, SPIRE 2004): rare-term queries are
  easier to satisfy precisely.
* ``scs`` — Simplified Clarity Score (He & Ounis 2004): the KL divergence of
  the query's term distribution from the collection language model,
  Σ p(t|q) · log2(p(t|q) / p(t|C)) with p(t|q) = qtf/|q| and p(t|C) =
  ctf/total_dl. High divergence = specific query.
* ``sum_scq`` / ``max_scq`` — collection-query similarity (Zhao, Scholer &
  Tsegay, ECIR 2008): SCQ(t) = (1 + ln ctf) · idf.

A 10^12-turn serving tier uses these to ROUTE: cheap queries to the WAND
fast path, predicted-hard ones to deeper candidate budgets or expansion
(RM3/Rocchio) — the decision must be cheaper than either path, which is why
all of this stays on the |V|-row dictionary. The reference has no QPP
surface; this extends the query-analysis family beside significant_terms.

Determinism contract (the repo's standard): every per-term quantity is
lifted to integer micros (round half-up in both engines) and each emitted
float is either that integer / 1e6 or an exact-integer-sum ratio with ONE
trailing IEEE division — summation-order independent, DuckDB-replayable.

Out-of-vocabulary terms count toward |q| (they dilute p(t|q), exactly as
they dilute scoring mass) but contribute no idf/ctf statistics; they are
reported in ``n_oov``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dhr_spark.functions.bm25 import idf_col

__all__ = ["qpp_predictors"]


def qpp_predictors(
    qtfs: DataFrame,
    tstats: DataFrame,
    n_docs: int,
    total_dl: int,
) -> DataFrame:
    """(qid, n_terms, n_oov, avg_idf, max_idf, scs, sum_scq, max_scq).

    ``qtfs``: (qid, term, qtf) analyzed query term frequencies.
    ``tstats``: (term, df, ctf) — the index dictionary (term_dict parquet)
    or ad-hoc corpus aggregates. ``n_docs``/``total_dl``: collection size
    statistics (manifest fields).

    The dictionary side broadcasts (query terms only); one groupBy(qid)
    aggregation emits every predictor.
    """
    if n_docs < 1 or total_dl < 1:
        raise ValueError(
            f"need n_docs >= 1 and total_dl >= 1, got {n_docs}/{total_dl}"
        )
    joined = qtfs.select("qid", "term", "qtf").join(
        F.broadcast(tstats.select("term", "df", "ctf")), "term", "left"
    )
    from pyspark.sql import Window

    w_q = Window.partitionBy("qid")
    idf = idf_col(F.col("df"), F.lit(n_docs))
    idf6 = F.round(idf * 1e6).cast("long")
    scq6 = F.round((F.lit(1.0) + F.log(F.col("ctf"))) * idf * 1e6).cast("long")
    # SCS term: p(t|q)·log2(p(t|q)/p(t|C)); p(t|q) = qtf/|q| with |q|
    # counting OOV mass, p(t|C) = ctf/total_dl
    ql = F.sum("qtf").over(w_q).cast("double")
    ptq = F.col("qtf").cast("double") / ql
    ptc = F.col("ctf").cast("double") / F.lit(float(total_dl))
    scs6 = F.round(ptq * F.log2(ptq / ptc) * 1e6).cast("long")
    per = joined.select(
        "qid",
        "qtf",
        F.col("df").isNull().cast("long").alias("_oov"),
        F.when(F.col("df").isNotNull(), idf6).alias("_idf6"),
        F.when(F.col("df").isNotNull(), scq6).alias("_scq6"),
        F.when(F.col("df").isNotNull(), scs6).alias("_scs6"),
    )
    agg = per.groupBy("qid").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("_oov").cast("long").alias("n_oov"),
        F.count("_idf6").cast("long").alias("_n_in"),
        F.sum("_idf6").alias("_sum_idf6"),
        F.max("_idf6").alias("_max_idf6"),
        F.sum("_scq6").alias("_sum_scq6"),
        F.max("_scq6").alias("_max_scq6"),
        F.sum("_scs6").alias("_sum_scs6"),
    )
    in_vocab = F.col("_n_in") > 0
    return agg.select(
        "qid",
        "n_terms",
        "n_oov",
        F.when(
            in_vocab,
            F.col("_sum_idf6").cast("double")
            / (F.col("_n_in") * F.lit(1_000_000)).cast("double"),
        ).alias("avg_idf"),
        F.when(in_vocab, F.col("_max_idf6").cast("double") / 1e6).alias(
            "max_idf"
        ),
        F.when(in_vocab, F.col("_sum_scs6").cast("double") / 1e6).alias("scs"),
        F.when(in_vocab, F.col("_sum_scq6").cast("double") / 1e6).alias(
            "sum_scq"
        ),
        F.when(in_vocab, F.col("_max_scq6").cast("double") / 1e6).alias(
            "max_scq"
        ),
    )
