"""Corpus + term statistics and the deterministic term dictionary.

Reference analogues: corpus line-count prepass
(/root/reference/densify/densify_corpus.py:57-65), Lucene term-dictionary scan
``token2id[term] = idx`` (/root/reference/densify/densify_corpus.py:119-122).
Term ids are assigned by (df DESC, term ASC) rank so low ids = head terms —
useful for skew diagnostics; determinism is what matters for rank identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dhr_spark.functions.bm25 import idf_col


def corpus_stats(dls: DataFrame) -> DataFrame:
    """1-row (n_docs, avgdl). Cheap global agg; broadcast into every consumer."""
    return dls.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )


def term_stats(tfs: DataFrame, n_docs: int) -> DataFrame:
    """(term, df, idf): document frequency + Lucene idf."""
    ts = tfs.groupBy("term").agg(F.count("*").alias("df"))
    return ts.withColumn("idf", idf_col(F.col("df"), F.lit(n_docs)))


def term_dictionary(tstats: DataFrame, scalable: bool = True) -> DataFrame:
    """(term, term_id, df, idf): deterministic dense ids, head terms first
    (df DESC, term ASC).

    ``scalable`` uses the two-phase range-partition + offset scheme (no
    single-partition global sort) — at 10^7-10^8 terms (Heaps' law at 10^12
    turns) a one-partition row_number window is a straggler. The window path
    remains for tiny ad-hoc dictionaries.
    """
    if not scalable:
        w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
        return tstats.withColumn(
            "term_id", (F.row_number().over(w) - 1).cast("long")
        )
    from dhr_spark.operators.docids import with_global_ids

    return with_global_ids(
        tstats, [F.col("df").desc(), F.col("term").asc()], "term_id"
    )
