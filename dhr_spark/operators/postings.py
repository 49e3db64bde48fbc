"""Flat posting construction: (term_id, docid, tf, dl, weight).

This is the exploded, posting-list-friendly form of the reference's per-doc
JSON term-weight maps (/root/reference/densify/output_vector.py:26-31). The
BM25 weight is materialized at index time as pure Column arithmetic
(SURVEY.md §7.2) — no UDF, fully whole-stage-codegen'd.

Join strategy at scale: term_stats (vocabulary-sized) and corpus_stats (1 row)
are BROADCAST; doc_lengths co-partitions with term_freqs on docid. The only
big shuffle is the final term_id clustering, done once in the segment builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhr_spark.functions.bm25 import bm25_weight_col


def postings_flat(
    tfs: DataFrame,
    dls: DataFrame,
    tdict: DataFrame,
    avgdl: float,
    k1: float | None = None,
    b: float | None = None,
) -> DataFrame:
    from dhr_spark import B, K1

    k1 = K1 if k1 is None else k1
    b = B if b is None else b
    joined = (
        tfs.join(dls, "docid")  # both sides keyed by docid; AQE handles sizing
        .join(F.broadcast(tdict.select("term", "term_id", "idf")), "term")
    )
    return joined.select(
        "term_id",
        "docid",
        "tf",
        "dl",
        bm25_weight_col(
            F.col("tf"), F.col("dl"), F.col("idf"), F.lit(float(avgdl)), k1, b
        ).alias("weight"),
    )
