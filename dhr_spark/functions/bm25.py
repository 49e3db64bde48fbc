"""Lucene BM25 (k1=0.9, b=0.4) as pure Column arithmetic — fully codegen'd.

The reference obtains per-(doc, term) weights from Lucene via
``index_reader.compute_bm25_term_weight(docid, term)``
(/root/reference/densify/output_vector.py:29) with Anserini defaults
k1=0.9, b=0.4 (pinned by BASELINE.json). Lucene's formulation (note: modern
Lucene OMITS the classic (k1+1) numerator factor — rank-neutral, score-visible;
the pytest oracle uses the same convention, SURVEY.md §7.2):

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d)    = idf(t) * tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q,d) = sum_t qtf(t) * w(t, d)      # query tf as weight,
                                             # densify_query.py:86-89
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dhr_spark import B, K1


def idf_col(df_col: Column, n_docs: Column | int) -> Column:
    n = F.lit(n_docs) if isinstance(n_docs, (int, float)) else n_docs
    return F.log(
        F.lit(1.0) + (n.cast("double") - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def bm25_weight_col(
    tf_col: Column,
    dl_col: Column,
    idf: Column,
    avgdl: Column,
    k1: float = K1,
    b: float = B,
) -> Column:
    tf = tf_col.cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_col.cast("double") / avgdl)
    return idf * tf / (tf + norm)


def bm25_weight_py(tf: float, dl: float, df: int, n_docs: int, avgdl: float,
                   k1: float = K1, b: float = B) -> float:
    """Driver/oracle-side scalar twin of bm25_weight_col (float64)."""
    import math

    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
