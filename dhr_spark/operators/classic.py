"""Vector-space TF-IDF ranking (Lucene ClassicSimilarity).

The reference retrieves through Pyserini/Anserini's Lucene backend
(/root/reference/densify/output_vector.py:1); ClassicSimilarity is Lucene's
historical default scorer (pre-BM25, still shipped) and the textbook
vector-space model the lexical literature benchmarks against:

    w(t, d) = idf(t)² · sqrt(tf) / sqrt(dl)
    idf(t)  = 1 + ln(N / (df(t) + 1))

idf appears SQUARED because Lucene applies it on both the query side
(TermQuery weight) and the index side (per-match score). We keep the
length norm 1/sqrt(dl) exact instead of Lucene's lossy 1-byte norm
encoding — scores therefore match the formula, not the byte-quantized
artifact. Always positive: even at df = N the idf is 1 − ln((N+1)/N)
bounded below by 1 − ln 2.

Plan shape: identical to the BM25/QLD/axiomatic slow paths — df stats
broadcast-joined onto the postings, then broadcast(query) × postings
equi-join + (qid, docid) aggregation (operators/topk.py). Nothing here
shuffles the postings. Weights round to 6 decimals (topk.SCORE_DECIMALS
contract).

Index-backed twin: ``Searcher.search_tfidf`` (operators/wand.py) runs the
same formula through block-max WAND — sqrt(tf)/sqrt(dl) is monotone
↑tf ↓dl, so the stats-free (max_tf, min_dl) block bound stays admissible;
the idf² stat rides in on the query side from the dictionary's df column.
Entry ``tfidf_vs_slow_identity`` pins the two paths against each other;
entry ``tfidf_topk`` oracles this module against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dhr_spark.operators.topk import score_all, topk


def tfidf_weights(tfs: DataFrame, dls: DataFrame) -> DataFrame:
    """(term, docid, weight): per-match ClassicSimilarity TF-IDF weights.

    ``tfs``: (docid, term, tf);  ``dls``: (docid, dl). N and df are derived
    here (the same tiny aggregates every lexical slow path pays);
    index-backed scoring reads them from the dictionary instead.
    """
    n_docs = dls.count()
    df_stats = tfs.groupBy("term").agg(F.count("*").alias("df"))
    # op order pinned to the WAND kernel's stat·sqrt(tf)/sqrt(dl) so the
    # index path is bit-identical before the 6-decimal round
    idf = F.lit(1.0) + F.log(F.lit(float(n_docs)) / (F.col("df") + F.lit(1.0)))
    w = (idf * idf) * F.sqrt(F.col("tf")) / F.sqrt(F.col("dl"))
    return (
        tfs.join(dls, "docid")
        .join(F.broadcast(df_stats), "term")
        .select("term", "docid", F.round(w, 6).alias("weight"))
    )


def tfidf_topk(
    qtfs: DataFrame,
    tfs: DataFrame,
    dls: DataFrame,
    k: int = 1000,
) -> DataFrame:
    """(qid, docid, rank, score): TF-IDF top-k — the BM25 slow-path plan
    with the ClassicSimilarity weight formula. Duplicate query terms
    contribute qtf times (per-clause summation)."""
    return topk(score_all(qtfs, tfidf_weights(tfs, dls), on="term"), k)
