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


def prune_postings_topk(
    postings: DataFrame,
    keep: int,
    avgdl: float,
    k1: float | None = None,
    b: float | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Static index pruning, term-centric top-k variant (Carmel et al.,
    SIGIR 2001): keep only each term's ``keep`` highest-impact postings.

    The 100-TB index-size lever: head terms carry millions of postings of
    which only the highest-weighted can ever reach a top-k result list; a
    term-centric cut bounds EVERY posting list at ``keep`` entries, shrinking
    the index and every query's decode work by the tail mass. Deliberately
    LOSSY — rankings change where a pruned posting would have scored — which
    is why it is an explicit opt-in (build_index_from_docs(prune_per_term=))
    and never the default.

    ``postings``: (term_id, docid, tf, dl). The cut ranks by the round6
    BM25 weight (score DESC, docid ASC — the engine's standard tie-break,
    so the kept set is deterministic and any engine replays it); the weight
    is computed transiently for the DECISION only — emitted rows keep the
    raw (tf, dl) payload, so segments stay stats-free and appends/similarity
    overrides work unchanged. Lists with <= ``keep`` postings pass through
    intact (short-list queries are exact).

    One extra exchange on term_id (the window) — at build time, where the
    segment groupBy shuffles on the same key anyway; AQE typically plans
    both over one exchange.
    """
    from pyspark.sql import Window

    from dhr_spark import B, K1
    from dhr_spark.functions.bm25 import bm25_weight_col, idf_col

    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    k1 = K1 if k1 is None else k1
    b = B if b is None else b
    # idf from the postings themselves (df = list length, N = distinct docs;
    # callers that already hold n_docs — the index builder — pass it in)
    if n_docs is None:
        n_docs = postings.select("docid").distinct().count()
    dfs = postings.groupBy("term_id").agg(F.count("*").alias("_df"))
    w = F.round(
        bm25_weight_col(
            F.col("tf"),
            F.col("dl"),
            idf_col(F.col("_df"), F.lit(n_docs)),
            F.lit(float(avgdl)),
            k1,
            b,
        ),
        6,
    )
    win = Window.partitionBy("term_id").orderBy(
        w.desc(), F.col("docid").asc()
    )
    return (
        postings.join(dfs, "term_id")
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= keep)
        .select("term_id", "docid", "tf", "dl")
    )
