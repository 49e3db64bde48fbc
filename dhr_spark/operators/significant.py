"""Significant-terms aggregation: foreground-vs-background term scoring.

Elasticsearch's ``significant_terms`` aggregation — given a query's hit set
(the *foreground*), rank the terms that are unusually frequent there
relative to the whole corpus (the *background*). This is the standard
"what is this result set about" analytics op (ES significant_terms with the
default JLH heuristic); the reference has no result-set analytics at all
(its retrieval output is ranked ids only, /root/reference/retrieval/
gip_retrieval.py), so this extends the query surface the same way
facet_counts did.

Scoring (ES JLH): with ``f`` = number of foreground docs containing the
term, ``F`` = foreground size, ``b`` = background doc freq, ``B`` = corpus
size,

    jlh = (f/F - b/B) * ((f/F) / (b/B))

i.e. the absolute lift times the relative lift. Only terms with positive
lift qualify, and that gate is evaluated as the INTEGER predicate
``f*B > b*F`` — no float comparison at the cut. The score itself touches
floats through exactly two exactly-rounded integer divisions and one
multiply, in a fixed expression order, so Spark and the DuckDB oracle agree
bit-for-bit (same integer-micros discipline as operators/rm3.py).

Plan shape (scale): the hit set is |Q|·top_hits rows — broadcast it into
the (docid, term) relation (forward index or tokenized corpus scan), so
per-doc term rows for NON-hit docs are pruned at the join and never
shuffle; the (qid, term) aggregation output is bounded by the foreground
vocabulary, not the corpus. Background stats ride in from the |V|-row term
dictionary. At 100 TB the only corpus-scale input is the forward-index
scan itself, filtered by the broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def significant_terms(
    hits: DataFrame,
    doc_terms: DataFrame,
    term_df: DataFrame,
    n_docs: int,
    k: int = 10,
    min_fg: int = 2,
) -> DataFrame:
    """(qid, term, fg, fg_total, bg, score, rank): top-``k`` significant
    terms per query by JLH.

    ``hits``      — (qid, docid): the foreground doc set per query.
    ``doc_terms`` — (docid, term): DISTINCT terms per doc (forward index or
                    exploded token sets; duplicates inflate fg counts).
    ``term_df``   — (term, df): background document frequency.
    ``n_docs``    — background corpus size.
    ``min_fg``    — minimum foreground doc count (ES min_doc_count; the
                    default 2 drops one-hit wonders).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if n_docs <= 0:
        raise ValueError("n_docs must be positive")
    fg_tot = hits.groupBy("qid").agg(
        F.count_distinct("docid").alias("fg_total")
    )
    fg = (
        doc_terms.join(F.broadcast(hits.select("qid", "docid")), "docid")
        .groupBy("qid", "term")
        .agg(F.count_distinct("docid").cast("long").alias("fg"))
        .filter(F.col("fg") >= min_fg)
    )
    scored = (
        fg.join(F.broadcast(fg_tot), "qid")
        .join(term_df.select("term", F.col("df").alias("bg")), "term")
        # positive-lift gate as exact integer arithmetic: f*B > b*F
        .filter(
            F.col("fg") * F.lit(int(n_docs))
            > F.col("bg") * F.col("fg_total")
        )
        .select(
            "qid",
            "term",
            "fg",
            F.col("fg_total").cast("long").alias("fg_total"),
            F.col("bg").cast("long").alias("bg"),
            (
                (
                    (
                        F.col("fg") * F.lit(int(n_docs))
                        - F.col("bg") * F.col("fg_total")
                    ).cast("double")
                    / (F.col("fg_total") * F.lit(int(n_docs))).cast("double")
                )
                * (
                    (F.col("fg") * F.lit(int(n_docs))).cast("double")
                    / (F.col("fg_total") * F.col("bg")).cast("double")
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def rare_terms(
    hits: DataFrame,
    doc_terms: DataFrame,
    term_df: DataFrame,
    max_doc_count: int = 1,
    k: int = 100,
) -> DataFrame:
    """(qid, term, fg, bg, rank): Elasticsearch ``rare_terms`` aggregation
    — the long-tail complement of ``terms``: terms occurring in each
    query's hit set whose BACKGROUND document frequency is at most
    ``max_doc_count``, ordered rarest-first (bg ASC, term ASC), top ``k``.

    Same input relations as significant_terms (hits = (qid, docid),
    doc_terms = DISTINCT (docid, term), term_df = (term, df)); the
    background cutoff pushes into the term_df join before anything
    aggregates, so at 10^9-term dictionaries only the df <= cutoff slice
    ever joins. ES implements this with a CuckooFilter to stay one-pass —
    here the exact distributed join IS one pass, no approximation needed.
    """
    if max_doc_count < 1:
        raise ValueError(f"max_doc_count must be >= 1, got {max_doc_count}")
    if k <= 0:
        raise ValueError("k must be positive")
    rare = term_df.filter(F.col("df") <= int(max_doc_count)).select(
        "term", F.col("df").alias("bg")
    )
    fg = (
        doc_terms.join(rare, "term")
        .join(F.broadcast(hits.select("qid", "docid")), "docid")
        .groupBy("qid", "term")
        .agg(
            F.count_distinct("docid").cast("long").alias("fg"),
            F.first("bg").alias("bg"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("bg").asc(), F.col("term").asc()
    )
    return (
        fg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= int(k))
        .select("qid", "term", "fg", "bg", "rank")
    )
