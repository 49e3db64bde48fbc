"""Boolean retrieval, metadata-filtered search, and facet counts.

Anserini/Lucene expose Boolean queries (MUST/SHOULD/MUST_NOT), filtered
search, and faceting alongside ranked BM25; the reference only issues ranked
bag-of-words queries (SURVEY.md §2.5), but a drop-in fulltext engine needs
the full surface. All three are pure DataFrame algebra over the (id, term)
posting relation — each clause is a semi/anti join keyed by term, which at
scale is a broadcast of the tiny clause term-set against the streamed
posting scan (never a shuffle of the corpus):

  * ``boolean_match``  — docs satisfying (ALL of ``must``) AND (ANY of
    ``should`` if given) AND (NONE of ``must_not``).
  * ``filtered_topk``  — ranked retrieval over a metadata-predicate subset;
    the predicate is a plain Column, so Catalyst pushes it into the corpus
    scan (partition/row-group pruning on e.g. lang/source/date columns).
  * ``facet_counts``   — per-facet-value hit counts for a query's match set
    (the search-UI sidebar aggregation): one semi-join + one groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dhr_spark.functions.analyzer import simple_tokens_col


def boolean_match(
    docs: DataFrame,
    must: list[str] | None = None,
    should: list[str] | None = None,
    must_not: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_should_match: int = 0,
) -> DataFrame:
    """(id): documents satisfying the Boolean clause set.

    Implemented with array predicates on the per-doc distinct token set —
    zero joins, zero shuffle, whole-stage codegen; Lucene clause semantics
    (MUST = conjunction, SHOULD = at-least-one when present, MUST_NOT =
    exclusion). ``min_should_match`` >= 2 applies Lucene's
    BooleanQuery.setMinimumNumberShouldMatch over the SHOULD terms: a doc
    must contain at least that many DISTINCT should terms (counted with
    ``array_intersect`` on the distinct token set — still zero-shuffle
    column math; the index-backed twin is Searcher.search_syntax's
    ``min_should_match``, operators/wand.py)."""
    if not (must or should or must_not):
        raise ValueError("at least one clause required")
    if min_should_match > len(should or []):
        raise ValueError(
            f"min_should_match={min_should_match} exceeds the "
            f"{len(should or [])} SHOULD terms — unsatisfiable"
        )
    toks = F.array_distinct(simple_tokens_col(F.col(text_col)))
    cond = F.lit(True)
    for t in must or []:
        cond = cond & F.array_contains(toks, t.lower())
    if should:
        if min_should_match >= 2:
            should_arr = F.array(*[F.lit(t.lower()) for t in should])
            cond = cond & (
                F.size(F.array_intersect(toks, should_arr))
                >= min_should_match
            )
        else:
            any_c = F.lit(False)
            for t in should:
                any_c = any_c | F.array_contains(toks, t.lower())
            cond = cond & any_c
    for t in must_not or []:
        cond = cond & ~F.array_contains(toks, t.lower())
    return docs.filter(cond).select(F.col(id_col))


def filtered_topk(
    qtfs: DataFrame,
    postings: DataFrame,
    doc_filter: DataFrame,
    k: int = 1000,
    on: str = "term",
) -> DataFrame:
    """Ranked top-k restricted to ``doc_filter`` (one ``docid`` column).

    The filter applies BEFORE scoring (left_semi on the posting stream), so
    excluded docs cost nothing — the Lucene filter-query contract."""
    from dhr_spark.operators.topk import score_all, topk

    gated = postings.join(
        F.broadcast(doc_filter.select("docid")), "docid", "left_semi"
    )
    return topk(score_all(qtfs, gated, on=on), k)


def facet_counts(
    docs: DataFrame,
    query_terms: list[str],
    facet_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(facet, n_docs): per-facet-value counts of docs matching ANY query
    term — the search-results sidebar aggregation."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = F.array_distinct(simple_tokens_col(F.col(text_col)))
    terms_arr = F.array(*[F.lit(t.lower()) for t in query_terms])
    return (
        docs.filter(F.arrays_overlap(toks, terms_arr))
        .groupBy(F.col(facet_col).alias("facet"))
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
