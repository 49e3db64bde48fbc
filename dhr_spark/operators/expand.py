"""Multi-term query rewrites — Lucene's PrefixQuery / WildcardQuery /
FuzzyQuery / MoreLikeThis re-expressed as dictionary-driven term expansion
feeding the ordinary BM25 scoring plan.

The reference serves its lexical arm through a Lucene/Anserini index
(/root/reference/retrieval/sparse_retrieval.py — SimpleSearcher), whose query
parser supports these multi-term rewrites; this module is their
DataFrame-native twin. Semantics follow Lucene's scoring-boolean rewrite
(TopTermsScoringBooleanQueryRewrite): a pattern expands against the TERM
DICTIONARY (never the corpus), the expansion set is capped at
``max_expansions`` keeping the HIGHEST document-frequency terms (ties by term
string ascending — deterministic across engines), and each surviving term
scores as an ordinary SHOULD clause with query term frequency 1. The
expanded query then runs through the same scoring plan as any other query
(operators/topk.py score_all, or the block-max WAND index path via
Searcher.search_prefix / search_wildcard / search_fuzzy / search_like).

Scale shape: expansion touches only the term dictionary — |V| rows, NOT the
corpus — with one pattern predicate per query (pushdown-friendly filters,
unioned) and a per-qid window capped at ``max_expansions``. At 10^12-turn
scale the dictionary is 10^7-10^8 rows; a per-pattern filter scan of it is
trivial next to the postings traversal the expanded query then performs.

Differences from Lucene, documented deliberately:
  * fuzzy distance is plain Levenshtein (Spark ``levenshtein`` == DuckDB
    ``levenshtein``), not Lucene's Damerau-Levenshtein automaton — a
    transposition costs 2 here, 1 in Lucene.
  * wildcard patterns support ``*`` (any run) and ``?`` (one char) with no
    escape syntax; a leading ``*`` is allowed but (as in Lucene) is the
    expensive form — it forces a full dictionary scan rather than a
    prefix-bounded one.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def wildcard_to_regex(pattern: str) -> str:
    """Anchored regex for a Lucene-style wildcard pattern (* = any run,
    ? = exactly one char); all other characters match literally."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def _cap_expansions(matched: DataFrame, max_expansions: int) -> DataFrame:
    """Keep the top-``max_expansions`` matched terms per qid by document
    frequency (df DESC, term ASC) — Lucene's top-terms rewrite order. The
    window partitions by qid, so the state per group is the expansion set
    itself (bounded), never the dictionary."""
    w = Window.partitionBy("qid").orderBy(F.col("df").desc(), F.col("term").asc())
    return (
        matched.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_expansions)
        .select("qid", "term", F.lit(1).cast("long").alias("qtf"))
    )


def _expand(
    tstats: DataFrame,
    pairs: list[tuple[str, str]],
    pred,
    max_expansions: int,
) -> DataFrame:
    """Union of per-pattern dictionary filters -> capped (qid, term, qtf=1).

    ``tstats`` is the (term, df, ...) dictionary; ``pred(pattern) -> Column``
    builds the match predicate. One filtered scan per pattern: patterns are
    a driver-side list (interactive query rewriting), so literal predicates
    keep everything in whole-stage codegen. A huge stored pattern table
    would instead broadcast-join the dictionary — same output contract.
    """
    parts = [
        tstats.filter(pred(p)).select(
            F.lit(qid).alias("qid"), "term", "df"
        )
        for qid, p in pairs
    ]
    out = parts[0]
    for df_ in parts[1:]:
        out = out.unionByName(df_)
    return _cap_expansions(out, max_expansions)


def expand_prefix(
    tstats: DataFrame, pairs: list[tuple[str, str]], max_expansions: int = 1024
) -> DataFrame:
    """(qid, term, qtf=1): PrefixQuery expansion — terms starting with the
    pattern, capped by df. ``pairs`` = [(qid, prefix)]."""
    return _expand(
        tstats, pairs, lambda p: F.col("term").startswith(p), max_expansions
    )


def expand_wildcard(
    tstats: DataFrame, pairs: list[tuple[str, str]], max_expansions: int = 1024
) -> DataFrame:
    """(qid, term, qtf=1): WildcardQuery expansion (* / ?)."""
    return _expand(
        tstats,
        pairs,
        lambda p: F.col("term").rlike(wildcard_to_regex(p)),
        max_expansions,
    )


def expand_regexp(
    tstats: DataFrame, pairs: list[tuple[str, str]], max_expansions: int = 1024
) -> DataFrame:
    """(qid, term, qtf=1): RegexpQuery expansion — Lucene's RegexpQuery
    rewrite against the term dictionary, same top-df cap as the other
    multi-term rewrites. The pattern is anchored to the whole term (Lucene
    RegexpQuery semantics: the automaton must accept the entire term).

    Regex dialect caveat, documented deliberately: Lucene compiles its own
    ``RegExp`` subset; here the pattern is evaluated by the engine's regex
    (Java regex in Spark, RE2 in the DuckDB oracle). The common core —
    literals, character classes, ``.``, ``*``, ``+``, ``?``, alternation,
    grouping — behaves identically in all three; Lucene extensions like
    ``~`` (complement) and ``<n-m>`` (numeric ranges) are not supported and
    Java-only constructs (lookaround, backrefs) must be avoided for
    oracle-parity."""
    return _expand(
        tstats,
        pairs,
        lambda p: F.col("term").rlike("^(?:" + p + ")$"),
        max_expansions,
    )


def expand_fuzzy(
    tstats: DataFrame,
    pairs: list[tuple[str, str]],
    max_edits: int = 2,
    prefix_len: int = 1,
    max_expansions: int = 50,
) -> DataFrame:
    """(qid, term, qtf=1): FuzzyQuery expansion — terms within plain
    Levenshtein distance ``max_edits`` whose first ``prefix_len`` chars match
    the pattern exactly (Lucene's prefixLength — it bounds the dictionary
    range that must be scanned). Cap keeps highest-df terms, Lucene's
    maxExpansions=50 default."""

    def pred(p: str):
        c = F.levenshtein(F.col("term"), F.lit(p)) <= max_edits
        if prefix_len > 0:
            c = c & (
                F.substring(F.col("term"), 1, prefix_len) == p[:prefix_len]
            )
        return c

    return _expand(tstats, pairs, pred, max_expansions)


def mlt_seed_terms(
    tfs: DataFrame,
    tstats: DataFrame,
    seeds: list[tuple[str, int]],
    max_query_terms: int = 10,
    id_col: str = "docid",
) -> DataFrame:
    """(qid, term, qtf=1): MoreLikeThis query construction — the seed
    document's terms ranked by tf·idf (round to 6 decimals first so the
    ranking ties break identically across engines; then term ASC), top
    ``max_query_terms`` kept (Lucene MoreLikeThis.maxQueryTerms=25 default;
    the interestingness order is the same tf·idf ranking Lucene uses).

    ``tfs`` = (id_col, term, tf) term frequencies; ``tstats`` = (term, df,
    idf) dictionary. Seeds are (qid, seed_docid) pairs — a driver-side list,
    the interactive "find similar" shape. The seed lookup reads only the
    seed documents' tf rows (isin pushdown on the doc id); the (qid, seed)
    mapping broadcasts, so one document may seed several qids."""
    ids = [int(d) for _, d in seeds]
    seed_map = tfs.sparkSession.createDataFrame(
        [(q, int(d)) for q, d in seeds], f"qid string, {id_col} long"
    )
    scored = (
        tfs.filter(F.col(id_col).isin(ids))
        .join(F.broadcast(seed_map), id_col)
        .join(F.broadcast(tstats.select("term", "idf")), "term")
        .withColumn("_s", F.round(F.col("tf") * F.col("idf"), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("_s").desc(), F.col("term").asc())
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_query_terms)
        .select("qid", "term", F.lit(1).cast("long").alias("qtf"))
    )


def exclude_seeds_and_rank(
    scored: DataFrame, seeds: list[tuple[str, int]], k: int
) -> DataFrame:
    """MoreLikeThis self-exclusion: drop each qid's own seed document BEFORE
    ranking (so ranks are dense over the remaining candidates), then the
    standard deterministic top-k."""
    from dhr_spark.operators.topk import topk

    cond = None
    for qid, d in seeds:
        c = (F.col("qid") == qid) & (F.col("docid") == int(d))
        cond = c if cond is None else (cond | c)
    return topk(scored.filter(~cond), k)


def levenshtein_py(a: str, b: str) -> int:
    """Plain Levenshtein, identical to Spark/DuckDB ``levenshtein`` — used by
    the Searcher's driver-side dictionary cache so the index-backed fuzzy
    expansion is bit-equal to the distributed one."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            )
        prev = cur
    return prev[-1]
