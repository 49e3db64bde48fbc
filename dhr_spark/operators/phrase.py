"""Positional postings and phrase / proximity matching.

The reference's Lucene backend stores term positions and answers phrase
queries through ``PhraseQuery`` (Anserini's ``SearchCollection`` exposes
them; dhr itself only issues bag-of-words queries — see SURVEY.md §2.5).
A complete fulltext engine needs them, so this module adds the positional
layer Spark-first:

  * ``positional_postings`` — (doc, term, positions[]) rows, the positional
    inverted-index relation. One posexplode + groupBy; positions are stored
    sorted so downstream merges are streaming.
  * ``phrase_match``       — exact consecutive-phrase matching as PURE column
    math: per phrase term i take its 0-based token positions, shift by -i,
    and intersect across terms; each surviving value is a phrase start.
    Zero shuffle, zero Python — whole-stage codegen over the corpus scan.
  * ``proximity_match``    — unordered "all terms within a window of w
    tokens" matching. The minimal covering window starts at some term
    occurrence, so testing every occurrence as a candidate start is exact.

Positions are defined over the ``simple`` analyzer (lowercase ``[a-z0-9]+``
runs, no stop/stem — functions/analyzer.py) so every operator here has an
exact DuckDB twin in ``__spark_entry__.oracle_sql``. The Lucene-chain
analogue would count stopword position increments the same way Lucene does;
the operator shape is identical.

Scale: all three operators are embarrassingly parallel map-side column
expressions (no join, no shuffle); ``positional_postings`` adds the same
single (term)-keyed exchange the TF aggregation already pays. At 100 TB the
phrase scan reads only (id, text) thanks to column pruning.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dhr_spark.functions.analyzer import simple_tokens_col

_SIMPLE_RE = re.compile(r"[a-z0-9]+")


def _phrase_terms(phrase: str) -> list[str]:
    """Client-side analysis of the phrase with the same simple chain."""
    terms = _SIMPLE_RE.findall(phrase.lower())
    if not terms:
        raise ValueError(f"phrase {phrase!r} has no indexable terms")
    return terms


def term_positions(toks: Column, term: str) -> Column:
    """0-based positions of ``term`` in the token array (sorted, distinct).

    Pure column math: tag each slot with its index or -1, drop the -1s.
    """
    tagged = F.transform(
        toks, lambda t, i: F.when(t == F.lit(term), i).otherwise(F.lit(-1))
    )
    return F.array_remove(tagged, -1)


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, positions array<int>, tf) — the positional index relation.

    positions is sorted ascending (posexplode emits in order; collect_list
    order is then re-pinned with sort_array for determinism under AQE).
    """
    toks = simple_tokens_col(F.col(text_col))
    exploded = docs.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "term")
    )
    return exploded.groupBy(id_col, "term").agg(
        F.sort_array(F.collect_list("pos")).alias("positions"),
        F.count("*").cast("long").alias("tf"),
    )


def phrase_starts(toks: Column, terms: list[str]) -> Column:
    """Array of phrase start positions: ∩_i (positions(term_i) - i).

    array_intersect dedups, which is lossless here — positions within one
    list are already distinct. Repeated phrase terms (``"the the"``) work:
    each occurrence list is shifted independently.
    """
    def _shift_by(i: int):
        # closure, NOT a default arg: a 2-param lambda would make PySpark
        # pass the array index as the second argument instead of the shift
        return lambda p: p - F.lit(i)

    starts = term_positions(toks, terms[0])
    for i, t in enumerate(terms[1:], start=1):
        shifted = F.transform(term_positions(toks, t), _shift_by(i))
        starts = F.array_intersect(starts, shifted)
    return F.array_sort(starts)


def phrase_match(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_matches, first_pos) for docs containing ``phrase`` verbatim
    (consecutive tokens under the simple analyzer)."""
    terms = _phrase_terms(phrase)
    toks = simple_tokens_col(F.col(text_col))
    starts = phrase_starts(toks, terms)
    return (
        docs.select(
            F.col(id_col),
            F.size(starts).cast("long").alias("n_matches"),
            F.try_element_at(starts, F.lit(1)).cast("long").alias("first_pos"),
        )
        .filter(F.col("n_matches") > 0)
    )


def span_first_match(
    docs: DataFrame,
    phrase: str,
    end: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_matches, first_pos): Lucene SpanFirstQuery — the phrase (or
    single term) must END at position <= ``end``. A span starting at s over
    an n-term phrase ends at s+n (Lucene span end is exclusive), so the
    accept condition is start <= end - n. Zero-shuffle column math over the
    same phrase_starts machinery as exact phrase match."""
    terms = _phrase_terms(phrase)
    limit = int(end) - len(terms)
    toks = simple_tokens_col(F.col(text_col))
    starts = F.filter(phrase_starts(toks, terms), lambda s: s <= F.lit(limit))
    return (
        docs.select(
            F.col(id_col),
            F.size(starts).cast("long").alias("n_matches"),
            F.try_element_at(starts, F.lit(1)).cast("long").alias("first_pos"),
        )
        .filter(F.col("n_matches") > 0)
    )


def span_not_match(
    docs: DataFrame,
    include: str,
    exclude: str,
    pre: int = 0,
    post: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_matches, first_pos): Lucene SpanNotQuery — occurrences of the
    ``include`` phrase whose span does NOT overlap any occurrence of the
    ``exclude`` phrase, with the exclusion span widened by ``pre`` tokens
    before and ``post`` tokens after (SpanNotQuery(include, exclude, pre,
    post) semantics).

    Span ends are exclusive: an n-term include at start s occupies
    [s, s+n); an m-term exclude at e occupies [e, e+m). Overlap with the
    widened window means  e+m-1 >= s-pre  AND  e <= s+n-1+post. A doc with
    include matches but every one excluded drops out entirely (Lucene
    returns no span). Zero-shuffle column math over the same
    phrase_starts machinery as exact phrase match."""
    inc_terms = _phrase_terms(include)
    exc_terms = _phrase_terms(exclude)
    if pre < 0 or post < 0:
        raise ValueError(f"pre/post must be >= 0, got pre={pre} post={post}")
    n, m = len(inc_terms), len(exc_terms)
    toks = simple_tokens_col(F.col(text_col))
    inc_starts = phrase_starts(toks, inc_terms)
    exc_starts = phrase_starts(toks, exc_terms)

    def _survives(s: Column) -> Column:
        return ~F.exists(
            exc_starts,
            lambda e: (e + F.lit(m - 1) >= s - F.lit(pre))
            & (e <= s + F.lit(n - 1 + post)),
        )

    kept = F.filter(inc_starts, _survives)
    return (
        docs.select(
            F.col(id_col),
            F.size(kept).cast("long").alias("n_matches"),
            F.try_element_at(kept, F.lit(1)).cast("long").alias("first_pos"),
        )
        .filter(F.col("n_matches") > 0)
    )


def span_or_match(
    docs: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_matches, first_pos): Lucene SpanOrQuery — the union of the
    member phrases' spans. n_matches counts distinct span STARTS across
    members (two members matching at the same start collapse, as
    SpanOrQuery's span enumeration dedups identical spans of equal start
    when lengths tie; distinct-start is the deterministic cross-engine
    contract here and is pinned by the oracle); first_pos is the earliest.
    Zero-shuffle column math over the same phrase_starts machinery."""
    if not phrases:
        raise ValueError("span_or needs at least one phrase")
    toks = simple_tokens_col(F.col(text_col))
    arrs = [phrase_starts(toks, _phrase_terms(p)) for p in phrases]
    merged = F.array_sort(F.array_distinct(F.flatten(F.array(*arrs))))
    return (
        docs.select(
            F.col(id_col),
            F.size(merged).cast("long").alias("n_matches"),
            F.try_element_at(merged, F.lit(1)).cast("long").alias("first_pos"),
        )
        .filter(F.col("n_matches") > 0)
    )


def prefix_positions(toks: Column, terms: list[str]) -> Column:
    """0-based positions of ANY member of ``terms`` in the token array.

    Positions across distinct members never collide (one token per slot),
    so the result is distinct without an explicit dedup. Pure column math,
    same shape as term_positions."""
    tagged = F.transform(
        toks,
        lambda t, i: F.when(t.isin(list(terms)), i).otherwise(F.lit(-1)),
    )
    return F.array_remove(tagged, -1)


def phrase_prefix_match(
    docs: DataFrame,
    phrase: str,
    max_expansions: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_matches, first_pos): ES ``match_phrase_prefix`` / Lucene
    ``MultiPhraseQuery`` with a prefix-expanded LAST slot — every analyzed
    term but the last must match exactly at its position; the last term is
    a PREFIX completed by up to ``max_expansions`` vocabulary terms in
    dictionary (term ASC) order, Lucene's TermsEnum expansion order. A
    start position qualifies when the fixed slots line up and ANY
    expansion term sits at the final slot; n_matches counts distinct
    qualifying starts (two different completions at the same start are one
    phrase occurrence, as MultiPhraseQuery scores them).

    The expansion set is resolved from the corpus vocabulary with one
    bounded job (distinct matching terms, globally sorted, LIMIT
    max_expansions — never more than max_expansions rows move); matching
    itself is then the same zero-shuffle column math as phrase_match. At
    100 TB the vocabulary scan is the dictionary-sized prepass the index
    path (Searcher.search_phrase_prefix) replaces with a dictionary read.

    Reference anchor: Lucene MultiPhraseQuery / ES match_phrase_prefix
    (max_expansions default 50); castorini/dhr's Lucene backend exposes it
    through Anserini's query parser.
    """
    terms = _phrase_terms(phrase)
    prefix, fixed = terms[-1], terms[:-1]
    toks_all = simple_tokens_col(F.col(text_col))
    exps = [
        r["term"]
        for r in (
            docs.select(F.explode(toks_all).alias("term"))
            .filter(F.col("term").startswith(prefix))
            .distinct()
            .orderBy("term")
            .limit(max_expansions)
            .collect()
        )
    ]
    if not exps:
        # no vocabulary term completes the prefix -> nothing can match
        return (
            docs.select(
                F.col(id_col),
                F.lit(0).cast("long").alias("n_matches"),
                F.lit(None).cast("long").alias("first_pos"),
            ).filter(F.lit(False))
        )
    toks = simple_tokens_col(F.col(text_col))
    last = F.transform(
        prefix_positions(toks, exps),
        lambda p: p - F.lit(len(terms) - 1),
    )
    if fixed:
        starts = F.array_intersect(phrase_starts(toks, fixed), last)
    else:
        starts = last
    starts = F.array_sort(starts)
    return (
        docs.select(
            F.col(id_col),
            F.size(starts).cast("long").alias("n_matches"),
            F.try_element_at(starts, F.lit(1)).cast("long").alias("first_pos"),
        )
        .filter(F.col("n_matches") > 0)
    )


def proximity_match(
    docs: DataFrame,
    terms_raw: list[str],
    window: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, window_start) for docs where ALL terms co-occur within any
    ``window``-token span [s, s+window). Unordered (bag proximity).

    window_start is the smallest valid span start. Candidate starts are
    every occurrence of every term — the minimal covering window begins at
    one of them, so the test is exact, and the per-doc cost is
    O(occurrences² · |terms|) in pure codegen (no shuffle).
    """
    terms = [t for raw in terms_raw for t in _SIMPLE_RE.findall(raw.lower())]
    if not terms:
        raise ValueError("no indexable terms")
    toks = simple_tokens_col(F.col(text_col))
    pos_arrays = [term_positions(toks, t) for t in terms]
    all_pos = F.array_sort(F.array_distinct(F.flatten(F.array(*pos_arrays))))

    def _in_window(pa: Column, s: Column) -> Column:
        # bind s via closure (a default arg would change the visible lambda
        # arity and break PySpark's higher-order-function resolution)
        return F.exists(pa, lambda q: (q >= s) & (q < s + F.lit(window)))

    def covers(s: Column) -> Column:
        ok = F.lit(True)
        for pa in pos_arrays:
            ok = ok & _in_window(pa, s)
        return ok

    valid = F.filter(all_pos, covers)
    return (
        docs.select(
            F.col(id_col),
            F.try_element_at(valid, F.lit(1)).cast("long").alias("window_start"),
        )
        .filter(F.col("window_start").isNotNull())
    )


def sloppy_anchors(
    pos_cols: list[Column], slop: int, base_span: int | None = None
) -> Column:
    """Anchor positions of ordered within-window matches (Lucene-slop
    analogue): anchors p0 from pos_cols[0] such that positions
    p0 < p1 < ... < p_{k-1} exist (p_i from pos_cols[i]) with total span
    p_{k-1} - p0 <= base_span + slop. ``base_span`` defaults to k-1 (a
    dense phrase); a gapped phrase (stopword position increments) passes
    its own expected span. With the default, slop=0 degenerates to the
    exact consecutive phrase.

    Built as a nested-exists chain (exhaustive, so existence is exact);
    pure codegen, expression depth linear in k — intended for the short
    phrases real queries carry.
    """
    k = len(pos_cols)
    span = (k - 1 if base_span is None else base_span) + slop

    def chain(i: int, prev: Column, p0: Column) -> Column:
        if i == k:
            return F.lit(True)
        return F.exists(
            pos_cols[i],
            lambda q: (q > prev) & (q <= p0 + F.lit(span)) & chain(i + 1, q, p0),
        )

    if k == 1:
        return pos_cols[0]
    return F.filter(pos_cols[0], lambda p0: chain(1, p0, p0))


def phrase_match_sloppy(
    docs: DataFrame,
    phrase: str,
    slop: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_matches, first_pos): sloppy phrase over the corpus text —
    anchors where the phrase terms occur in order within a window of
    len+slop-1 positions (sloppy_anchors). Zero-shuffle codegen, exact
    DuckDB twin in __spark_entry__."""
    terms = _phrase_terms(phrase)
    toks = simple_tokens_col(F.col(text_col))
    anchors = F.array_sort(
        sloppy_anchors([term_positions(toks, t) for t in terms], slop)
    )
    return (
        docs.select(
            F.col(id_col),
            F.size(anchors).cast("long").alias("n_matches"),
            F.try_element_at(anchors, F.lit(1)).cast("long").alias("first_pos"),
        )
        .filter(F.col("n_matches") > 0)
    )


def best_snippet(
    docs: DataFrame,
    terms_raw: list[str],
    width: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, start, n_hits, snippet): the ``width``-token window covering the
    most DISTINCT query terms (ties → earliest window), i.e. result
    highlighting / keyword-in-context extraction.

    Candidate starts are term-occurrence positions (the optimal window
    starts at one — shifting right past a hit can only lose it), so the
    selection is exact and stays zero-shuffle column math: per candidate
    start s count terms with an occurrence in [s, s+width), then
    array_max over (hits, -s) structs picks hits DESC, s ASC.
    """
    terms = list(
        dict.fromkeys(
            t for raw in terms_raw for t in _SIMPLE_RE.findall(raw.lower())
        )
    )
    if not terms:
        raise ValueError("no indexable terms")
    toks = simple_tokens_col(F.col(text_col))
    pos_arrays = [term_positions(toks, t) for t in terms]
    all_pos = F.array_sort(F.array_distinct(F.flatten(F.array(*pos_arrays))))

    def hits(s):
        n = F.lit(0)
        for pa in pos_arrays:
            n = n + F.exists(
                pa, lambda q: (q >= s) & (q < s + F.lit(width))
            ).cast("int")
        return n

    best = F.array_max(
        F.transform(all_pos, lambda s: F.struct(hits(s).alias("h"), (-s).alias("ns")))
    )
    start = (-best["ns"]).cast("long")
    return (
        docs.select(
            F.col(id_col),
            start.alias("start"),
            best["h"].cast("long").alias("n_hits"),
            F.array_join(
                F.slice(toks, start.cast("int") + 1, width), " "
            ).alias("snippet"),
        )
        .filter(F.col("n_hits").isNotNull())
    )


def snippet_struct_udf(width: int = 10):
    """Arrow-batched row kernel twin of ``best_snippet`` for POST-retrieval
    rendering: (text, query) -> struct(start, n_hits, snippet), identical
    window-selection semantics (most distinct query terms, ties earliest).

    ``best_snippet`` is the corpus-scan form (zero-shuffle column math,
    DuckDB-oracled); this kernel exists for the index-backed highlight path
    (Searcher.highlight), where the input is only the fetched top-k rows —
    k x |Q| rows total — so a per-row Python loop inside one Arrow batch is
    the right shape, not a liability. Rows whose text contains none of the
    query terms get (null, 0, null) instead of being dropped: a BM25 hit
    can match via stemming while the raw-token window misses (the same
    analyzer-mismatch Lucene's highlighter has)."""

    @F.pandas_udf("start long, n_hits long, snippet string")
    def _snip(text: pd.Series, query: pd.Series) -> pd.DataFrame:
        rows = []
        for t, q in zip(text, query):
            toks = _SIMPLE_RE.findall((t or "").lower())
            terms = list(dict.fromkeys(_SIMPLE_RE.findall((q or "").lower())))
            occ = {}
            for i, tok in enumerate(toks):
                if tok in terms:
                    occ.setdefault(tok, []).append(i)
            starts = sorted({i for ps in occ.values() for i in ps})
            if not starts:
                rows.append((None, 0, None))
                continue
            best = max(
                ((sum(1 for ps in occ.values()
                      if any(s <= p < s + width for p in ps)), -s), s)
                for s in starts
            )[1]
            hits = sum(
                1 for ps in occ.values()
                if any(best <= p < best + width for p in ps)
            )
            rows.append((best, hits, " ".join(toks[best:best + width])))
        return pd.DataFrame(rows, columns=["start", "n_hits", "snippet"])

    return _snip


def snippet_fragments(
    docs: DataFrame,
    terms_raw: list[str],
    width: int = 10,
    n_fragments: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, frag, start, n_hits, snippet): up to ``n_fragments``
    NON-OVERLAPPING ``width``-token windows per doc, each covering the
    most distinct query terms among the remaining candidates (ties ->
    earliest) — the ES unified-highlighter ``number_of_fragments`` shape;
    ``n_fragments=1`` degenerates to best_snippet's selection.

    The greedy is unrolled ``n_fragments`` times as pure column math (no
    shuffle, no recursion): candidate starts are term occurrences, each
    pick minimizes the integer key

        key(s) = (|terms| − distinct_terms_covered(s)) · 1_000_000 + s

    over candidates not overlapping prior picks, so a DuckDB oracle
    replays the selection with plain integer list_sort — no struct
    comparisons, no recursive CTE. Documents are bounded at 1M tokens by
    the key encoding (far beyond any transcript turn; the bound is a
    documented contract, not a silent truncation).
    """
    if n_fragments < 1:
        raise ValueError(f"n_fragments must be >= 1, got {n_fragments}")
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    terms = list(dict.fromkeys(
        t for raw in terms_raw for t in _SIMPLE_RE.findall(raw.lower())
    ))
    if not terms:
        raise ValueError("no indexable terms")
    L = len(terms)
    toks = simple_tokens_col(F.col(text_col))
    pos_arrays = [term_positions(toks, t) for t in terms]
    cands = F.array_sort(F.array_distinct(F.flatten(F.array(*pos_arrays))))

    def score(s: Column) -> Column:
        sc = F.lit(0)
        for pa in pos_arrays:
            sc = sc + F.when(
                F.exists(pa, lambda q: (q >= s) & (q < s + F.lit(width))),
                F.lit(1),
            ).otherwise(F.lit(0))
        return sc

    def _valid_fn(prior: tuple):
        # factory closure, NOT a default arg: a 2-param lambda would make
        # PySpark pass the array index as the second argument (HOF arity)
        def valid(s: Column) -> Column:
            ok = F.lit(True)
            for p in prior:
                c = F.pmod(p, F.lit(1_000_000))
                ok = ok & (
                    (s + F.lit(width) <= c) | (s >= c + F.lit(width))
                )
            return ok

        return valid

    picks: list[Column] = []
    for _ in range(n_fragments):
        avail = F.filter(cands, _valid_fn(tuple(picks)))
        key = F.try_element_at(
            F.array_sort(
                F.transform(
                    avail,
                    lambda s: (
                        (F.lit(L) - score(s)).cast("long")
                        * F.lit(1_000_000)
                        + s
                    ),
                )
            ),
            F.lit(1),
        )
        picks.append(key)

    frag = F.posexplode(
        F.filter(F.array(*picks), lambda k: k.isNotNull())
    )
    start = F.pmod(F.col("_key"), F.lit(1_000_000)).cast("long")
    n_hits = (F.lit(L) - (F.col("_key") / F.lit(1_000_000)).cast("long")).cast("long")
    return (
        docs.select(F.col(id_col), F.col(text_col), frag.alias("_f", "_key"))
        .select(
            F.col(id_col),
            (F.col("_f") + 1).cast("int").alias("frag"),
            start.alias("start"),
            n_hits.alias("n_hits"),
            F.array_join(
                F.slice(
                    simple_tokens_col(F.col(text_col)),
                    start.cast("int") + 1,
                    width,
                ),
                " ",
            ).alias("snippet"),
        )
    )


def snippet_frags_udf(width: int = 10, n_fragments: int = 2):
    """Arrow-batched row kernel twin of ``snippet_fragments`` for the
    index-backed multi-fragment highlight (Searcher.highlight with
    n_fragments > 1) — same greedy selection (integer key: fewest missed
    terms, then earliest start; non-overlapping windows), applied to only
    the fetched top-k rows. Rows with no raw-token hits emit an empty
    array (the analyzer-mismatch case snippet_struct_udf documents)."""

    @F.pandas_udf(
        "array<struct<frag: int, start: long, n_hits: long, snippet: string>>"
    )
    def _frags(text: pd.Series, query: pd.Series) -> pd.Series:
        out = []
        for t, q in zip(text, query):
            toks = _SIMPLE_RE.findall((t or "").lower())
            terms = list(dict.fromkeys(_SIMPLE_RE.findall((q or "").lower())))
            occ = {}
            for i, tok in enumerate(toks):
                if tok in terms:
                    occ.setdefault(tok, []).append(i)
            cands = sorted({i for ps in occ.values() for i in ps})
            picks: list[tuple] = []
            for f in range(n_fragments):
                avail = [
                    s for s in cands
                    if all(s + width <= c or s >= c + width
                           for _, c, _ in picks)
                ]
                if not avail:
                    break
                best = min(
                    avail,
                    key=lambda s: (
                        -sum(1 for ps in occ.values()
                             if any(s <= p < s + width for p in ps)),
                        s,
                    ),
                )
                hits = sum(
                    1 for ps in occ.values()
                    if any(best <= p < best + width for p in ps)
                )
                picks.append(
                    (f + 1, best, hits)
                )
            out.append([
                (f, s, h, " ".join(toks[s:s + width]))
                for f, s, h in picks
            ])
        return pd.Series(out)

    return _frags
