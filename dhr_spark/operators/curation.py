"""Named LLM-corpus curation rules: C4 line cleaning + Gopher quality flags.

The two most-cited rule stacks a web-scale training-data pipeline runs
before any model-based filtering:

  * C4 (Raffel et al., JMLR 2020 §2.2): line-level cleaning — keep only
    lines that end in terminal punctuation and have ≥ 5 words, drop lines
    mentioning javascript; drop whole pages with < 3 sentences, any
    "lorem ipsum", or a '{'. (The bad-words-list page rule is omitted —
    no list ships here; plug one into ``extra_page_blocklist``.)
  * Gopher (Rae et al., 2021, Table A1): document-shape thresholds — word
    count in [50, 100k], mean word length in [3, 10], symbol-to-word
    ratio ≤ 0.1 (# and ellipses), ≤ 90% of lines bullet-led, ≤ 30% of
    lines ellipsis-ended, ≥ 80% of words containing an alphabetic
    character, and ≥ 2 of 8 designated English stop words present.

Everything is pure column math over line/word arrays (split + lambda
filters — no Python UDF anywhere), and every threshold comparison is
EXACT INTEGER arithmetic: "mean word length ≥ 3" is evaluated as
3·n_words ≤ total_chars, never as a float division, so the keep flags
hash identically across Spark and the DuckDB oracles (the repo-wide
integer-micros lesson — see textstats.quality_scores — applied at the
design stage instead of retrofitted).

This complements textstats.quality_scores (a cheap [0,1] composite for
ranking); these are the published named RULES with their exact published
thresholds, emitting both the raw counters (auditability: why was this
doc dropped?) and the boolean flags. At 100 TB both run as a single
narrow projection over the text column — no shuffle, no UDF, fully
whole-stage-codegen.

Reference scope note: castorini/dhr consumes already-curated corpora
(MS MARCO/BEIR loaders, tevatron/datasets/dataset.py); corpus curation is
part of this repo's LLM-pipeline extension surface, not a reference port.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's designated stop words (Rae et al. 2021, word-count rule)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

C4_MIN_WORDS_PER_LINE = 5
C4_MIN_SENTENCES = 3


def _lines(text: Column) -> Column:
    """Trimmed, non-empty lines. The trim lambda must be explicit:
    ``F.transform(arr, F.trim)`` binds transform's (element, index) pair to
    trim's two-parameter (str, trimStr) form — the index becomes the trim
    CHARACTER SET and whitespace survives."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "",
    )


def _words(s: Column) -> Column:
    """Non-empty single-space-split words (split + filter keeps the
    semantics replicable in any engine without regex dialect drift)."""
    return F.filter(F.split(s, " "), lambda w: w != "")


def _count_char(s: Column, chars: str) -> Column:
    """Occurrences of any char in ``chars`` via a replace chain (identical
    primitive exists in every SQL engine, unlike translate/regexp)."""
    stripped = s
    for c in chars:
        stripped = F.replace(stripped, F.lit(c), F.lit(""))
    return (F.length(s) - F.length(stripped)).cast("long")


def c4_line_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    extra_page_blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, n_lines, n_kept_lines, kept_chars, n_sentences, has_lorem,
    has_brace, c4_keep): the C4 cleaning pass as one projection.

    A line is KEPT iff it ends in terminal punctuation (., !, ?, or a
    closing double quote), has ≥ C4_MIN_WORDS_PER_LINE words, and does not
    mention javascript (case-insensitive). The PAGE is kept iff the kept
    lines carry ≥ C4_MIN_SENTENCES sentence terminators and the raw text
    has neither "lorem ipsum" nor '{' (nor any ``extra_page_blocklist``
    phrase, lowercased substring match)."""
    lines = _lines(F.col("text"))
    kept = F.filter(
        lines,
        lambda ln: (
            F.substring(ln, -1, 1).isin(".", "!", "?", '"')
            & (F.size(_words(ln)) >= C4_MIN_WORDS_PER_LINE)
            & ~F.lower(ln).contains("javascript")
        ),
    )
    kept_text = F.array_join(kept, "\n")
    low = F.lower(F.col("text"))
    has_lorem = low.contains("lorem ipsum")
    has_brace = F.col("text").contains("{")
    blocked = has_lorem | has_brace
    for phrase in extra_page_blocklist:
        blocked = blocked | low.contains(phrase.lower())
    n_sent = _count_char(kept_text, ".!?")
    return docs.select(
        id_col,
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.length(kept_text).cast("long").alias("kept_chars"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        ((n_sent >= C4_MIN_SENTENCES) & ~blocked).alias("c4_keep"),
    )


def gopher_quality_flags(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, counters..., flags..., gopher_keep): Gopher Table-A1 rules.

    Counters are exact integers; each flag is an integer-arithmetic form
    of the published threshold (see module doc). gopher_keep is the AND
    of all seven flags."""
    words = _words(F.col("text"))
    lines = _lines(F.col("text"))
    n_words = F.size(words).cast("long")
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    # symbols: '#' plus both ellipsis forms ('...' counted via the
    # replace-chain on the 3-char string, '…' as a char)
    n_hash = _count_char(F.col("text"), "#")
    dots = F.col("text")
    n_dots3 = (
        (F.length(dots) - F.length(F.replace(dots, F.lit("..."), F.lit(""))))
        / 3
    ).cast("long")
    n_uni_ell = _count_char(F.col("text"), "…")
    n_symbols = (n_hash + n_dots3 + n_uni_ell).cast("long")
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    low_words = F.transform(words, F.lower)
    n_stop_distinct = F.size(
        F.array_intersect(
            low_words, F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
        )
    ).cast("long")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.substring(ln, 1, 1).isin("-", "*", "•"),
        )
    ).cast("long")
    n_ell_lines = F.size(
        F.filter(
            lines,
            lambda ln: ln.endswith("...") | ln.endswith("…"),
        )
    ).cast("long")
    f_words = (n_words >= 50) & (n_words <= 100_000)
    f_mean_len = (3 * n_words <= total_chars) & (total_chars <= 10 * n_words)
    f_symbol = 10 * n_symbols <= n_words
    f_bullet = 10 * n_bullet <= 9 * n_lines
    f_ellipsis = 10 * n_ell_lines <= 3 * n_lines
    f_alpha = 5 * n_alpha_words >= 4 * n_words
    f_stop = n_stop_distinct >= 2
    return docs.select(
        id_col,
        n_words.alias("n_words"),
        total_chars.alias("word_chars"),
        n_symbols.alias("n_symbols"),
        n_alpha_words.alias("n_alpha_words"),
        n_stop_distinct.alias("n_stop_distinct"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ell_lines.alias("n_ellipsis_lines"),
        f_words.alias("f_word_count"),
        f_mean_len.alias("f_mean_word_len"),
        f_symbol.alias("f_symbol_ratio"),
        f_bullet.alias("f_bullet_lines"),
        f_ellipsis.alias("f_ellipsis_lines"),
        f_alpha.alias("f_alpha_words"),
        f_stop.alias("f_stop_words"),
        (
            f_words & f_mean_len & f_symbol & f_bullet & f_ellipsis
            & f_alpha & f_stop
        ).alias("gopher_keep"),
    )


def curation_pipeline(
    docs: DataFrame,
    id_col: str = "doc_id",
    holdout_pct: int = 10,
) -> DataFrame:
    """(doc_id, c4_keep, gopher_keep, is_exact_dup, split, keep): the
    end-to-end cheap-curation pass a 100-TB pipeline runs first — C4 line
    cleaning + Gopher shape rules + exact dedup (first doc_id per md5(text)
    survives) + deterministic train/holdout hash split — composed as ONE
    DataFrame so Catalyst fuses the three projections into a single scan
    with one window for the dedup.

    keep = c4_keep ∧ gopher_keep ∧ ¬is_exact_dup. The split column rides
    along (never gates keep): downstream stages route, the curation layer
    only annotates. Every upstream operator stays individually oracled;
    this entry pins the composition itself."""
    from pyspark.sql import Window

    from dhr_spark.operators.textstats import tokhash60

    c4 = c4_line_stats(docs, id_col=id_col).select(id_col, "c4_keep")
    gopher = gopher_quality_flags(docs, id_col=id_col).select(
        id_col, "gopher_keep"
    )
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy(F.col(id_col))
    # same portable 60-bit id hash as textstats.hash_split — split
    # assignments agree with the standalone sample_split operator
    bucket = tokhash60(F.col(id_col).cast("string")) % 100
    dup = docs.select(
        id_col,
        (F.row_number().over(w) > 1).alias("is_exact_dup"),
        F.when(bucket < holdout_pct, F.lit("holdout"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    return (
        c4.join(gopher, id_col)
        .join(dup, id_col)
        .select(
            id_col,
            "c4_keep",
            "gopher_keep",
            "is_exact_dup",
            "split",
            (
                F.col("c4_keep") & F.col("gopher_keep")
                & ~F.col("is_exact_dup")
            ).alias("keep"),
        )
    )
