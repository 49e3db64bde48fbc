"""Lucene-compatible text analysis chain, vectorized for Spark.

The reference delegates analysis to Anserini's default English analyzer —
StandardTokenizer > EnglishPossessiveFilter > LowerCase > Stop > PorterStem
(/root/reference/densify/densify_query.py:46,82-84;
/root/reference/densify/output_vector.py:24-31 reads vectors from a Lucene
index built with the same chain). We re-implement that chain deterministically
in pure Python so the engine has NO runtime Lucene dependency; fixtures in
tests/test_analyzer.py freeze the behavior (SURVEY.md §7.4).

Two modes:
  * ``lucene``  — full chain (possessive, stopwords, Porter). Used by the
    real index/query pipeline; verified against the in-repo pandas oracle.
  * ``simple``  — lowercase + [a-z0-9]+ tokenization only. SQL-expressible
    (DuckDB ``string_split_regex``), used for the driver's oracle contract.

Both are exposed as iterator pandas UDFs (Arrow-batched; no per-row Python
crossing the JVM boundary — BASELINE.json input_hint).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from dhr_spark.functions.porter import porter_stem

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (33 words) — the stop set
# Anserini's default analyzer applies.
LUCENE_STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

# StandardTokenizer approximation: runs of word characters (unicode letters,
# digits, underscore removed), keeping intra-word apostrophes for the
# possessive filter to handle.
_TOKEN_RE = re.compile(r"[^\W_]+(?:['’][^\W_]+)*", re.UNICODE)
_POSSESSIVE_RE = re.compile(r"['’][sS]$")

_SIMPLE_RE = re.compile(r"[a-z0-9]+")


# Memoized Porter: stems are per-TYPE, not per-token — a corpus shard sees
# each vocabulary type thousands of times (Zipf), so caching turns the
# analyzer's dominant cost into a dict hit. Bounded to stay executor-safe
# under adversarial vocabularies (Heaps' law keeps real ones far smaller).
_STEM_CACHE: dict[str, str] = {}
_STEM_CACHE_MAX = 1_000_000


def _stem_cached(tok: str) -> str:
    s = _STEM_CACHE.get(tok)
    if s is None:
        if len(_STEM_CACHE) >= _STEM_CACHE_MAX:
            _STEM_CACHE.clear()
        s = _STEM_CACHE[tok] = porter_stem(tok)
    return s


# Whole-pipeline per-RAW-token memo (possessive strip + lowercase +
# apostrophe removal + stop check + stem): the normalization steps cost as
# much as the memoized stem itself per repeated token, and a corpus shard
# sees each surface form thousands of times. ``""`` marks a removed token
# (stopword / cleans to empty) — distinct from a cache miss (absent key).
_NORM_CACHE: dict[str, str] = {}


def _norm_cached(raw: str) -> str:
    s = _NORM_CACHE.get(raw)
    if s is None:
        if len(_NORM_CACHE) >= _STEM_CACHE_MAX:
            _NORM_CACHE.clear()
        tok = _POSSESSIVE_RE.sub("", raw)
        tok = tok.lower().replace("'", "").replace("’", "")
        s = _NORM_CACHE[raw] = (
            "" if not tok or tok in LUCENE_STOPWORDS else _stem_cached(tok)
        )
    return s


def analyze_lucene(text: str) -> list[str]:
    """Full chain: tokenize > de-possessive > lowercase > stop > Porter."""
    if not text:
        return []
    return [s for s in map(_norm_cached, _TOKEN_RE.findall(text)) if s]


def analyze_simple(text: str) -> list[str]:
    """SQL-parity chain: lowercase + [a-z0-9]+ runs (no stop/stem)."""
    if not text:
        return []
    return _SIMPLE_RE.findall(text.lower())


def analyze_lucene_gaps(text: str) -> list:
    """Full chain WITH Lucene position increments: every tokenizer-emitted
    token consumes one slot; removed tokens (stopwords, tokens that clean to
    empty) leave a ``None`` hole. The slot index IS the Lucene position —
    this is how Lucene's StopFilter records increments, so PhraseQuery over
    "new the york" stores new@0/york@2 and the exact phrase "new york" does
    NOT match it, while slop=1 does (Anserini PhraseQuery behavior the
    reference's Lucene backend exposes)."""
    if not text:
        return []
    return [
        (s if s else None)
        for s in map(_norm_cached, _TOKEN_RE.findall(text))
    ]


def analyze_positions(mode: str, text: str) -> list[tuple[int, str]]:
    """(position, term) pairs under ``mode``'s position semantics: gap
    increments for the lucene chain, dense stream indexes for simple (which
    has no removals, so the two coincide)."""
    toks = _GAP_ANALYZERS[mode](text)
    return [(i, t) for i, t in enumerate(toks) if t is not None]


_ANALYZERS = {"lucene": analyze_lucene, "simple": analyze_simple}
_GAP_ANALYZERS = {"lucene": analyze_lucene_gaps, "simple": analyze_simple}


def tokenize_udf(mode: str = "lucene", keep_gaps: bool = False):
    """Iterator-of-series pandas UDF: text -> array<string> tokens.

    ``keep_gaps=True`` preserves Lucene position increments: removed tokens
    (stopwords) stay in the array as NULL slots, so a downstream posexplode
    + NOT NULL filter yields gap-correct (position, term) rows. The simple
    chain removes nothing, so both settings coincide there.

    Iterator form amortizes analyzer setup per Arrow batch stream (the Spark
    equivalent of the reference's per-worker tokenizer instances,
    /root/reference/densify/densify_corpus.py:148-156).
    """
    analyze = (_GAP_ANALYZERS if keep_gaps else _ANALYZERS)[mode]

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda t: analyze(t) if isinstance(t, str) else [])

    return _tok


def simple_tokens_col(col):
    """``simple``-mode tokenization as a pure Column expression (codegen'd,
    zero Python) — used on hot paths where stemming isn't required and by
    the oracle-checked operators. Matches analyze_simple exactly."""
    return F.filter(
        F.split(F.lower(col), r"[^a-z0-9]+"),
        lambda t: t != "",
    )
