"""Frozen fixtures for the full analyzer chain (SURVEY.md F1):
StandardTokenizer-like segmentation > possessive strip > lowercase >
Lucene stopword removal > Porter stem. Plus the simple (SQL-parity) mode.
"""

import pytest

from dhr_spark.functions.analyzer import (
    LUCENE_STOPWORDS,
    analyze_lucene,
    analyze_simple,
)

LUCENE_CASES = [
    ("The quick brown foxes jumped", ["quick", "brown", "fox", "jump"]),
    # stopwords dropped entirely
    ("the and of to a an", []),
    ("Lucene's analyzer", ["lucen", "analyz"]),
    ("state-of-the-art systems", ["state", "art", "system"]),
    ("it was running; they ran fast!", ["run", "ran", "fast"]),
    ("", []),
    ("   ", []),
    ("123 test-cases 45x", ["123", "test", "case", "45x"]),
    ("CAPS MixedCase lower", ["cap", "mixedcas", "lower"]),
    # word-internal apostrophes: kept by tokenizer, stripped after possessive
    ("don't won't can't", ["dont", "wont", "cant"]),
]


def test_of_is_stopword():
    assert "of" in LUCENE_STOPWORDS


@pytest.mark.parametrize("text,expected", LUCENE_CASES[3:])
def test_analyze_lucene(text, expected):
    assert analyze_lucene(text) == expected


def test_analyze_lucene_basic():
    assert analyze_lucene("The quick brown foxes jumped") == [
        "quick", "brown", "fox", "jump"
    ]


def test_stopword_only_query_empty():
    assert analyze_lucene("the and of to a an") == []


def test_possessive():
    assert analyze_lucene("Lucene's analyzer") == ["lucen", "analyz"]


def test_simple_mode():
    assert analyze_simple("Foo  BAR-baz 42!") == ["foo", "bar", "baz", "42"]
    assert analyze_simple("") == []


def test_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from dhr_spark.functions.analyzer import simple_tokens_col, tokenize_udf

    texts = [t for t, _ in LUCENE_CASES] + ["Hello, World's fairs!"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = df.select("text", tokenize_udf("lucene")(F.col("text")).alias("tok")).collect()
    for row in got:
        assert row["tok"] == analyze_lucene(row["text"]), row["text"]
    got2 = df.select("text", simple_tokens_col(F.col("text")).alias("tok")).collect()
    for row in got2:
        assert row["tok"] == analyze_simple(row["text"]), row["text"]


def test_gap_analyzer_properties():
    """analyze_lucene_gaps must agree with analyze_lucene on the emitted
    stems, with one slot per tokenizer token and monotone positions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dhr_spark.functions.analyzer import (
        _TOKEN_RE,
        analyze_lucene,
        analyze_lucene_gaps,
        analyze_positions,
    )

    texts = st.text(
        alphabet=st.sampled_from("abcdefgh THE and of 'str.,!?-\n123"),
        max_size=120,
    )

    @settings(max_examples=300, deadline=None)
    @given(texts)
    def check(t):
        gaps = analyze_lucene_gaps(t)
        assert len(gaps) == len(_TOKEN_RE.findall(t))
        assert [x for x in gaps if x is not None] == analyze_lucene(t)
        pairs = analyze_positions("lucene", t)
        assert [p for p, _ in pairs] == sorted({p for p, _ in pairs})
        assert all(0 <= p < len(gaps) for p, _ in pairs)
        simple_pairs = analyze_positions("simple", t)
        assert [p for p, _ in simple_pairs] == list(range(len(simple_pairs)))

    check()
