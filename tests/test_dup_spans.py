"""Exact-substring span dedup (Lee et al. 2022) — duplicate_spans /
strip_duplicate_spans fixtures and invariants."""

from __future__ import annotations

import pytest

from dhr_spark.operators.dedup import duplicate_spans, strip_duplicate_spans

DOCS = [
    ("a", "one two three four five six seven eight alpha beta"),
    ("b", "zzz one two three four five six seven eight yyy"),
    ("c", "unique words only here nothing repeats at all"),
    ("d", ""),
    ("e", "rep rep rep rep rep rep rep rep rep rep"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def _spans(df):
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in df.collect()
    )


def test_cross_doc_and_within_doc_spans(spark, docs):
    got = _spans(duplicate_spans(docs, n=4))
    # a/b share the 8-token run; e repeats one token 10x (within-doc)
    assert got == [("a", 0, 8, 8), ("b", 1, 9, 8), ("e", 0, 10, 10)]


def test_within_doc_false_drops_self_repeats(spark, docs):
    got = _spans(duplicate_spans(docs, n=4, within_doc=False))
    assert got == [("a", 0, 8, 8), ("b", 1, 9, 8)]


def test_min_len_floor(spark, docs):
    got = _spans(duplicate_spans(docs, n=4, min_len=9))
    assert got == [("e", 0, 10, 10)]
    with pytest.raises(ValueError, match="min_len"):
        duplicate_spans(docs, n=4, min_len=3)


def test_disjoint_gap_produces_two_spans(spark):
    # shared 4-gram at both ends, unique middle -> two separate islands
    d = spark.createDataFrame(
        [
            ("x", "p q r s mid1 mid2 mid3 mid4 mid5 t u v w"),
            ("y", "p q r s other stuff entirely here now t u v w"),
        ],
        "doc_id string, text string",
    )
    got = _spans(duplicate_spans(d, n=4))
    assert got == [
        ("x", 0, 4, 4), ("x", 9, 13, 4),
        ("y", 0, 4, 4), ("y", 9, 13, 4),
    ]


def test_strip_reconstruction(spark, docs):
    rows = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_tokens"], r["text_clean"])
        for r in strip_duplicate_spans(docs, n=4).collect()
    }
    assert rows["a"] == (10, 8, "alpha beta")
    assert rows["b"] == (10, 8, "zzz yyy")
    assert rows["c"] == (8, 0, "unique words only here nothing repeats at all")
    assert rows["d"] == (0, 0, "")
    assert rows["e"] == (10, 10, "")
    # spans are disjoint: dropped mass == sum of span lens == n_tokens - kept
    for did, (nt, nd, clean) in rows.items():
        kept = len(clean.split()) if clean else 0
        assert nt - nd == kept, (did, nt, nd, clean)
