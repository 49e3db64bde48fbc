"""Native subword tokenization (functions/subword.py).

Contracts: BPE training replays Sennrich et al.'s hand example with the
documented (count DESC, pair ASC) tie-break; encoding follows merge rank
and survives OOV characters; the pandas-UDF paths equal the driver
reference functions row-for-row; WordPiece is BERT's greedy
longest-match (the canonical un/##aff/##able example, whole-word [UNK],
max_chars guard); training guards fire on empty corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.functions.subword import (
    EOW,
    bpe_encode_udf,
    bpe_encode_word,
    bpe_vocab,
    train_bpe,
    wordpiece_encode_udf,
    wordpiece_encode_word,
    word_freqs,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


# Sennrich et al. (2016) corpus: low x5, lower x2, newest x6, widest x3
SENNRICH = ["low " * 5 + "lower " * 2, "newest " * 6 + "widest " * 3]


def test_word_freqs(spark):
    got = {r["word"]: r["n"] for r in word_freqs(_docs(spark, SENNRICH)).collect()}
    assert got == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_bpe_hand_example(spark):
    merges = train_bpe(_docs(spark, SENNRICH), n_merges=4)
    # counts round 1: (e,s)=9 wins (newest+widest); then (es,t)=9,
    # (est,</w>)=9; round 4: (l,o)=7 (low+lower)
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")]


def test_train_bpe_deterministic_tiebreak(spark):
    # "ab" x2: pairs (a,b)=2 and (b,</w>)=2 tie -> lexicographic ASC
    merges = train_bpe(_docs(spark, ["ab ab"]), n_merges=1, min_count=1)
    assert merges == [("a", "b")]


def test_bpe_encode_follows_ranks(spark):
    merges = train_bpe(_docs(spark, SENNRICH), n_merges=10, min_count=2)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    assert bpe_encode_word("newest", ranks) == ["newest" + EOW]
    assert bpe_encode_word("lowest", ranks) == ["low", "est" + EOW]
    # unseen word: partial merges only, OOV chars survive as singletons
    toks = bpe_encode_word("zest", ranks)
    assert toks[0] == "z" and toks[-1].endswith(EOW)
    assert "".join(toks) == "zest" + EOW  # lossless


def test_bpe_udf_matches_driver_reference(spark):
    merges = train_bpe(_docs(spark, SENNRICH), n_merges=10, min_count=2)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    df = _docs(spark, ["Lowest and newest!", "", "widest zest"])
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id", bpe_encode_udf(merges)(F.col("text")).alias("toks")
        ).collect()
    }
    import re

    def ref(text):
        out = []
        for w in re.findall(r"[a-z0-9]+", text.lower()):
            out += bpe_encode_word(w, ranks)
        return out

    for i, t in [(0, "Lowest and newest!"), (1, ""), (2, "widest zest")]:
        assert got[i] == ref(t)
    assert got[1] == []


def test_bpe_vocab(spark):
    docs = _docs(spark, SENNRICH)
    merges = train_bpe(docs, n_merges=3)
    v = bpe_vocab(merges, docs)
    assert "es" in v and "est" in v and "est" + EOW in v and EOW in v
    assert set("lowernsti") < set(v)  # corpus alphabet present


def test_wordpiece_canonical_example():
    vocab = {"un", "##aff", "##able", "aff", "able", "runn", "##ing"}
    assert wordpiece_encode_word("unaffable", vocab) == [
        "un", "##aff", "##able"
    ]
    # longest-match-first: "aff" (verbatim) only legal at position 0
    assert wordpiece_encode_word("affable", vocab) == ["aff", "##able"]
    # unmatchable position collapses the WHOLE word (after un + ##aff the
    # remainder "ordable" has no piece)
    assert wordpiece_encode_word("unaffordable", vocab) == ["[UNK]"]
    assert wordpiece_encode_word("x" * 101, vocab | {"x"}) == ["[UNK]"]


def test_wordpiece_udf(spark):
    vocab = ["un", "##aff", "##able", "low", "##est"]
    df = _docs(spark, ["Unaffable LOWEST", "mystery"])
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id",
            wordpiece_encode_udf(vocab)(F.col("text")).alias("toks"),
        ).collect()
    }
    assert got[0] == ["un", "##aff", "##able", "low", "##est"]
    assert got[1] == ["[UNK]"]


def test_guards(spark):
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(_docs(spark, ["a"]), n_merges=0)
    with pytest.raises(ValueError, match="empty corpus"):
        train_bpe(_docs(spark, ["", "!!!"]), n_merges=1)
