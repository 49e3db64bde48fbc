"""Positional/phrase operators and RM3 expansion — hand-computed expectations
(the driver-oracle rehearsal in test_entry_oracle.py covers the corpus-scale
DuckDB parity; these pin the operator semantics on adversarial micro-cases)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.operators import phrase as PH
from dhr_spark.operators import rm3 as R3


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "slow hash batch x slow hash batch"),
        (2, "hash slow batch"),            # terms present, wrong order
        (3, "Slow, HASH batch!"),          # punctuation/case normalized away
        (4, "slow x x x hash y batch"),    # spread out (proximity only)
        (5, ""),                           # empty
        (6, "slow slow hash"),             # repeated leading term
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_positional_postings(spark, tiny):
    rows = {
        (r["doc_id"], r["term"]): (list(r["positions"]), r["tf"])
        for r in PH.positional_postings(tiny).collect()
    }
    assert rows[(1, "slow")] == ([0, 4], 2)
    assert rows[(1, "hash")] == ([1, 5], 2)
    assert rows[(6, "slow")] == ([0, 1], 2)
    assert (5, "") not in rows  # empty doc contributes nothing


def test_phrase_match_exact(spark, tiny):
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in PH.phrase_match(tiny, "slow hash batch").collect()
    }
    # doc1 matches twice (starts 0 and 4); doc3 via normalization; doc2/4 don't
    assert got == {1: (2, 0), 3: (1, 0)}


def test_phrase_match_two_term_overlapping(spark, tiny):
    got = {
        r["doc_id"]: r["n_matches"]
        for r in PH.phrase_match(tiny, "slow hash").collect()
    }
    assert got == {1: 2, 3: 1, 6: 1}  # doc6: "slow slow hash" → start 1 only
    first = {
        r["doc_id"]: r["first_pos"]
        for r in PH.phrase_match(tiny, "slow hash").collect()
    }
    assert first[6] == 1


def test_phrase_match_rejects_empty(spark, tiny):
    with pytest.raises(ValueError):
        PH.phrase_match(tiny, "!!! ...")


def test_proximity_match_window(spark, tiny):
    # window=7 covers doc4's spread (positions 0,4,6); window=3 does not
    wide = {r["doc_id"]: r["window_start"]
            for r in PH.proximity_match(tiny, ["slow", "hash", "batch"], 7).collect()}
    assert set(wide) == {1, 2, 3, 4}
    assert wide[4] == 0
    tight = {r["doc_id"] for r in
             PH.proximity_match(tiny, ["slow", "hash", "batch"], 3).collect()}
    assert tight == {1, 2, 3}  # unordered: doc2 "hash slow batch" qualifies


def test_phrase_zero_shuffle_plan(spark, tiny):
    # phrase matching must stay a map-side scan: no exchange in the plan
    plan = PH.phrase_match(tiny, "slow hash")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_rm3_expand_hand_case(spark):
    # one query, one feedback doc: rm1 mass concentrates on the doc's terms
    qtfs = spark.createDataFrame([("q1", "apple", 1)], "qid string, term string, qtf int")
    fp = spark.createDataFrame(
        [("q1", 10, 1, 2.0)], "qid string, docid int, rank int, score double"
    )
    doc_tfs = spark.createDataFrame(
        [(10, "apple", 2), (10, "pear", 2)], "docid int, term string, tf int"
    )
    dls = spark.createDataFrame([(10, 4)], "docid int, dl int")
    out = {
        r["term"]: r["weight"]
        for r in R3.rm3_expand(qtfs, fp, doc_tfs, dls, fb_docs=5,
                               fb_terms=10, orig_weight=0.5).collect()
    }
    # rm1: apple = pear = (2/4)*2 = 1.0 → normalized 0.5 each
    # weight(apple) = 0.5*1.0 (orig) + 0.5*0.5 = 0.75 ; pear = 0.5*0.5 = 0.25
    assert out == {"apple": 0.75, "pear": 0.25}


def test_rm3_expand_fb_terms_cut(spark):
    qtfs = spark.createDataFrame([("q1", "t0", 1)], "qid string, term string, qtf int")
    fp = spark.createDataFrame(
        [("q1", 1, 1, 1.0)], "qid string, docid int, rank int, score double"
    )
    # doc has 5 terms with tf 5,4,3,2,1 → only top-3 survive the cut
    doc_tfs = spark.createDataFrame(
        [(1, f"t{i}", 5 - i) for i in range(5)], "docid int, term string, tf int"
    )
    dls = spark.createDataFrame([(1, 15)], "docid int, dl int")
    out = R3.rm3_expand(qtfs, fp, doc_tfs, dls, fb_docs=5, fb_terms=3,
                        orig_weight=0.5).collect()
    terms = {r["term"] for r in out}
    assert terms == {"t0", "t1", "t2"}  # t3/t4 cut; t0 kept via original query
    # normalized rm1 over kept terms: 5/12, 4/12, 3/12
    w = {r["term"]: r["weight"] for r in out}
    assert w["t1"] == round(0.5 * (4 / 12), 6)


def test_rm3_no_feedback_docs_keeps_query(spark):
    # a query whose first pass returned nothing keeps its (scaled) original
    qtfs = spark.createDataFrame(
        [("q9", "zzz", 2), ("q9", "yyy", 1)], "qid string, term string, qtf int"
    )
    fp = spark.createDataFrame([], "qid string, docid int, rank int, score double")
    doc_tfs = spark.createDataFrame([], "docid int, term string, tf int")
    dls = spark.createDataFrame([], "docid int, dl int")
    out = {r["term"]: r["weight"]
           for r in R3.rm3_expand(qtfs, fp, doc_tfs, dls).collect()}
    assert out == {"zzz": round(0.5 * 2 / 3, 6), "yyy": round(0.5 * 1 / 3, 6)}


# ---------------------------------------------------------------- property

def _naive_phrase(tokens, phrase):
    starts = [
        i for i in range(len(tokens) - len(phrase) + 1)
        if tokens[i : i + len(phrase)] == phrase
    ]
    return starts


def test_phrase_match_property_vs_naive(spark):
    """Randomized cross-check: the shifted-intersection phrase matcher must
    agree with a naive Python sliding-window scan on every case."""
    import random

    rng = random.Random(20260816)
    vocab = ["a", "b", "c", "ab", "x9"]
    rows, expected = [], {}
    phrases = [["a", "b"], ["b", "b"], ["a", "b", "a"], ["c"]]
    for doc_id in range(120):
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 14))]
        rows.append((doc_id, " ".join(toks)))
        for pi, ph in enumerate(phrases):
            s = _naive_phrase(toks, ph)
            if s:
                expected[(doc_id, pi)] = (len(s), s[0])
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {}
    for pi, ph in enumerate(phrases):
        from dhr_spark.operators.phrase import phrase_match

        for r in phrase_match(df, " ".join(ph)).collect():
            got[(r["doc_id"], pi)] = (r["n_matches"], r["first_pos"])
    assert got == expected
