"""Conversation-level operators: stable turn ordering under any physical row
order (the north-star per-row invariant), context windows, rollups, and
snippet extraction semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.operators import conversations as CV
from dhr_spark.operators import phrase as PH


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        ("c1", 2, "user", "third turn", None),
        ("c1", 0, "user", "first turn", None),
        ("c1", 1, "assistant", "second turn", None),
        ("c2", 1, "tool", "grep output", "grep"),
        ("c2", 0, "user", "find it", None),
        ("c3", 0, "tool", "bash output", "bash"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )


def test_conv_documents_stable_order(spark, turns):
    out = {r["conv_id"]: (r["n_turns"], r["text"])
           for r in CV.conv_documents(turns).collect()}
    assert out["c1"] == (3, "first turn second turn third turn")
    assert out["c2"] == (2, "find it grep output")
    # identical result when the physical row order is scrambled
    scrambled = turns.orderBy(F.rand(seed=1)).repartition(7)
    out2 = {r["conv_id"]: (r["n_turns"], r["text"])
            for r in CV.conv_documents(scrambled).collect()}
    assert out == out2


def test_turn_context_edges(spark, turns):
    ctx = {(r["conv_id"], r["turn_idx"]): (r["prev_text"], r["next_text"])
           for r in CV.turn_context(turns).collect()}
    assert ctx[("c1", 0)] == ("", "second turn")
    assert ctx[("c1", 1)] == ("first turn", "third turn")
    assert ctx[("c1", 2)] == ("second turn", "")
    assert ctx[("c3", 0)] == ("", "")


def test_conv_role_stats(spark, turns):
    st = {(r["conv_id"], r["role"]): (r["n_turns"], r["total_chars"])
          for r in CV.conv_role_stats(turns).collect()}
    assert st[("c1", "user")] == (2, len("third turn") + len("first turn"))
    assert st[("c2", "tool")] == (1, len("grep output"))


def test_tool_usage(spark, turns):
    tu = {r["tool"]: (r["n_calls"], r["n_convs"])
          for r in CV.tool_usage(turns).collect()}
    assert tu == {"grep": (1, 1), "bash": (1, 1)}


def test_best_snippet_picks_densest_window(spark):
    df = spark.createDataFrame(
        [
            (1, "table x x x x x x x x x table hash merge y"),
            (2, "nothing relevant here"),
            (3, "hash z table"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: (r["start"], r["n_hits"], r["snippet"])
           for r in PH.best_snippet(df, ["table", "hash", "merge"], width=5).collect()}
    # doc1: window starting at 10 covers table+hash+merge (3 hits) — beats pos 0
    assert out[1] == (10, 3, "table hash merge y")
    # doc3: all three tokens within width 5 from pos 0, 2 distinct hits
    assert out[3] == (0, 2, "hash z table")
    assert 2 not in out  # no query term at all → no snippet row


def test_best_snippet_tie_prefers_earliest(spark):
    df = spark.createDataFrame(
        [(1, "hash a b c d e f g hash")], "doc_id int, text string"
    )
    r = PH.best_snippet(df, ["hash"], width=3).collect()[0]
    assert (r["start"], r["n_hits"]) == (0, 1)


def test_repetition_stats_edges(spark):
    from dhr_spark.operators import textstats as TS
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, ""), (3, "x"), (4, "p q p q p q")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in TS.repetition_stats(df).collect()}
    assert out[1]["top_token_frac"] == 0.75
    assert out[1]["distinct_ratio"] == 0.5
    assert out[2]["n_tokens"] == 0 and out[2]["top_token_frac"] == 0.0
    assert out[3]["top_bigram_frac"] == 0.0  # single token: no bigrams
    assert out[4]["top_bigram_frac"] == 0.6  # "p q" 3x of 5 bigrams


def test_redact_order_and_counts(spark):
    from dhr_spark.operators import textstats as TS
    df = spark.createDataFrame(
        [(1, "mail bob42@x.org or call 555 1234"), (2, "clean")],
        "event_id int, props string",
    )
    out = {r["event_id"]: (r["redacted"], r["n_redacted"])
           for r in TS.redact(df, "props", "event_id").collect()}
    assert out[1] == ("mail <EMAIL> or call <NUM> <NUM>", 3)
    assert out[2] == ("clean", 0)


def test_hash_split_deterministic_and_total(spark):
    from dhr_spark.operators import textstats as TS
    docs = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in TS.hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in
         TS.hash_split(docs.repartition(13)).collect()}
    assert a == b  # partitioning-independent
    from collections import Counter
    c = Counter(a.values())
    assert c["train"] + c["val"] + c["test"] == 1000
    assert 700 < c["train"] < 900  # ~80%
