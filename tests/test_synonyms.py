"""Lucene SynonymQuery semantics (operators/synonyms.py).

Pins: tf sums BEFORE BM25 saturation (not an OR of member clauses),
blended docFreq = max member df, query terms merge into group clauses
with qtf summed, overlap/singleton guards. The full DuckDB oracle is the
synonym_topk entry (tests/test_entry_oracle.py)."""

from __future__ import annotations

import math

import pytest

from dhr_spark import B, K1
from dhr_spark.operators.synonyms import (
    synonym_groups_df,
    synonym_topk,
    synonym_weights,
)
from dhr_spark.operators.termfreq import (
    doc_lengths,
    query_term_freqs,
    term_freqs,
    with_tokens,
)

DOCS = [
    (0, "spark table scan spark"),
    (1, "table join order"),
    (2, "slow query window query"),
    (3, "spark spark spark spark spark spark spark spark"),
    (4, "hash"),
]
GROUPS = [["table", "scan"]]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(DOCS, "docid long, text string")
    tok = with_tokens(docs, mode="simple").cache()
    return dict(
        tfs=term_freqs(tok),
        dls=doc_lengths(tok),
        groups=synonym_groups_df(spark, GROUPS),
    )


def _py_weights():
    """Reference: plain-python SynonymQuery BM25 over DOCS."""
    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    grp = {"table": "scan", "scan": "scan"}
    df: dict[str, int] = {}
    for v in toks.values():
        for t in set(v):
            df[t] = df.get(t, 0) + 1
    # blended df: max over members
    df_g = dict(df)
    df_g["scan"] = max(df["table"], df["scan"])
    df_g.pop("table")
    out = {}
    for d, v in toks.items():
        tf_g: dict[str, int] = {}
        for t in v:
            g = grp.get(t, t)
            tf_g[g] = tf_g.get(g, 0) + 1
        dl = len(v)
        for g, tf in tf_g.items():
            idf = math.log(1 + (n - df_g[g] + 0.5) / (df_g[g] + 0.5))
            w = idf * tf / (tf + K1 * (1 - B + B * dl / avgdl))
            out[(g, d)] = round(w, 6)
    return out


def test_synonym_weights_match_reference(corpus):
    got = {
        (r["term"], r["docid"]): r["weight"]
        for r in synonym_weights(
            corpus["tfs"], corpus["dls"], corpus["groups"]
        ).collect()
    }
    assert got == _py_weights()
    # the member terms are GONE — only the group pseudo-term scores
    assert not any(t == "table" for t, _ in got)


def test_synonym_is_not_an_or(corpus, spark):
    """Doc 0 holds both members (table + scan): the group weight must use
    the SUMMED tf inside one saturation, which is strictly less than the
    two members' separately-saturated weights added (tf saturation is
    concave)."""
    from dhr_spark.functions.bm25 import bm25_weight_col, idf_col
    from pyspark.sql import functions as F

    row = corpus["dls"].agg(
        F.count("*").alias("n"), F.avg("dl").alias("a")
    ).collect()[0]
    plain = (
        corpus["tfs"]
        .join(corpus["dls"], "docid")
        .join(
            corpus["tfs"].groupBy("term").agg(F.count("*").alias("df")),
            "term",
        )
        .withColumn("idf", idf_col(F.col("df"), int(row["n"])))
        .select(
            "term",
            "docid",
            bm25_weight_col(
                F.col("tf"), F.col("dl"), F.col("idf"),
                F.lit(float(row["a"])), K1, B,
            ).alias("w"),
        )
    )
    or_sum = sum(
        r["w"]
        for r in plain.filter(
            (F.col("docid") == 0) & F.col("term").isin("table", "scan")
        ).collect()
    )
    syn_w = (
        synonym_weights(corpus["tfs"], corpus["dls"], corpus["groups"])
        .filter("docid = 0 AND term = 'scan'")
        .collect()[0]["w" "eight"]
    )
    assert syn_w < or_sum


def test_synonym_topk_query_rewrite(corpus, spark):
    # "table scan" collapses to ONE group clause with qtf 2
    q = spark.createDataFrame(
        [("q1", "table scan")], "qid string, text string"
    )
    qtfs = query_term_freqs(with_tokens(q, mode="simple"))
    hits = {
        r["docid"]: r["score"]
        for r in synonym_topk(
            qtfs, corpus["tfs"], corpus["dls"], corpus["groups"], k=10
        ).collect()
    }
    ref = _py_weights()
    # every doc containing table OR scan matches, score = 2 * group weight
    exp = {
        d: round(2 * w, 4)
        for (g, d), w in ref.items()
        if g == "scan"
    }
    assert {d: round(s, 4) for d, s in hits.items()} == exp


def test_synonym_guards(spark):
    with pytest.raises(ValueError, match="two synonym sets"):
        synonym_groups_df(spark, [["a", "b"], ["b", "c"]])
    with pytest.raises(ValueError, match=">= 2"):
        synonym_groups_df(spark, [["solo"]])
