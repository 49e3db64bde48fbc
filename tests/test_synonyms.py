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


# ------------------------------------------- index-backed SynonymQuery

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def syn_idx(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from dhr_spark.index.builder import build_index_from_docs

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").alias("docid"), "text"
    )
    d = str(tmp_path_factory.mktemp("syn_idx") / "idx")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple", chunk_bits=6, block_size=16,
        forward_index=True,
    )
    return d, docs


def _res_map(rows):
    return {(r["qid"], r["docid"]): (r["rank"], round(r["score"], 4))
            for r in rows}


def test_search_synonym_equals_slow_path(spark, syn_idx):
    from dhr_spark.operators.wand import Searcher

    idx, docs = syn_idx
    groups = [["table", "scan"], ["merge", "join"]]
    queries = spark.createDataFrame(
        [("q1", "spark table scan"), ("q2", "merge batch"),
         ("q3", "hash")],
        "qid string, text string",
    )
    fast = Searcher(spark, idx).search_synonym(queries, groups, k=20)
    tok = with_tokens(docs, mode="simple")
    qtfs = query_term_freqs(with_tokens(queries, mode="simple"))
    slow = synonym_topk(
        qtfs, term_freqs(tok), doc_lengths(tok),
        synonym_groups_df(spark, groups), k=20,
    )
    assert _res_map(fast.collect()) == _res_map(slow.collect())


def test_search_synonym_oov_member_still_matches(spark, syn_idx):
    """A query term absent from the corpus whose group has live members
    must match those members (analyzer-level expansion semantics)."""
    from dhr_spark.operators.wand import Searcher

    idx, _docs = syn_idx
    q = spark.createDataFrame(
        [("q1", "zzyzxsyn")], "qid string, text string"
    )
    hits = Searcher(spark, idx).search_synonym(
        q, [["zzyzxsyn", "table"]], k=5
    )
    assert hits.count() > 0  # matches docs containing "table"


def test_search_synonym_requires_forward_index(spark, syn_idx, tmp_path):
    from pyspark.sql import functions as F

    from dhr_spark.index.builder import build_index_from_docs
    from dhr_spark.operators.wand import Searcher

    _idx, docs = syn_idx
    d = str(tmp_path / "nofwd")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple", chunk_bits=6, block_size=16
    )
    q = spark.createDataFrame([("q1", "table")], "qid string, text string")
    with pytest.raises(ValueError, match="forward_index"):
        Searcher(spark, d).search_synonym(q, [["table", "scan"]])
