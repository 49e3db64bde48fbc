"""Boolean / filtered / faceted retrieval semantics on hand-built cases
(corpus-scale parity is pinned by the DuckDB oracle entries)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.operators import boolquery as BQ


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "table hash merge", "a"),
        (2, "table hash slow", "a"),
        (3, "table hash scan", "b"),
        (4, "table merge", "b"),
        (5, "hash scan", "c"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


def test_boolean_clauses(spark, docs):
    got = {
        r["doc_id"]
        for r in BQ.boolean_match(
            docs, must=["table", "hash"], should=["merge", "scan"],
            must_not=["slow"],
        ).collect()
    }
    assert got == {1, 3}  # 2 excluded by must_not, 4/5 fail must


def test_boolean_should_only_and_case_folding(spark, docs):
    got = {r["doc_id"] for r in BQ.boolean_match(docs, should=["MERGE"]).collect()}
    assert got == {1, 4}
    with pytest.raises(ValueError):
        BQ.boolean_match(docs)


def test_facet_counts(spark, docs):
    got = {r["facet"]: r["n_docs"]
           for r in BQ.facet_counts(docs, ["merge", "scan"], "source").collect()}
    assert got == {"a": 1, "b": 2, "c": 1}


def test_filtered_topk_restricts_before_scoring(spark, docs):
    qtfs = spark.createDataFrame(
        [("q1", "table", 1)], "qid string, term string, qtf int"
    )
    post = spark.createDataFrame(
        [(1, "table", 1.0), (2, "table", 2.0), (4, "table", 3.0)],
        "docid int, term string, weight double",
    )
    flt = spark.createDataFrame([(1,), (4,)], "docid int")
    got = [(r["docid"], r["rank"]) for r in
           BQ.filtered_topk(qtfs, post, flt, k=10).orderBy("rank").collect()]
    assert got == [(4, 1), (1, 2)]  # doc 2 filtered out entirely


def test_boolean_zero_shuffle_plan(spark, docs):
    plan = (
        BQ.boolean_match(docs, must=["table"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_boolean_min_should_match(spark, docs):
    # >= 2 of the 4 SHOULD terms (Lucene setMinimumNumberShouldMatch):
    # doc1 has table+hash+merge (3), doc2 table+hash (2), doc3
    # table+hash+scan (3), doc4 table+merge (2), doc5 hash+scan (2)
    got = {
        r["doc_id"]
        for r in BQ.boolean_match(
            docs, should=["table", "hash", "merge", "scan"],
            min_should_match=3,
        ).collect()
    }
    assert got == {1, 3}
    # msm composes with MUST/MUST_NOT; repeated doc terms count once
    got = {
        r["doc_id"]
        for r in BQ.boolean_match(
            docs, must=["hash"], should=["merge", "scan", "slow"],
            must_not=["table"], min_should_match=1,
        ).collect()
    }
    assert got == {5}
    with pytest.raises(ValueError, match="unsatisfiable"):
        BQ.boolean_match(docs, should=["merge"], min_should_match=2)
