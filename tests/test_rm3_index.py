"""Index-backed RM3 (Searcher.search_rm3 over the forward index) must equal
the DataFrame slow-path RM3 pipeline exactly, and degrade gracefully."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dhr_spark.functions.bm25 import bm25_weight_col, idf_col
from dhr_spark.index.builder import build_index_from_docs
from dhr_spark.operators import rm3 as R3
from dhr_spark.operators.termfreq import (
    doc_lengths,
    query_term_freqs,
    term_freqs,
    with_tokens,
)
from dhr_spark.operators.topk import score_all, topk
from dhr_spark.operators.wand import Searcher

SF = "/root/testdata/sf0.001"
K1, B = 0.9, 0.4
FB_DOCS, FB_TERMS = 5, 8


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.col("doc_id").alias("docid"), "text")
    )


@pytest.fixture(scope="module")
def idx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rm3idx") / "idx")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple", chunk_bits=6, block_size=16,
        forward_index=True,
    )
    return d


@pytest.fixture(scope="module")
def queries(spark):
    rows = [
        ("q1", "spark table scan"),
        ("q2", "merge batch value value"),
        ("q3", "zzyzx unseenterm hash"),   # partially OOV
        ("q4", "the slow window"),
    ]
    return spark.createDataFrame(rows, "qid string, text string")


def _slow_rm3(spark, docs, queries, k):
    tok = with_tokens(docs, mode="simple")
    tfs, dls = term_freqs(tok), doc_lengths(tok)
    cs = dls.agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    ts = tfs.groupBy("term").agg(F.count("*").alias("df")).withColumn(
        "idf", idf_col(F.col("df"), int(cs["n"]))
    )
    post = (
        tfs.join(dls, "docid")
        .join(F.broadcast(ts.select("term", "idf")), "term")
        .select("term", "docid", bm25_weight_col(
            F.col("tf"), F.col("dl"), F.col("idf"),
            F.lit(float(cs["a"])), K1, B,
        ).alias("weight"))
    )
    qtfs = query_term_freqs(with_tokens(queries, mode="simple"))
    first = topk(score_all(qtfs, post, on="term"), FB_DOCS)
    expanded = R3.rm3_expand(
        qtfs, first, tfs, dls, fb_docs=FB_DOCS, fb_terms=FB_TERMS,
        orig_weight=0.5,
    )
    return R3.rm3_topk(expanded, post, k=k, on="term")


def _as_map(rows):
    return {(r["qid"], r["docid"]): (r["rank"], round(r["score"], 4)) for r in rows}


def test_search_rm3_equals_slow_path(spark, docs, idx, queries):
    fast = Searcher(spark, idx).search_rm3(
        queries, k=20, fb_docs=FB_DOCS, fb_terms=FB_TERMS, orig_weight=0.5
    )
    slow = _slow_rm3(spark, docs, queries, k=20)
    assert _as_map(fast.collect()) == _as_map(slow.collect())


def test_search_rm3_requires_forward_index(spark, docs, queries, tmp_path):
    d = str(tmp_path / "nofwd")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple", chunk_bits=6, block_size=16
    )
    with pytest.raises(ValueError, match="forward_index"):
        Searcher(spark, d).search_rm3(queries)


def test_search_rm3_all_oov_query(spark, idx):
    q = spark.createDataFrame([("q9", "zzyzx unseenterm")], "qid string, text string")
    assert Searcher(spark, idx).search_rm3(q, k=5).count() == 0


def test_forward_index_survives_append(spark, idx, queries, tmp_path):
    # append new docs; RM3 must see their term vectors when they feed back
    import shutil

    from dhr_spark.index.incremental import append_to_index

    d = str(tmp_path / "idx2")
    shutil.copytree(idx, d)
    extra = spark.createDataFrame(
        [("x-1", 0, "u", "spark table scan spark table spark", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    man = append_to_index(spark, extra, d)
    assert man["forward_index"] is True
    fwd = spark.read.parquet(os.path.join(d, "forward"))
    assert fwd.filter(F.col("docid") >= man["next_docid"] - 1).count() > 0
    out = Searcher(spark, d).search_rm3(queries, k=5, fb_docs=3, fb_terms=5)
    assert out.count() > 0


def test_search_rm3_never_collects_forward_rows(spark, idx, queries, monkeypatch):
    """The distributed RM3 must not funnel forward-index term vectors (or raw
    first-pass results) through the driver: the only allowed collects are
    the query set and the final expanded query model."""
    from pyspark.sql import DataFrame

    collected_schemas = []
    orig = DataFrame.collect

    def spy(self):
        collected_schemas.append({f.name for f in self.schema.fields})
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", spy)
    out = Searcher(spark, idx).search_rm3(
        queries, k=10, fb_docs=FB_DOCS, fb_terms=FB_TERMS
    )
    n = out.count()
    assert n > 0
    for cols in collected_schemas:
        # forward-index rows carry (docid, term_id, tf, dl)
        assert not {"docid", "tf", "dl"} <= cols, cols
        # raw first-pass results carry (qid, docid, rank/score) without
        # term-level columns; the expanded model has no docid at all
        assert "docid" not in cols or "weight" in cols, cols
