"""Static index pruning (Carmel et al. SIGIR 2001, term-centric top-k)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.index.builder import build_index_from_docs
from dhr_spark.operators.wand import Searcher

CORPUS = [
    (0, "spark data engine"),
    (1, "spark spark data"),
    (2, "spark lake"),
    (3, "spark house data data"),
    (4, "spark query plan"),
    (5, "other words entirely"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "docid long, text string")


def _runs(df):
    return sorted(
        (r["qid"], r["rank"], r["docid"], round(r["score"], 6))
        for r in df.collect()
    )


def test_pruned_lists_are_cut_and_stats_stay_full(spark, docs, tmp_path):
    full_d, pr_d = str(tmp_path / "full"), str(tmp_path / "pr")
    build_index_from_docs(spark, docs, full_d, analyzer_mode="simple", chunk_bits=3)
    man = build_index_from_docs(
        spark, docs, pr_d, analyzer_mode="simple", chunk_bits=3,
        prune_per_term=2,
    )
    assert man["prune_per_term"] == 2
    # corpus stats are the FULL corpus's (kept postings score identically)
    assert man["n_docs"] == 6
    seg = spark.read.parquet(f"{pr_d}/segments")
    assert seg.agg(F.max("n")).first()[0] <= 2  # every list cut to keep
    full_seg = spark.read.parquet(f"{full_d}/segments")
    assert full_seg.agg(F.max("n")).first()[0] == 5  # 'spark' df=5 unpruned


def test_single_term_query_heads_identical(spark, docs, tmp_path):
    """Term-centric top-k preserves a single-term query's top-keep hits
    exactly (the kept set IS that query's exact top-keep, scored under the
    same full-corpus stats)."""
    full_d, pr_d = str(tmp_path / "f2"), str(tmp_path / "p2")
    build_index_from_docs(spark, docs, full_d, analyzer_mode="simple", chunk_bits=3)
    build_index_from_docs(
        spark, docs, pr_d, analyzer_mode="simple", chunk_bits=3,
        prune_per_term=3,
    )
    q = spark.createDataFrame([("q", "data")], "qid string, text string")
    full = _runs(Searcher(spark, full_d).search(q, k=3))
    pruned = _runs(Searcher(spark, pr_d).search(q, k=3))
    assert full == pruned and len(pruned) == 3


def test_keep_above_max_df_is_lossless(spark, docs, tmp_path):
    full_d, pr_d = str(tmp_path / "f3"), str(tmp_path / "p3")
    build_index_from_docs(spark, docs, full_d, analyzer_mode="simple", chunk_bits=3)
    build_index_from_docs(
        spark, docs, pr_d, analyzer_mode="simple", chunk_bits=3,
        prune_per_term=100,
    )
    q = spark.createDataFrame(
        [("q1", "spark data"), ("q2", "lake house")], "qid string, text string"
    )
    assert _runs(Searcher(spark, full_d).search(q, k=10)) == _runs(
        Searcher(spark, pr_d).search(q, k=10)
    )


def test_append_refused_on_pruned_index(spark, docs, tmp_path):
    from dhr_spark.index.incremental import append_docs_to_index

    d = str(tmp_path / "p4")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple", chunk_bits=3, prune_per_term=2
    )
    batch = spark.createDataFrame(
        [(8, "spark again")], "docid long, text string"
    )
    with pytest.raises(ValueError, match="prune_per_term"):
        append_docs_to_index(spark, batch, d)


def test_prune_operator_guard(spark, docs):
    from dhr_spark.operators.postings import prune_postings_topk

    p = spark.createDataFrame(
        [(0, 0, 1, 3)], "term_id long, docid long, tf long, dl long"
    )
    with pytest.raises(ValueError, match="keep"):
        prune_postings_topk(p, 0, avgdl=3.0)
