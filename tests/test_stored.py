"""Stored fields + index-backed highlighting (Lucene stored-field /
highlighter parity): fetch returns the exact original text, highlight
matches the DuckDB-oracled corpus-scan best_snippet, and the artifact
survives appends and compaction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.builder import build_index
from dhr_spark.index.compact import compact_index
from dhr_spark.index.incremental import append_to_index
from dhr_spark.operators.phrase import best_snippet
from dhr_spark.operators.wand import Searcher

CHUNK_BITS, BLOCK = 7, 16


def _batch(spark, n, seed, prefix):
    return synth_transcripts(spark, n, seed=seed).withColumn(
        "conv_id", F.concat(F.lit(prefix), F.col("conv_id"))
    )


@pytest.fixture(scope="module")
def stored_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("stored") / "idx")
    build_index(
        spark, _batch(spark, 30, 42, "a-"), idx,
        chunk_bits=CHUNK_BITS, block_size=BLOCK, stored=True,
    )
    return idx


@pytest.fixture(scope="module")
def queries(spark):
    return synth_queries(spark, n_queries=8)


def test_fetch_returns_exact_text(spark, stored_index, queries):
    s = Searcher(spark, stored_index)
    res = s.search(queries, k=20)
    fetched = s.fetch_stored(res)
    assert fetched.filter(F.col("text").isNull()).count() == 0
    # the fetched text IS the source text: join back through doc_map
    src = _batch(spark, 30, 42, "a-").select("conv_id", "turn_idx",
                                             F.col("text").alias("src"))
    dm = spark.read.parquet(os.path.join(stored_index, "doc_map"))
    joined = fetched.join(dm, "docid").join(src, ["conv_id", "turn_idx"])
    assert joined.filter(F.col("text") != F.col("src")).count() == 0


def test_highlight_matches_corpus_best_snippet(spark, stored_index, queries):
    """Index-backed highlight == corpus-scan best_snippet (the DuckDB-
    oracled operator) on the same (query, doc) pairs."""
    s = Searcher(spark, stored_index)
    qrows = queries.limit(3).collect()
    for r in qrows:
        one = queries.filter(F.col("qid") == r["qid"])
        hl = s.highlight(one, k=10, width=10)
        got = {
            row["docid"]: (row["start"], row["n_hits"], row["snippet"])
            for row in hl.collect() if row["n_hits"] > 0
        }
        docs = s.fetch_stored(s.search(one, k=10)).select(
            F.col("docid").alias("doc_id"), "text"
        )
        want = {
            row["doc_id"]: (row["start"], row["n_hits"], row["snippet"])
            for row in best_snippet(docs, [r["text"]], width=10).collect()
        }
        assert got == want


def test_fetch_guard_without_stored(spark, tmp_path, queries):
    idx = str(tmp_path / "idx")
    build_index(spark, _batch(spark, 10, 42, "a-"), idx,
                chunk_bits=CHUNK_BITS, block_size=BLOCK)
    s = Searcher(spark, idx)
    with pytest.raises(ValueError, match="stored"):
        s.fetch_stored(s.search(queries, k=5))


def test_stored_survives_append_and_compaction(spark, tmp_path, queries):
    idx = str(tmp_path / "idx")
    build_index(spark, _batch(spark, 20, 42, "a-"), idx,
                chunk_bits=CHUNK_BITS, block_size=BLOCK, stored=True)
    append_to_index(spark, _batch(spark, 5, 91, "b-"), idx)
    append_to_index(spark, _batch(spark, 4, 77, "c-"), idx)

    def text_by_turn():
        s = Searcher(spark, idx)
        res = s.search(queries, k=100_000)
        dm = spark.read.parquet(os.path.join(idx, "doc_map"))
        return {
            (r["qid"], r["conv_id"], r["turn_idx"]): r["text"]
            for r in s.fetch_stored(res).join(dm, "docid").collect()
        }

    before = text_by_turn()
    assert before and all(v is not None for v in before.values())
    # appended docs are fetchable (b-/c- conv_ids present)
    assert any(k[1].startswith("b-") for k in before)

    man = compact_index(spark, idx, fill_threshold=0.9)
    assert man["compactions"] == 1
    assert text_by_turn() == before
