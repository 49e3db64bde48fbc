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


def test_snippet_fragments_greedy_and_single_equals_best(spark):
    from dhr_spark.operators.phrase import best_snippet, snippet_fragments

    docs = spark.createDataFrame(
        [
            # two hit clusters: [cat dog] at 0-1 and [cat] at 8, far apart
            (0, "cat dog x x x x x x cat y y y"),
            (1, "nothing relevant here"),
            (2, "cat z z z z z z z z z z z"),  # single cluster only
        ],
        "doc_id long, text string",
    )
    frags = {
        (r["doc_id"], r["frag"]): (r["start"], r["n_hits"], r["snippet"])
        for r in snippet_fragments(
            docs, ["cat", "dog"], width=4, n_fragments=2
        ).collect()
    }
    # doc 0: frag1 = window at 0 covering both terms; frag2 = the far
    # cluster at 8 (non-overlapping), covering just "cat"
    assert frags[(0, 1)] == (0, 2, "cat dog x x")
    assert frags[(0, 2)][0] == 8 and frags[(0, 2)][1] == 1
    # doc 1: no hits -> no rows; doc 2: only one fragment exists
    assert (1, 1) not in frags
    assert (2, 1) in frags and (2, 2) not in frags
    # n_fragments=1 == best_snippet selection on every doc
    one = {
        r["doc_id"]: (r["start"], r["n_hits"], r["snippet"])
        for r in snippet_fragments(
            docs, ["cat", "dog"], width=4, n_fragments=1
        ).collect()
    }
    best = {
        r["doc_id"]: (r["start"], r["n_hits"], r["snippet"])
        for r in best_snippet(docs, ["cat", "dog"], width=4).collect()
    }
    assert one == best
    # fragments never overlap
    for d in (0, 2):
        starts = sorted(
            s for (doc, _), (s, _, _) in frags.items() if doc == d
        )
        for a, b in zip(starts, starts[1:]):
            assert b >= a + 4


def test_snippet_fragments_guards(spark):
    from dhr_spark.operators.phrase import snippet_fragments

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    import pytest as _pt

    with _pt.raises(ValueError, match="n_fragments"):
        snippet_fragments(docs, ["x"], n_fragments=0)
    with _pt.raises(ValueError, match="width"):
        snippet_fragments(docs, ["x"], width=0)
    with _pt.raises(ValueError, match="no indexable"):
        snippet_fragments(docs, ["!!!"])


def test_highlight_fragments_index_backed(spark, stored_index, queries):
    from dhr_spark.operators.phrase import snippet_fragments
    from dhr_spark.operators.wand import Searcher

    s = Searcher(spark, stored_index)
    multi = s.highlight_fragments(queries, k=5, width=8, n_fragments=2)
    assert "frag" in multi.columns
    rows = multi.collect()
    assert rows and all(r["frag"] in (1, 2) for r in rows)
    # frag-1 rows must equal the single-fragment highlight exactly
    single = {
        (r["qid"], r["docid"]): (r["start"], r["n_hits"], r["snippet"])
        for r in s.highlight(queries, k=5, width=8).collect()
        if r["start"] is not None
    }
    got1 = {
        (r["qid"], r["docid"]): (r["start"], r["n_hits"], r["snippet"])
        for r in rows
        if r["frag"] == 1
    }
    assert got1 == single and got1
