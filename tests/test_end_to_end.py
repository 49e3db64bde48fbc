"""End-to-end rank-identity: engine slow path vs pure-pandas oracle
(SURVEY.md §5 'Oracle end-to-end'), plus docid stability invariants
(BASELINE.json input_hint: per-turn text equality under stable ordering).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.operators.docids import with_docids
from dhr_spark.operators.postings import postings_flat
from dhr_spark.operators.stats import corpus_stats, term_dictionary, term_stats
from dhr_spark.operators.termfreq import (
    doc_lengths,
    query_term_freqs,
    term_freqs,
    with_tokens,
)
from dhr_spark.operators.topk import search_slow_path, two_stage_topk

from tests.oracle import oracle_topk


@pytest.fixture(scope="module")
def small_build(spark):
    """Tiny corpus (~400 turns) fully built: docs, postings, dict, queries."""
    docs = with_docids(synth_transcripts(spark, 20), "window").cache()
    tok = with_tokens(docs, mode="lucene").cache()
    tfs = term_freqs(tok).cache()
    dls = doc_lengths(tok).cache()
    cs = corpus_stats(dls).collect()[0]
    tdict = term_dictionary(term_stats(tfs, cs["n_docs"])).cache()
    postings = postings_flat(tfs, dls, tdict, cs["avgdl"]).cache()
    queries = synth_queries(spark, 15).cache()
    qtok = with_tokens(queries, mode="lucene")
    qtfs = (
        query_term_freqs(qtok.select("qid", "tokens"))
        .join(tdict.select("term", "term_id"), "term")
        .cache()
    )
    return dict(docs=docs, postings=postings, tdict=tdict, queries=queries, qtfs=qtfs)


def test_docid_stability_across_strategies(spark):
    tr = synth_transcripts(spark, 30)
    a = with_docids(tr, "window").select("docid", "conv_id", "turn_idx", "text")
    b = with_docids(tr, "scalable", 8).select(
        "docid",
        F.col("conv_id").alias("b_conv_id"),
        F.col("turn_idx").alias("b_turn_idx"),
        F.col("text").alias("b_text"),
    )
    # identical (docid -> row) mapping from both strategies
    diff = a.join(b, "docid", "full").filter(
        (F.col("conv_id") != F.col("b_conv_id"))
        | (F.col("turn_idx") != F.col("b_turn_idx"))
        | (F.col("text") != F.col("b_text"))
        | F.col("conv_id").isNull()
        | F.col("b_conv_id").isNull()
    )
    assert diff.count() == 0
    assert a.count() == b.count()


def test_docids_dense_and_ordered(spark):
    docs = with_docids(synth_transcripts(spark, 25), "scalable", 8)
    rows = docs.orderBy("docid").select("docid", "conv_id", "turn_idx").collect()
    assert [r["docid"] for r in rows] == list(range(len(rows)))
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    assert keys == sorted(keys)


def test_per_turn_text_equality_roundtrip(spark, tmp_path):
    """Per-row invariant: writing and re-reading the doc corpus preserves
    per-turn text under (conv_id, turn_idx) ordering."""
    docs = with_docids(synth_transcripts(spark, 10), "window")
    p = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    orig = {(r["conv_id"], r["turn_idx"]): r["text"] for r in docs.collect()}
    for r in back.collect():
        assert orig[(r["conv_id"], r["turn_idx"])] == r["text"]


def test_rank_identity_vs_oracle(spark, small_build):
    sb = small_build
    corpus = [(r["docid"], r["text"]) for r in sb["docs"].select("docid", "text").collect()]
    queries = [(r["qid"], r["text"]) for r in sb["queries"].collect()]
    expected = oracle_topk(corpus, queries, k=10)

    got = search_slow_path(sb["qtfs"], sb["postings"], k=10).collect()
    by_qid: dict[str, list] = {}
    for r in sorted(got, key=lambda r: (r["qid"], r["rank"])):
        by_qid.setdefault(r["qid"], []).append((r["docid"], r["rank"], r["score"]))

    for qid, exp in expected.items():
        eng = by_qid.get(qid, [])
        assert [e[0] for e in eng] == [e[0] for e in exp], f"docids differ for {qid}"
        assert [e[1] for e in eng] == [e[1] for e in exp], f"ranks differ for {qid}"
        for (_, _, s_eng), (_, _, s_exp) in zip(eng, exp):
            assert abs(s_eng - s_exp) <= 1e-6, f"score drift for {qid}"


def test_two_stage_matches_exact_when_pool_large(spark, small_build):
    """With candidate_pool >= corpus size the two-stage path must equal the
    exact path (reference contract, gip_retrieval.py:141-153)."""
    sb = small_build
    exact = search_slow_path(sb["qtfs"], sb["postings"], k=10).collect()
    twostage = two_stage_topk(
        sb["qtfs"], sb["postings"], k=10, candidate_pool=100_000, theta=0.0
    ).collect()
    key = lambda rows: sorted((r["qid"], r["rank"], r["docid"]) for r in rows)
    assert key(exact) == key(twostage)


def test_empty_and_oov_queries(spark, small_build):
    sb = small_build
    res = search_slow_path(sb["qtfs"], sb["postings"], k=10)
    qids_with_hits = {r["qid"] for r in res.select("qid").distinct().collect()}
    all_qids = {r["qid"] for r in sb["queries"].collect()}
    # stopword-only queries exist in the fixture set and must simply be absent
    assert qids_with_hits <= all_qids
