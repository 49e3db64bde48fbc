"""LTR feature extraction (operators/ltr.py + Searcher.ltr_features).

Contracts: each similarity feature equals its dedicated scorer's score on
the same pairs (one fused pass == four separate scorers); the candidates
semi-join restricts pairs without changing values; the index-backed twin
(forward index + dictionary stats) equals the corpus-scan operator on the
BM25 top-k candidates; match-shape features recount by hand."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.operators.classic import tfidf_topk
from dhr_spark.operators.ltr import ltr_features
from dhr_spark.operators.qld import lmjm_topk, qld_topk
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
    (4, "hash table"),
]
QUERIES = [("q1", "spark table"), ("q2", "slow hash query")]


@pytest.fixture(scope="module")
def env(spark):
    docs = spark.createDataFrame(DOCS, "docid long, text string")
    tok = with_tokens(docs, mode="simple").cache()
    q = spark.createDataFrame(QUERIES, "qid string, text string")
    return dict(
        docs=docs,
        tfs=term_freqs(tok),
        dls=doc_lengths(tok),
        q=q,
        qtfs=query_term_freqs(with_tokens(q, mode="simple")),
    )


def test_each_feature_equals_its_scorer(spark, env):
    feats = {
        (r["qid"], r["docid"]): r
        for r in ltr_features(
            env["qtfs"], env["tfs"], env["dls"], mu=1000.0, lam=0.1
        ).collect()
    }
    assert feats  # non-trivial
    for name, ranked in (
        ("qld", qld_topk(env["qtfs"], env["tfs"], env["dls"], k=100)),
        ("tfidf", tfidf_topk(env["qtfs"], env["tfs"], env["dls"], k=100)),
        ("lmjm", lmjm_topk(env["qtfs"], env["tfs"], env["dls"], k=100,
                           lam=0.1)),
    ):
        want = {
            (r["qid"], r["docid"]): round(r["score"], 6)
            for r in ranked.collect()
        }
        for key, sc in want.items():
            assert feats[key][name] == pytest.approx(sc, abs=2e-6), (
                name, key,
            )


def test_match_shape_features_by_hand(spark, env):
    feats = {
        (r["qid"], r["docid"]): r
        for r in ltr_features(env["qtfs"], env["tfs"], env["dls"]).collect()
    }
    r = feats[("q1", 0)]  # "spark table" vs "spark table scan spark"
    assert (r["matched"], r["qlen"], r["sum_tf"], r["dl"]) == (2, 2, 3, 4)
    assert r["coverage"] == 1.0
    r2 = feats[("q2", 4)]  # "slow hash query" vs "hash table"
    assert (r2["matched"], r2["qlen"]) == (1, 3)
    assert r2["coverage"] == float(1) / float(3)
    # docs sharing no query term never appear
    assert ("q2", 1) not in feats


def test_candidates_semi_join(spark, env):
    cand = spark.createDataFrame(
        [("q1", 0), ("q2", 4)], "qid string, docid long"
    )
    full = ltr_features(env["qtfs"], env["tfs"], env["dls"])
    sub = ltr_features(
        env["qtfs"], env["tfs"], env["dls"], candidates=cand
    )
    got = {(r["qid"], r["docid"]): r for r in sub.collect()}
    assert set(got) == {("q1", 0), ("q2", 4)}
    want = {
        (r["qid"], r["docid"]): r
        for r in full.collect()
        if (r["qid"], r["docid"]) in got
    }
    for k in got:
        assert got[k].asDict() == want[k].asDict()


def test_index_twin_equals_corpus_scan(spark, tmp_path):
    from dhr_spark.data.synthetic import synth_queries, synth_transcripts
    from dhr_spark.index.builder import build_index
    from dhr_spark.operators.docids import with_docids
    from dhr_spark.operators.wand import Searcher

    tr = synth_transcripts(spark, 20, seed=6)
    idx = str(tmp_path / "ltr_idx")
    build_index(
        spark, tr, idx, chunk_bits=7, block_size=16, forward_index=True
    )
    s = Searcher(spark, idx)
    q = synth_queries(spark, 6)
    fast = {
        (r["qid"], r["docid"]): r
        for r in s.ltr_features(q, k=20).collect()
    }
    assert fast
    tok = with_tokens(
        with_docids(tr), mode=s.manifest["analyzer_mode"]
    ).cache()
    cand = s.search(q, k=20).select("qid", "docid")
    slow = {
        (r["qid"], r["docid"]): r
        for r in ltr_features(
            query_term_freqs(
                with_tokens(q, mode=s.manifest["analyzer_mode"])
            ),
            term_freqs(tok),
            doc_lengths(tok),
            k1=s.k1,
            b=s.b,
            candidates=cand,
        ).collect()
    }
    assert set(fast) == set(slow)
    for k in fast:
        assert fast[k].asDict() == slow[k].asDict(), k
    # the bm25 feature tracks the first-pass score; duplicate query terms
    # round at a different stage in the kernel (round(w)·qtf vs the
    # kernel's per-posting accumulate), so allow a few-ulp-of-1e-6 band
    scores = {
        (r["qid"], r["docid"]): round(r["score"], 6)
        for r in s.search(q, k=20).collect()
    }
    for k, sc in scores.items():
        assert fast[k]["bm25"] == pytest.approx(sc, abs=5e-6), k
    # guard: no forward index -> actionable error
    idx2 = str(tmp_path / "nofwd")
    build_index(spark, tr, idx2, chunk_bits=7, block_size=16)
    with pytest.raises(ValueError, match="forward_index"):
        Searcher(spark, idx2).ltr_features(q)
