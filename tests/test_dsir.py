"""DSIR importance resampling (operators/dsir.py).

Contracts: hashed features are exact (hand-recomputed md5 buckets);
target==raw degenerates to logw 0; documents matching the target's
n-gram mass outweigh ones that don't; resampling is deterministic,
dense-ranked, and a >17.3-nat margin beats any hash-Gumbel draw (the
deterministic u grid bounds g to ~[-2.7, 14.6]); bucket models merge
additively across corpus slices."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dhr_spark.operators.dsir import (
    dsir_log_weights,
    dsir_resample,
    hashed_ngram_counts,
    hashed_ngram_model,
)

B = 64


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text: str) -> list[str]:
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_features_exact(spark):
    docs = _docs(spark, ["a b a", "x", ""])
    got = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in hashed_ngram_counts(docs, buckets=B).collect()
    }
    want: dict[tuple[int, int], int] = {}
    for i, text in enumerate(["a b a", "x", ""]):
        for g in _grams(text):
            key = (i, _h60(g) % B)
            want[key] = want.get(key, 0) + 1
    assert got == want
    assert not any(d == 2 for d, _ in got)  # empty doc -> no rows


def test_target_equals_raw_gives_zero_weights(spark):
    docs = _docs(spark, ["hash join table", "merge scan", "hash probe"])
    feats = hashed_ngram_counts(docs, buckets=B)
    model = hashed_ngram_model(feats)
    got = dsir_log_weights(feats, model, buckets=B).collect()
    assert len(got) == 3
    assert all(r["logw"] == 0.0 for r in got)
    # n_feats = unigrams + bigrams = 2*len(toks) - 1
    nf = {r["doc_id"]: r["n_feats"] for r in got}
    assert nf == {0: 5, 1: 3, 2: 3}


def test_weights_track_target_distribution(spark):
    raw = _docs(
        spark,
        ["alpha beta alpha beta", "gamma delta epsilon zeta",
         "alpha beta gamma"],
    )
    target = _docs(spark, ["alpha beta alpha", "beta alpha beta"])
    feats = hashed_ngram_counts(raw, buckets=B)
    tmodel = hashed_ngram_model(hashed_ngram_counts(target, buckets=B))
    w = {
        r["doc_id"]: r["logw"]
        for r in dsir_log_weights(feats, tmodel, buckets=B).collect()
    }
    assert w[0] > w[2] > w[1]  # pure match > mixed > disjoint
    assert w[0] > 0 > w[1]


def test_resample_deterministic_and_margin_dominates(spark):
    rows = ["alpha beta alpha beta alpha beta alpha beta alpha beta"] + [
        f"junk{j} filler{j} noise{j}" for j in range(20)
    ]
    raw = _docs(spark, rows)
    target = _docs(spark, ["alpha beta alpha beta alpha"])
    a = dsir_resample(raw, target, k=5, buckets=B, seed=7).collect()
    b = dsir_resample(raw, target, k=5, buckets=B, seed=7).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert [r["rank"] for r in a] == [1, 2, 3, 4, 5]
    # doc 0's repeated target bigrams give it a huge margin: always rank 1
    assert a[0]["doc_id"] == 0
    c = dsir_resample(raw, target, k=5, buckets=B, seed=8).collect()
    assert c[0]["doc_id"] == 0
    assert {r["doc_id"] for r in a} != {r["doc_id"] for r in c} or [
        r["key"] for r in a
    ] != [r["key"] for r in c]  # seed actually moves the draw
    # k beyond candidates: bounded, dense
    d = dsir_resample(raw, target, k=100, buckets=B, seed=7).collect()
    assert len(d) == 21 and d[-1]["rank"] == 21


def test_partial_explicit_models_score_unseen_buckets(spark):
    """An explicit raw_model estimated from a SAMPLE need not cover the
    pool's buckets: features outside BOTH models still count (n_feats)
    and score the never-seen Lidstone constant instead of being silently
    dropped (which would erase the doc's row entirely)."""
    raw = _docs(spark, ["aaa bbb", "ccc ddd eee"])
    feats = hashed_ngram_counts(raw, buckets=B)
    sample = raw.filter("doc_id = 0")
    raw_model = hashed_ngram_model(hashed_ngram_counts(sample, buckets=B))
    tmodel = hashed_ngram_model(
        hashed_ngram_counts(_docs(spark, ["ccc"]), buckets=B)
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in dsir_log_weights(
            feats, tmodel, raw_model=raw_model, buckets=B
        ).collect()
    }
    # doc 1: 3 unigrams + 2 bigrams = 5 features, 4 of them in neither
    # model — the row must exist with the FULL feature count
    assert 1 in got and got[1][0] == 5
    # 'ccc' is target-only, the rest take the never-seen ratio (positive
    # here: smaller target total => bigger 0.5-floor probability)
    assert got[1][1] > 0
    # degenerate check: target == raw sample => doc 0 (fully covered)
    same = {
        r["doc_id"]: r["logw"]
        for r in dsir_log_weights(
            feats, raw_model, raw_model=raw_model, buckets=B
        ).collect()
    }
    assert same[0] == 0.0 and same[1] == 0.0  # unseen constant is 0 too


def test_model_merges_additively(spark):
    docs = _docs(spark, ["a b c", "c d", "a a a"])
    whole = {
        r["bucket"]: r["cnt"]
        for r in hashed_ngram_model(
            hashed_ngram_counts(docs, buckets=B)
        ).collect()
    }
    m1 = hashed_ngram_model(
        hashed_ngram_counts(docs.filter("doc_id < 2"), buckets=B)
    )
    m2 = hashed_ngram_model(
        hashed_ngram_counts(docs.filter("doc_id >= 2"), buckets=B)
    )
    merged = {
        r["bucket"]: r["cnt"]
        for r in hashed_ngram_model(m1.unionByName(m2)).collect()
    }
    assert merged == whole


def test_guards(spark):
    docs = _docs(spark, ["a b"])
    empty = _docs(spark, [""])
    with pytest.raises(ValueError, match="buckets"):
        hashed_ngram_counts(docs, buckets=1)
    with pytest.raises(ValueError, match="k must be"):
        dsir_resample(docs, docs, k=0, buckets=B)
    with pytest.raises(ValueError, match="empty target"):
        dsir_resample(docs, empty, k=1, buckets=B)
    with pytest.raises(ValueError, match="empty raw"):
        dsir_resample(empty, docs, k=1, buckets=B)


def test_broadcast_plan(spark):
    docs = _docs(spark, ["a b c d e", "f g h"])
    feats = hashed_ngram_counts(docs, buckets=B)
    model = hashed_ngram_model(feats)
    plan = dsir_log_weights(feats, model, buckets=B)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
