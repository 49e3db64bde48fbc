"""Hand-computed fixtures for the metric aggregates — in particular the two
surfaces VERDICT r01 flagged as untested: hole@k (U4, left-anti) and
top-k-accuracy (custom_metrics.py:103-116)."""

from __future__ import annotations

import pytest

from dhr_spark.functions import metrics as M


@pytest.fixture(scope="module")
def run(spark):
    rows = [
        ("q1", 10, 1, 5.0), ("q1", 11, 2, 4.0), ("q1", 12, 3, 3.0),
        ("q2", 20, 1, 9.0), ("q2", 21, 2, 8.0), ("q2", 22, 3, 7.0),
    ]
    return spark.createDataFrame(
        rows, "qid string, docid long, rank int, score double"
    )


@pytest.fixture(scope="module")
def qrels(spark):
    rows = [("q1", 11), ("q1", 99), ("q3", 30)]
    return spark.createDataFrame(rows, "qid string, docid long")


def _by_qid(df, col):
    return {r["qid"]: r[col] for r in df.collect()}


def test_hole_at_k(run, qrels):
    # q1 top-3 = [10, 11, 12], annotated = {11, 99} -> 2/3 unjudged
    # q2 has no annotations at all -> 3/3 unjudged
    # q3 has no run rows -> no hole row (denominator comes from the run)
    holes = _by_qid(M.hole_at_k(run, qrels, k=10), "hole")
    assert holes == {"q1": 0.666667, "q2": 1.0}


def test_top_k_accuracy(run, qrels):
    accs = _by_qid(M.top_k_accuracy_at_k(run, qrels, k=10), "acc")
    assert accs == {"q1": 1.0, "q2": 0.0, "q3": 0.0}


def test_top_k_accuracy_respects_k(run, qrels):
    # q1's only relevant hit is at rank 2 -> acc@1 must be 0
    accs = _by_qid(M.top_k_accuracy_at_k(run, qrels, k=1), "acc")
    assert accs == {"q1": 0.0, "q2": 0.0, "q3": 0.0}


def test_mrr_sanity(run, qrels):
    rrs = _by_qid(M.mrr_at_k(run, qrels, k=10), "rr")
    assert rrs == {"q1": 0.5, "q2": 0.0, "q3": 0.0}
