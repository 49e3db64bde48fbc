"""Run fusion (operators/fusion.py) + bpref (functions/metrics.py) —
hand-computed references; cross-engine exactness is pinned by the
rrf_fusion / fusion_interpolation / bpref_at_10 DuckDB oracles."""

from __future__ import annotations

import pytest

from dhr_spark.functions.metrics import bpref_at_k
from dhr_spark.operators.fusion import interpolate_fuse, rrf_fuse

RUN_SCHEMA = "qid string, docid long, rank int, score double"


def _run(spark, rows):
    return spark.createDataFrame(rows, RUN_SCHEMA)


def test_rrf_hand_computed(spark):
    a = _run(spark, [("q", 1, 1, 9.0), ("q", 2, 2, 8.0), ("q", 3, 3, 7.0)])
    b = _run(spark, [("q", 3, 1, 0.9), ("q", 1, 2, 0.8), ("q", 4, 3, 0.7)])
    got = {r["docid"]: (r["rank"], r["score"])
           for r in rrf_fuse([a, b], k=10).collect()}
    micros = lambda r: round(1e6 / (60 + r))  # noqa: E731
    exp = {
        1: micros(1) + micros(2),
        2: micros(2),
        3: micros(3) + micros(1),
        4: micros(3),
    }
    order = sorted(exp, key=lambda d: (-exp[d], d))
    for rank, d in enumerate(order, 1):
        assert got[d] == (rank, exp[d] / 1e6)


def test_rrf_tie_breaks_on_docid(spark):
    a = _run(spark, [("q", 7, 1, 1.0)])
    b = _run(spark, [("q", 5, 1, 1.0)])
    rows = rrf_fuse([a, b], k=10).collect()
    assert [(r["docid"], r["rank"]) for r in
            sorted(rows, key=lambda r: r["rank"])] == [(5, 1), (7, 2)]


def test_rrf_guards(spark):
    a = _run(spark, [("q", 1, 1, 1.0)])
    with pytest.raises(ValueError, match=">= 2 runs"):
        rrf_fuse([a])
    with pytest.raises(ValueError, match="k_rrf"):
        rrf_fuse([a, a], k_rrf=0)


def test_interpolation_zero_fill_and_alpha(spark):
    a = _run(spark, [("q", 1, 1, 1.0), ("q", 2, 2, 0.5)])
    b = _run(spark, [("q", 2, 1, 1.0), ("q", 3, 2, 0.25)])
    got = {r["docid"]: r["score"]
           for r in interpolate_fuse(a, b, alpha=0.75, k=10).collect()}
    assert got == {1: 0.75, 2: 0.625, 3: 0.0625}
    with pytest.raises(ValueError, match="alpha"):
        interpolate_fuse(a, b, alpha=1.5)


QRELS_SCHEMA = "qid string, docid long, rel int"


def test_bpref_hand_computed(spark):
    # run: R N R N R U  (R=rel, N=judged-nonrel, U=unjudged)
    run = _run(spark, [("q", d, i + 1, 1.0) for i, d in
                       enumerate([10, 20, 11, 21, 12, 99])])
    pool = spark.createDataFrame(
        [("q", 10, 1), ("q", 11, 1), ("q", 12, 1), ("q", 13, 1),
         ("q", 20, 0), ("q", 21, 0)],
        QRELS_SCHEMA,
    )
    # R=4, N=2, D=min(4,2)=2; numer per rel hit: 10 -> 2-0, 11 -> 2-1,
    # 12 -> 2-2; 13 unretrieved contributes 0; bpref = (2+1+0)/(4*2)
    r = bpref_at_k(run, pool, k=10).collect()
    assert [(x["qid"], x["bpref"]) for x in r] == [("q", round(3 / 8, 6))]


def test_bpref_no_judged_nonrelevant(spark):
    # D = 0: every retrieved relevant doc contributes a full 1
    run = _run(spark, [("q", 10, 1, 1.0), ("q", 99, 2, 0.9)])
    pool = spark.createDataFrame(
        [("q", 10, 1), ("q", 11, 1)], QRELS_SCHEMA
    )
    r = bpref_at_k(run, pool, k=10).collect()
    assert [(x["qid"], x["bpref"]) for x in r] == [("q", 0.5)]


def test_bpref_unjudged_ignored(spark):
    # a wall of unjudged docs above the relevant one must not hurt bpref
    run = _run(spark, [("q", d, i + 1, 1.0) for i, d in
                       enumerate([91, 92, 93, 10, 20])])
    pool = spark.createDataFrame(
        [("q", 10, 1), ("q", 20, 0)], QRELS_SCHEMA
    )
    # the only judged doc above docid 10 is none (20 sits below): numer =
    # D - 0 = 1, bpref = 1/(1*1) = 1.0
    r = bpref_at_k(run, pool, k=10).collect()
    assert [(x["qid"], x["bpref"]) for x in r] == [("q", 1.0)]


def test_search_fused_guards(spark, tmp_path):
    from dhr_spark.index.builder import build_index_from_docs
    from dhr_spark.operators.wand import Searcher
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").alias("docid"), "text")
    )
    d = str(tmp_path / "idx")
    build_index_from_docs(spark, docs, d, analyzer_mode="simple",
                          chunk_bits=6, block_size=16)
    sr = Searcher(spark, d)
    q = spark.createDataFrame([("q1", "spark table")], "qid string, text string")
    with pytest.raises(ValueError, match=">= 2 sims"):
        sr.search_fused(q, sims=["bm25"])
    # three-way ensemble runs and ranks densely
    rows = sr.search_fused(q, sims=["bm25", "qld", ("inl2", 0.5)], k=5).collect()
    assert rows and sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))


def test_combsum_hand_computed(spark):
    from dhr_spark.operators.fusion import combsum_fuse

    # run A scores 4/2/0 -> norms 1.0/0.5/0.0; run B has d1 and d3 only,
    # scores 10/0 -> norms 1.0/0.0. CombSUM: d1=2.0, d2=0.5, d3=0.0.
    a = spark.createDataFrame(
        [("q", 1, 1, 4.0), ("q", 2, 2, 2.0), ("q", 3, 3, 0.0)],
        "qid string, docid long, rank int, score double",
    )
    b = spark.createDataFrame(
        [("q", 1, 1, 10.0), ("q", 3, 2, 0.0)],
        "qid string, docid long, rank int, score double",
    )
    got = {r["docid"]: (r["rank"], r["score"])
           for r in combsum_fuse([a, b], k=10).collect()}
    assert got == {1: (1, 2.0), 2: (2, 0.5), 3: (3, 0.0)}
    # CombMNZ doubles two-run docs: d1=4.0, d2=0.5, d3=0.0
    mnz = {r["docid"]: r["score"]
           for r in combsum_fuse([a, b], k=10, mnz=True).collect()}
    assert mnz == {1: 4.0, 2: 0.5, 3: 0.0}


def test_combsum_uniform_run_and_guards(spark):
    from dhr_spark.operators.fusion import combsum_fuse
    import pytest as _pt

    # a run with all-equal scores normalizes every doc to 1.0
    a = spark.createDataFrame(
        [("q", 1, 1, 7.0), ("q", 2, 2, 7.0)],
        "qid string, docid long, rank int, score double",
    )
    b = spark.createDataFrame(
        [("q", 1, 1, 3.0), ("q", 2, 2, 1.0)],
        "qid string, docid long, rank int, score double",
    )
    got = {r["docid"]: r["score"] for r in combsum_fuse([a, b]).collect()}
    assert got == {1: 2.0, 2: 1.0}
    with _pt.raises(ValueError, match=">= 2 runs"):
        combsum_fuse([a])
