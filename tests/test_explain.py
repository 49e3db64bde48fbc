"""Searcher.explain — the Lucene IndexSearcher.explain analogue.

Contract: explain's per-term weights are the EXACT decomposition of the
scores search emits — the raw float64 sum(weight) over (qid, docid)
rounds (6 decimals, topk's emitted precision) to the search score, under
default AND overridden k1/b. Terms absent from a doc emit no row.
"""

from __future__ import annotations

import pytest

from dhr_spark.data.synthetic import synth_transcripts, synth_queries
from dhr_spark.index.builder import build_index
from dhr_spark.operators.wand import Searcher


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("explain_idx") / "idx")
    tr = synth_transcripts(spark, 40)
    build_index(
        spark, tr, idx, chunk_bits=6, block_size=8,
        docid_strategy="window", forward_index=True,
    )
    return dict(idx=idx, queries=synth_queries(spark, 8))


def _totals(expl):
    from pyspark.sql import functions as F

    return {
        (r["qid"], r["docid"]): r["tot"]
        for r in expl.groupBy("qid", "docid")
        .agg(F.sum("weight").alias("tot"))
        .collect()
    }


@pytest.mark.parametrize("k1,b", [(None, None), (1.2, 0.75)])
def test_explain_sums_to_search_scores(spark, env, k1, b):
    kw = {} if k1 is None else dict(k1=k1, b=b)
    s = Searcher(spark, env["idx"], **kw)
    res = s.search(env["queries"], k=10)
    tot = _totals(s.explain(env["queries"], res))
    hits = res.collect()
    assert hits and len(tot) == len({(r["qid"], r["docid"]) for r in hits})
    # topk emits round(score, 6); the raw float64 sum must round to it
    for r in hits:
        assert round(tot[(r["qid"], r["docid"])], 6) == pytest.approx(
            r["score"], abs=1e-12
        )


def test_explain_matched_terms_only_and_inputs(spark, env):
    s = Searcher(spark, env["idx"])
    res = s.search(env["queries"], k=5)
    rows = s.explain(env["queries"], res).collect()
    docids = {r["docid"] for r in res.collect()}
    assert {r["docid"] for r in rows} <= docids
    for r in rows:
        assert r["tf"] >= 1 and r["dl"] >= r["tf"] and r["qtf"] >= 1
        assert r["idf"] > 0 and r["weight"] > 0
    # a (qid, docid, term) triple appears at most once
    trips = [(r["qid"], r["docid"], r["term"]) for r in rows]
    assert len(trips) == len(set(trips))


def test_explain_requires_forward_index(spark, tmp_path):
    idx = str(tmp_path / "noforward")
    tr = synth_transcripts(spark, 10)
    build_index(spark, tr, idx, chunk_bits=6, block_size=8,
                docid_strategy="window")
    s = Searcher(spark, idx)
    with pytest.raises(ValueError, match="forward_index"):
        s.explain(synth_queries(spark, 2), s.search(synth_queries(spark, 2), k=3))


def test_explain_empty_query_set(spark, env):
    s = Searcher(spark, env["idx"])
    q = spark.createDataFrame([("q0", "zzzz qqqq")], "qid string, text string")
    assert s.explain(q, s.search(env["queries"], k=3)).count() == 0
