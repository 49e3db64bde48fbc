"""Searcher.count (TotalHitCountCollector) and Searcher.search_after
(cursor pagination).

Contracts: count equals the slow path's distinct matching-doc count per
query; walking pages with search_after reconstructs search(k)'s ranking
EXACTLY (same docids, same scores, page-local ranks), with and without
block pruning; a cursor past the last hit yields an empty page.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.builder import build_index
from dhr_spark.operators.wand import Searcher


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("page_idx") / "idx")
    tr = synth_transcripts(spark, 40)
    build_index(spark, tr, idx, chunk_bits=6, block_size=8,
                docid_strategy="window")
    return dict(searcher=Searcher(spark, idx), queries=synth_queries(spark, 8))


def test_count_matches_unbounded_search(spark, env):
    s = env["searcher"]
    # prune=False + huge k materializes every matching doc exactly once
    full = s.search(env["queries"], k=1_000_000, prune=False)
    exp = {
        r["qid"]: r["n"]
        for r in full.groupBy("qid").agg(F.count("*").alias("n")).collect()
    }
    got = {r["qid"]: r["n"] for r in s.count(env["queries"]).collect()}
    assert got == exp and got


def test_count_oov_only_query(spark, env):
    q = spark.createDataFrame([("qx", "zzzz qqqqq")], "qid string, text string")
    assert env["searcher"].count(q).count() == 0


@pytest.mark.parametrize("prune", [True, False])
def test_page_walk_reconstructs_topk(spark, env, prune):
    s = env["searcher"]
    k, size = 20, 5
    want = {}
    for r in s.search(env["queries"], k=k, prune=prune).collect():
        want.setdefault(r["qid"], []).append((r["rank"], r["docid"], r["score"]))
    got: dict[str, list] = {q: [] for q in want}
    cursors: dict[str, tuple[float, int]] = {}
    qdf = env["queries"]
    for page in range(k // size):
        res = (
            s.search(qdf, k=size, prune=prune)
            if page == 0
            else s.search_after(qdf, cursors, size=size, prune=prune)
        )
        rows = res.collect()
        if not rows:
            break
        last: dict[str, tuple[float, int]] = {}
        for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
            got[r["qid"]].append(
                (page * size + r["rank"], r["docid"], r["score"])
            )
            last[r["qid"]] = (r["score"], r["docid"])
        cursors = last
        qdf = env["queries"].filter(
            F.col("qid").isin(list(last.keys()))
        )
        if not last:
            break
    assert got == want


def test_cursor_past_end_is_empty(spark, env):
    s = env["searcher"]
    q = env["queries"].limit(1)
    qid = q.collect()[0]["qid"]
    assert s.search_after(q, {qid: (0.0, 1 << 40)}, size=5).count() == 0


def test_page2_disjoint_from_page1(spark, env):
    s = env["searcher"]
    p1 = s.search(env["queries"], k=5)
    cursors = {
        r["qid"]: (r["score"], r["docid"])
        for r in p1.filter(F.col("rank") == 5).collect()
    }
    q2 = env["queries"].filter(F.col("qid").isin(list(cursors.keys())))
    p2 = s.search_after(q2, cursors, size=5)
    seen1 = {(r["qid"], r["docid"]) for r in p1.collect()}
    for r in p2.collect():
        assert (r["qid"], r["docid"]) not in seen1
        assert 1 <= r["rank"] <= 5


def test_interactive_broadcast_path_identical(spark, env, tmp_path):
    """The interactive doclens-broadcast fast path (Searcher._dl_bc) must be
    score- and rank-identical to the cogrouped plan, for search AND
    search_after."""
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        s0 = env["searcher"]
        si = Searcher(spark, s0.index_dir, interactive=True)
        assert si._dl_bc is not None  # gate admits the tiny fixture
        q = env["queries"]
        a = sorted(map(tuple, s0.search(q, k=10).collect()))
        b = sorted(map(tuple, si.search(q, k=10).collect()))
        assert a == b and a
        cursors = {
            r["qid"]: (r["score"], r["docid"])
            for r in s0.search(q, k=3).filter(F.col("rank") == 3).collect()
        }
        q2 = q.filter(F.col("qid").isin(list(cursors.keys())))
        a2 = sorted(map(tuple, s0.search_after(q2, cursors, size=3).collect()))
        b2 = sorted(map(tuple, si.search_after(q2, cursors, size=3).collect()))
        assert a2 == b2 and a2
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
