"""Range-sharded index: pruning correctness and union-index identity.

The contract under test (dhr_spark/index/sharded.py): a range-sharded
layout answers ``search(lo=, hi=)`` identically — docids, scores, ranks —
to ``search_filtered(field, lo=, hi=)`` on a single index built over the
union corpus, while reading only the shards whose key range intersects.
"""

import pytest
from pyspark.sql import functions as F

from dhr_spark.index.builder import build_index_from_docs
from dhr_spark.index.sharded import ShardedSearcher, build_range_sharded
from dhr_spark.operators.wand import Searcher

pytestmark = pytest.mark.usefixtures("spark")


def _mk_docs(spark, n=120):
    # deterministic corpus with a size-class shard key spanning [10, 250)
    rows = []
    vocab = ["hash", "table", "scan", "merge", "join", "spark", "query",
             "plan", "index", "block"]
    for i in range(n):
        words = [vocab[(i + j) % len(vocab)] for j in range(3 + i % 7)]
        rows.append((i, " ".join(words), 10 + (i * 2) % 240))
    return spark.createDataFrame(
        rows, "docid long, text string, size long"
    )


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sharded")
    docs = _mk_docs(spark)
    union_dir = str(root / "union")
    build_index_from_docs(
        spark, docs, union_dir, analyzer_mode="simple", chunk_bits=6,
        block_size=16, docvalues=["size"],
        doc_map_df=docs.select("docid", "size"),
    )
    sharded_dir = str(root / "byrange")
    man = build_range_sharded(
        spark, docs, sharded_dir, "size", cuts=[80, 160],
        analyzer_mode="simple", chunk_bits=6, block_size=16,
    )
    return {
        "docs": docs, "union": union_dir, "sharded": sharded_dir,
        "manifest": man,
    }


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(
        [("q1", "hash table"), ("q2", "merge join spark"), ("q3", "zzyzx")],
        "qid string, text string",
    )


def _as_map(rows):
    return {(r["qid"], r["docid"]): (r["rank"], round(r["score"], 6))
            for r in rows}


def test_sharded_layout(corpus):
    shards = corpus["manifest"]["shards"]
    assert len(shards) == 3
    assert [s["lo"] for s in shards] == [None, 80, 160]
    assert [s["hi"] for s in shards] == [80, 160, None]
    assert sum(s["n_docs"] for s in shards) == 120


@pytest.mark.parametrize("lo,hi", [(80, 159), (0, 79), (100, 400),
                                   (None, 120), (155, None)])
def test_range_identity_with_union_index(spark, corpus, queries, lo, hi):
    ss = ShardedSearcher(spark, corpus["sharded"])
    got = _as_map(ss.search(queries, k=50, lo=lo, hi=hi).collect())
    want = _as_map(
        Searcher(spark, corpus["union"])
        .search_filtered(queries, "size", lo=lo, hi=hi, k=50)
        .collect()
    )
    assert got == want and got


def test_unranged_identity_with_union_index(spark, corpus, queries):
    ss = ShardedSearcher(spark, corpus["sharded"])
    got = _as_map(ss.search(queries, k=50).collect())
    want = _as_map(
        Searcher(spark, corpus["union"]).search(queries, k=50).collect()
    )
    assert got == want and got


def test_shard_pruning_decisions(spark, corpus):
    ss = ShardedSearcher(spark, corpus["sharded"])
    # wholly inside the middle shard: size is a LONG key, so the build
    # recorded integer_key and [80, 159] fully covers [80, 160)
    # (v < 160 <=> v <= 159) — plain WAND, no docvalues filter
    assert ss.manifest["integer_key"] is True
    assert ss.select_shards(80, 159) == [(1, True)]
    # exact half-open cover -> full scan, no filter
    assert ss.select_shards(80, 160) == [(1, True), (2, False)]
    # left-open query touches shards 0 and 1 only
    assert ss.select_shards(None, 100) == [(0, True), (1, False)]
    # the open-ended tail shard intersects ANY high range (it cannot know
    # its own max), so it is selected — filtered — and returns nothing
    assert ss.select_shards(10_000, 20_000) == [(2, False)]
    got = ss.search(
        spark.createDataFrame([("q", "hash")], "qid string, text string"),
        lo=10_000, hi=20_000,
    )
    assert got.count() == 0


def test_empty_shard_and_null_guards(spark, tmp_path):
    docs = _mk_docs(spark, n=20)  # size in [10, 48]
    man = build_range_sharded(
        spark, docs, str(tmp_path / "gap"), "size", cuts=[100],
        analyzer_mode="simple", chunk_bits=6, block_size=16,
    )
    assert man["shards"][1]["dir"] is None  # [100, inf) is empty
    ss = ShardedSearcher(spark, str(tmp_path / "gap"))
    q = spark.createDataFrame([("q", "hash")], "qid string, text string")
    assert ss.search(q, k=10).count() > 0
    assert ss.select_shards(150, None) == []
    with pytest.raises(ValueError, match="NULL"):
        build_range_sharded(
            spark,
            docs.withColumn(
                "size", F.when(F.col("docid") < 2, None).otherwise(F.col("size"))
            ),
            str(tmp_path / "bad"), "size", cuts=[100],
            analyzer_mode="simple", chunk_bits=6, block_size=16,
        )
    with pytest.raises(ValueError, match="ascending"):
        build_range_sharded(
            spark, docs, str(tmp_path / "bad2"), "size", cuts=[100, 50],
            analyzer_mode="simple", chunk_bits=6, block_size=16,
        )


def test_append_to_sharded_identity_and_routing(spark, tmp_path):
    from dhr_spark.index.sharded import append_to_sharded

    docs = _mk_docs(spark, n=60)  # sizes 10..128 -> shards (.,80) [80,160)
    root = str(tmp_path / "appendable")
    build_range_sharded(
        spark, docs, root, "size", cuts=[80, 160],
        analyzer_mode="simple", chunk_bits=6, block_size=16,
    )
    # batch spans a historical shard (size 40), the mid shard (100), and
    # the previously-EMPTY tail shard (200)
    batch = spark.createDataFrame(
        [("hash table scan fresh", 40),
         ("merge join spark fresh", 100),
         ("query plan index fresh", 200)],
        "text string, size long",
    )
    res = append_to_sharded(spark, batch, root)
    assert res["shards_touched"] == [0, 1, 2]
    base = res["base"]
    # deterministic allocation: ordered by (size, text) from the global base
    expected_ids = {40: base, 100: base + 1, 200: base + 2}

    ss = ShardedSearcher(spark, root)
    q = spark.createDataFrame([("q", "fresh")], "qid string, text string")
    got = {r["docid"]: r["score"] for r in ss.search(q, k=10).collect()}
    assert set(got) == set(expected_ids.values())
    # range pruning still exact after the append
    mid = {r["docid"] for r in ss.search(q, k=10, lo=80, hi=160).collect()}
    assert mid == {expected_ids[100]}
    tail = {r["docid"] for r in ss.search(q, k=10, lo=161, hi=None).collect()}
    assert tail == {expected_ids[200]}

    # identity with a union index over corpus+batch at the SAME docids
    union_docs = docs.unionByName(
        spark.createDataFrame(
            [(expected_ids[s], t, s) for t, s in
             [("hash table scan fresh", 40), ("merge join spark fresh", 100),
              ("query plan index fresh", 200)]],
            "docid long, text string, size long",
        )
    )
    union_dir = str(tmp_path / "union_after")
    build_index_from_docs(
        spark, union_docs, union_dir, analyzer_mode="simple", chunk_bits=6,
        block_size=16, docvalues=["size"],
        doc_map_df=union_docs.select("docid", "size"),
    )
    queries = spark.createDataFrame(
        [("q1", "hash table"), ("q2", "fresh query")],
        "qid string, text string",
    )
    got = _as_map(ss.search(queries, k=50, lo=30, hi=220).collect())
    want = _as_map(
        Searcher(spark, union_dir)
        .search_filtered(queries, "size", lo=30, hi=220, k=50)
        .collect()
    )
    assert got == want and got

    # a second append allocates past the first (docids stay disjoint)
    res2 = append_to_sharded(
        spark,
        spark.createDataFrame([("second fresh batch", 90)],
                              "text string, size long"),
        root,
    )
    assert res2["base"] > max(expected_ids.values())


def test_append_to_sharded_null_guard(spark, tmp_path):
    from dhr_spark.index.sharded import append_to_sharded

    docs = _mk_docs(spark, n=30)
    root = str(tmp_path / "nullguard")
    build_range_sharded(
        spark, docs, root, "size", cuts=[80],
        analyzer_mode="simple", chunk_bits=6, block_size=16,
    )
    with pytest.raises(ValueError, match="NULL"):
        append_to_sharded(
            spark,
            spark.createDataFrame([("x", None)], "text string, size long"),
            root,
        )


def test_append_docs_to_index_guards(spark, tmp_path):
    from dhr_spark.index.incremental import append_docs_to_index

    docs = _mk_docs(spark, n=20).select("docid", "text")
    d = str(tmp_path / "gen")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple", chunk_bits=6, block_size=16,
    )
    # below the next chunk boundary -> rejected
    low = spark.createDataFrame([(5, "dup hash")], "docid long, text string")
    with pytest.raises(ValueError, match="chunk boundary"):
        append_docs_to_index(spark, low, d)
    # duplicate docids -> rejected
    dup = spark.createDataFrame(
        [(128, "a b"), (128, "c d")], "docid long, text string"
    )
    with pytest.raises(ValueError, match="duplicate"):
        append_docs_to_index(spark, dup, d)
    # a clean append at the boundary lands and is searchable
    ok = spark.createDataFrame(
        [(128, "freshterm hash")], "docid long, text string"
    )
    man = append_docs_to_index(spark, ok, d)
    assert man["n_docs"] == 21
    s = Searcher(spark, d)
    q = spark.createDataFrame([("q", "freshterm")], "qid string, text string")
    assert {r["docid"] for r in s.search(q, k=5).collect()} == {128}


@pytest.mark.parametrize("sim,param", [("qld", 1000.0), ("tfidf", None),
                                       ("f2log", 0.5)])
def test_search_filtered_composes_with_similarities(spark, corpus, queries,
                                                    sim, param):
    """A filter clause composes with every pluggable scorer (Lucene filter
    semantics): search_filtered(sim=X) == full X-search restricted to the
    range and re-ranked."""
    from pyspark.sql import Window

    s = Searcher(spark, corpus["union"])
    got = _as_map(
        s.search_filtered(
            queries, "size", lo=60, hi=180, k=50, sim=sim, sim_param=param
        ).collect()
    )
    full = {
        "qld": lambda: s.search_qld(queries, k=100_000, prune=False),
        "tfidf": lambda: s.search_tfidf(queries, k=100_000, prune=False),
        "f2log": lambda: s.search_f2log(queries, k=100_000, prune=False),
    }[sim]()
    dv = spark.read.parquet(f"{corpus['union']}/doc_map").filter(
        (F.col("size") >= 60) & (F.col("size") <= 180)
    )
    want_rows = (
        full.join(dv.select("docid"), "docid")
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.round("score", 6).desc(), F.col("docid").asc()
                )
            ),
        )
        .filter(F.col("rank") <= 50)
        .collect()
    )
    want = {
        (r["qid"], r["docid"]): (r["rank"], round(r["score"], 6))
        for r in want_rows
    }
    assert got == want and got


def test_search_filtered_sim_guards(spark, corpus, queries):
    s = Searcher(spark, corpus["union"])
    with pytest.raises(ValueError, match="unknown similarity"):
        s.search_filtered(queries, "size", lo=0, sim="dfr")
    with pytest.raises(ValueError, match="lambda"):
        s.search_filtered(queries, "size", lo=0, sim="lmjm", sim_param=2.0)


@pytest.mark.parametrize("sim", ["qld", "tfidf"])
def test_sharded_range_composes_with_similarities(spark, corpus, queries, sim):
    """Range-pruned sharded search federates every pluggable similarity:
    == union-index search_filtered under the same scorer (merged global
    stats on both sides)."""
    ss = ShardedSearcher(spark, corpus["sharded"])
    got = _as_map(ss.search(queries, k=50, lo=60, hi=180, sim=sim).collect())
    want = _as_map(
        Searcher(spark, corpus["union"])
        .search_filtered(queries, "size", lo=60, hi=180, k=50, sim=sim)
        .collect()
    )
    assert got == want and got
    # unranged too (full-shard dispatch path)
    got = _as_map(ss.search(queries, k=50, sim=sim).collect())
    full = {
        "qld": lambda: Searcher(spark, corpus["union"]).search_qld(queries, k=50),
        "tfidf": lambda: Searcher(spark, corpus["union"]).search_tfidf(queries, k=50),
    }[sim]()
    assert got == _as_map(full.collect()) and got
