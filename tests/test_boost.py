"""FunctionScoreQuery (operators/boost.py + Searcher.search_boosted):
index-backed exact mode == corpus slow path, rescore-window convergence,
and the saturation prior's ordering semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.functions.bm25 import bm25_weight_col, idf_col
from dhr_spark.index.builder import build_index_from_docs
from dhr_spark.operators.boost import boosted_topk
from dhr_spark.operators.termfreq import (
    doc_lengths,
    query_term_freqs,
    term_freqs,
    with_tokens,
)
from dhr_spark.operators.wand import Searcher

SF = "/root/testdata/sf0.001"
K1, B = 0.9, 0.4
SCALE = 250.0
K = 10


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.col("doc_id").alias("docid"), "text", "n_chars")
    )


EPOCH0 = 1_700_000_000
MONTH = 2_592_000
NOW = EPOCH0 + MONTH
HALF = 7 * 86400


def _with_ts(docs):
    # deterministic synthetic epoch seconds spread over one month
    return docs.withColumn(
        "ts_s", (F.lit(EPOCH0) + (F.col("docid") * 9973) % MONTH).cast("long")
    )


@pytest.fixture(scope="module")
def idx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("boostidx") / "idx")
    dd = _with_ts(docs)
    build_index_from_docs(
        spark, dd.select("docid", "text"), d, analyzer_mode="simple",
        chunk_bits=6, block_size=16,
        doc_map_df=dd.select("docid", "n_chars", "ts_s"),
        docvalues=["n_chars", "ts_s"],
    )
    return d


@pytest.fixture(scope="module")
def queries(spark):
    rows = [
        ("q1", "spark table scan"),
        ("q2", "merge batch value"),
        ("q3", "the slow window hash"),
    ]
    return spark.createDataFrame(rows, "qid string, text string")


@pytest.fixture(scope="module")
def slow(spark, docs, queries):
    tok = with_tokens(docs.select("docid", "text"), mode="simple")
    tfs, dls = term_freqs(tok), doc_lengths(tok)
    cs = dls.agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    ts = tfs.groupBy("term").agg(F.count("*").alias("df")).withColumn(
        "idf", idf_col(F.col("df"), int(cs["n"]))
    )
    post = (
        tfs.join(dls, "docid")
        .join(F.broadcast(ts.select("term", "idf")), "term")
        .select("term", "docid", bm25_weight_col(
            F.col("tf"), F.col("dl"), F.col("idf"),
            F.lit(float(cs["a"])), K1, B,
        ).alias("weight"))
    )
    qtfs = query_term_freqs(with_tokens(queries, mode="simple"))
    return boosted_topk(
        qtfs, post, docs.select("docid", "n_chars"),
        k=K, scale=SCALE, on="term", signal_col="n_chars",
    ).cache()


def _rows(df):
    return sorted(
        (r["qid"], r["docid"], r["rank"], r["score"]) for r in df.collect()
    )


def test_index_exact_equals_slow_path(spark, idx, queries, slow):
    fast = Searcher(spark, idx).search_boosted(
        queries, "n_chars", scale=SCALE, k=K
    )
    assert _rows(fast) == _rows(slow)


def test_full_window_rescore_equals_exact(spark, idx, queries, slow):
    n = Searcher(spark, idx).manifest["n_docs"]
    windowed = Searcher(spark, idx).search_boosted(
        queries, "n_chars", scale=SCALE, k=K, window=int(n)
    )
    assert _rows(windowed) == _rows(slow)


def test_small_window_is_subset_of_relevance_topw(spark, idx, queries):
    sr = Searcher(spark, idx)
    w = 25
    rescored = sr.search_boosted(queries, "n_chars", scale=SCALE, k=K, window=w)
    topw = sr.search(queries, k=w).select("qid", "docid")
    # every rescored hit came from the relevance top-W window
    assert rescored.join(topw, ["qid", "docid"], "left_anti").count() == 0
    # and within a query, ranks are dense 1..n
    got = rescored.groupBy("qid").agg(
        F.count("*").alias("n"), F.max("rank").alias("mx")
    ).collect()
    assert all(r["n"] == r["mx"] for r in got)


def test_saturation_orders_equal_relevance_by_signal(spark):
    # two docs identical text (same BM25 score for any query), different
    # n_chars: the saturation prior must rank the larger signal first
    docs = spark.createDataFrame(
        [(0, "alpha beta", 40), (1, "alpha beta", 400)],
        "docid long, text string, n_chars int",
    )
    tok = with_tokens(docs.select("docid", "text"), mode="simple")
    tfs, dls = term_freqs(tok), doc_lengths(tok)
    ts = tfs.groupBy("term").agg(F.count("*").alias("df")).withColumn(
        "idf", idf_col(F.col("df"), 2)
    )
    post = (
        tfs.join(dls, "docid")
        .join(F.broadcast(ts.select("term", "idf")), "term")
        .select("term", "docid", bm25_weight_col(
            F.col("tf"), F.col("dl"), F.col("idf"), F.lit(2.0), K1, B,
        ).alias("weight"))
    )
    q = spark.createDataFrame([("q", "alpha")], "qid string, text string")
    got = boosted_topk(
        query_term_freqs(with_tokens(q, mode="simple")), post,
        docs.select("docid", "n_chars"), k=2, on="term",
        signal_col="n_chars",
    ).orderBy("rank").collect()
    assert [r["docid"] for r in got] == [1, 0]
    # factor = v/(v+250): doc 1 -> 400/650, doc 0 -> 40/290
    assert got[0]["score"] > got[1]["score"] > 0
    # a NEGATIVE signal is "no feature, no match" (Lucene FeatureField),
    # never a sign-inverted score
    neg = docs.withColumn(
        "n_chars",
        F.when(F.col("docid") == 0, F.lit(-40)).otherwise(F.col("n_chars")),
    )
    got2 = boosted_topk(
        query_term_freqs(with_tokens(q, mode="simple")), post,
        neg.select("docid", "n_chars"), k=2, on="term",
        signal_col="n_chars",
    ).collect()
    assert [r["docid"] for r in got2] == [1]


def test_missing_docvalue_field_raises(spark, idx, queries):
    with pytest.raises(ValueError, match="docvalues"):
        Searcher(spark, idx).search_boosted(queries, "nosuchfield", k=K)


def _slow_recency(spark, docs, queries):
    from dhr_spark.operators.boost import recency_topk

    tok = with_tokens(docs.select("docid", "text"), mode="simple")
    tfs, dls = term_freqs(tok), doc_lengths(tok)
    cs = dls.agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    ts = tfs.groupBy("term").agg(F.count("*").alias("df")).withColumn(
        "idf", idf_col(F.col("df"), int(cs["n"]))
    )
    post = (
        tfs.join(dls, "docid")
        .join(F.broadcast(ts.select("term", "idf")), "term")
        .select("term", "docid", bm25_weight_col(
            F.col("tf"), F.col("dl"), F.col("idf"),
            F.lit(float(cs["a"])), K1, B,
        ).alias("weight"))
    )
    qtfs = query_term_freqs(with_tokens(queries, mode="simple"))
    return recency_topk(
        qtfs, post, _with_ts(docs).select("docid", "ts_s"),
        now=NOW, half_life_s=HALF, k=K, on="term",
    )


def test_recency_index_equals_slow_path(spark, idx, docs, queries):
    fast = Searcher(spark, idx).search_recency(
        queries, "ts_s", now=NOW, half_life_s=HALF, k=K
    )
    assert _rows(fast) == _rows(_slow_recency(spark, docs, queries))


def test_recency_half_life_and_future_clamp(spark):
    from dhr_spark.operators.boost import recency_rank

    scored = spark.createDataFrame(
        [("q", 0, 2.0), ("q", 1, 2.0), ("q", 2, 2.0)],
        "qid string, docid long, score double",
    )
    # doc 0 exactly one half-life old, doc 1 brand new, doc 2 future-dated
    sig = spark.createDataFrame(
        [(0, NOW - HALF), (1, NOW), (2, NOW + 999)],
        "docid long, ts_s long",
    )
    got = {r["docid"]: r["score"] for r in recency_rank(
        scored, sig, ts_col="ts_s", now=NOW, half_life_s=HALF, k=3
    ).collect()}
    # micros = 2e6; new/future docs get factor exactly 1, half-life = 1/2
    assert got[1] == got[2] == 2_000_000.0
    assert got[0] == 1_000_000.0


def test_recency_bad_half_life_raises(spark, idx, queries):
    with pytest.raises(ValueError, match="half_life"):
        Searcher(spark, idx).search_recency(
            queries, "ts_s", now=NOW, half_life_s=0, k=K
        )


def test_random_hits_deterministic_and_seed_sensitive(spark):
    from dhr_spark.operators.boost import random_hits_topk

    hits = spark.createDataFrame(
        [("q", d) for d in range(40)] + [("q2", 1)],
        "qid string, docid long",
    )
    a = random_hits_topk(hits, seed=7, k=5).collect()
    b = random_hits_topk(hits, seed=7, k=5).collect()
    assert [(r["qid"], r["docid"], r["rank"]) for r in a] == [
        (r["qid"], r["docid"], r["rank"]) for r in b
    ]
    qa = sorted(r["docid"] for r in a if r["qid"] == "q")
    assert len(qa) == 5
    c = random_hits_topk(hits, seed=8, k=5).collect()
    qc = sorted(r["docid"] for r in c if r["qid"] == "q")
    assert qa != qc  # a different seed draws a different sample
    # scores are the hash/2^60 uniform draw, in [0, 1), rank-descending
    sq = [r["score"] for r in a if r["qid"] == "q"]
    assert all(0.0 <= s < 1.0 for s in sq) and sq == sorted(sq, reverse=True)
    # fewer matches than k -> bounded, dense ranks
    two = [r for r in a if r["qid"] == "q2"]
    assert len(two) == 1 and two[0]["rank"] == 1


# ---------------------------------------------------------------- boosting
# Lucene BoostingQuery / ES `boosting`: negative match DEMOTES, never excludes

NEG_ROWS = [("q1", "window"), ("q2", "slow hash")]  # q3 has no negative
NB = 0.25  # 4/16 — integer-exact demotion contract


@pytest.fixture(scope="module")
def negatives(spark):
    return spark.createDataFrame(NEG_ROWS, "qid string, text string")


@pytest.fixture(scope="module")
def neg_hits(spark, docs, negatives):
    tok = with_tokens(docs.select("docid", "text"), mode="simple")
    dterms = tok.select(
        "docid", F.explode(F.array_distinct("tokens")).alias("term")
    )
    nterms = query_term_freqs(with_tokens(negatives, mode="simple")).select(
        "qid", "term"
    )
    return dterms.join(nterms, "term").select("qid", "docid").distinct()


@pytest.fixture(scope="module")
def slow_boosting(spark, docs, queries, neg_hits):
    from dhr_spark.operators.boost import boosting_topk

    tok = with_tokens(docs.select("docid", "text"), mode="simple")
    tfs, dls = term_freqs(tok), doc_lengths(tok)
    cs = dls.agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    ts = tfs.groupBy("term").agg(F.count("*").alias("df")).withColumn(
        "idf", idf_col(F.col("df"), int(cs["n"]))
    )
    post = (
        tfs.join(dls, "docid")
        .join(F.broadcast(ts.select("term", "idf")), "term")
        .select("term", "docid", bm25_weight_col(
            F.col("tf"), F.col("dl"), F.col("idf"),
            F.lit(float(cs["a"])), K1, B,
        ).alias("weight"))
    )
    qtfs = query_term_freqs(with_tokens(queries, mode="simple"))
    return boosting_topk(
        qtfs, post, neg_hits, k=K, negative_boost=NB, on="term"
    ).cache()


def test_boosting_index_equals_slow_path(spark, idx, queries, negatives,
                                         slow_boosting):
    fast = Searcher(spark, idx).search_boosting(
        queries, negatives, negative_boost=NB, k=K
    )
    assert _rows(fast) == _rows(slow_boosting)


def test_boosting_window_full_equals_exact(spark, idx, queries, negatives,
                                           slow_boosting):
    n = Searcher(spark, idx).manifest["n_docs"]
    windowed = Searcher(spark, idx).search_boosting(
        queries, negatives, negative_boost=NB, k=K, window=int(n)
    )
    assert _rows(windowed) == _rows(slow_boosting)


def test_boosting_demotes_never_excludes(spark, idx, queries, negatives,
                                         neg_hits):
    s = Searcher(spark, idx)
    plain = {
        (r["qid"], r["docid"]): r["score"]
        for r in s.search(queries, k=10_000, prune=False).collect()
    }
    neg = {(r["qid"], r["docid"]) for r in neg_hits.collect()}
    boosted = s.search_boosting(
        queries, negatives, negative_boost=NB, k=10_000
    ).collect()
    assert {(r["qid"], r["docid"]) for r in boosted} == set(plain)  # no doc lost
    hit_neg = 0
    for r in boosted:
        key = (r["qid"], r["docid"])
        base = round(plain[key], 6)
        if key in neg:
            hit_neg += 1
            assert r["score"] == pytest.approx(base * NB, abs=1e-12)
        else:
            assert r["score"] == pytest.approx(base, abs=1e-12)
    assert hit_neg > 0  # the negative actually bites
    # q3 carries no negatives row: ordering identical to plain search
    pq3 = [r["docid"] for r in sorted(
        (x for x in boosted if x["qid"] == "q3"), key=lambda x: x["rank"])]
    sq3 = [r["docid"] for r in s.search(queries, k=10_000, prune=False)
           .filter("qid = 'q3'").orderBy("rank").collect()]
    assert pq3 == sq3 and pq3


def test_boosting_zero_boost_sinks_to_zero(spark, idx, queries, negatives,
                                           neg_hits):
    s = Searcher(spark, idx)
    got = s.search_boosting(queries, negatives, negative_boost=0.0,
                            k=10_000).collect()
    neg = {(r["qid"], r["docid"]) for r in neg_hits.collect()}
    zeroed = [r for r in got if (r["qid"], r["docid"]) in neg]
    assert zeroed and all(r["score"] == 0.0 for r in zeroed)
    # demoted docs sit BELOW every non-demoted hit of their query
    for q in {r["qid"] for r in zeroed}:
        worst_pos = max(r["rank"] for r in got
                        if r["qid"] == q and (r["qid"], r["docid"]) not in neg)
        best_zero = min(r["rank"] for r in zeroed if r["qid"] == q)
        assert best_zero > worst_pos


def test_boosting_duplicate_qid_negatives_union(spark, idx, queries):
    """Multiple negatives rows for one qid merge as a term-set UNION —
    per-term rows equal the single multi-term row exactly (a last-row-wins
    collapse would drop one term nondeterministically)."""
    s = Searcher(spark, idx)
    one_row = spark.createDataFrame(
        [("q2", "slow hash")], "qid string, text string"
    )
    two_rows = spark.createDataFrame(
        [("q2", "slow"), ("q2", "hash")], "qid string, text string"
    )
    a = _rows(s.search_boosting(queries, one_row, negative_boost=NB, k=K))
    b = _rows(s.search_boosting(queries, two_rows, negative_boost=NB, k=K))
    assert a == b and a


def test_boosting_guards(spark, idx, queries, negatives):
    with pytest.raises(ValueError, match="multiple of 1/16"):
        Searcher(spark, idx).search_boosting(
            queries, negatives, negative_boost=1 / 3
        )
    with pytest.raises(ValueError, match="multiple of 1/16"):
        Searcher(spark, idx).search_boosting(
            queries, negatives, negative_boost=1.5
        )
    # all-OOV negative: nothing demoted, ranking == plain rounded search
    oov = spark.createDataFrame(
        [("q1", "zzqqxx wwvvuu")], "qid string, text string"
    )
    s = Searcher(spark, idx)
    a = _rows(s.search_boosting(queries, oov, negative_boost=NB, k=K))
    b = _rows(s.search_boosting(
        queries, spark.createDataFrame([], "qid string, text string"),
        negative_boost=NB, k=K,
    ))
    assert a == b
