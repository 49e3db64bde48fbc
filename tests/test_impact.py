"""Impact-scored retrieval (uniCOIL / DeepImpact / SPLADE analogue).

Covers: quantization exactness, the index == slow-path identity (text and
weighted queries), prune == noprune, and the scoring-mismatch guards.
Reference semantics anchor: densify_corpus.py:109 model switch +
gip_retrieval.py:117-126 gated inner product.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from dhr_spark.index.impact import build_impact_index
from dhr_spark.operators.impact import impact_topk, quantize_impacts
from dhr_spark.operators.wand import Searcher

CORPUS = [
    (0, "spark streams data fast spark"),
    (1, "slow batch data"),
    (2, "spark spark spark engine"),
    (3, "data data data data lake house"),
    (4, "query engine joins fast"),
    (5, "hash join shuffle spark data"),
]

QUERIES = [
    ("q1", "spark data"),
    ("q2", "fast engine"),
    ("q3", "zzyzx"),
]


def _impacts_df(spark):
    """Deterministic integer impacts: tf · (1 + len(term) % 3)."""
    rows = []
    for docid, text in CORPUS:
        tf: dict[str, int] = {}
        for t in text.split():
            tf[t] = tf.get(t, 0) + 1
        for t, c in tf.items():
            rows.append((docid, t, c * (1 + len(t) % 3)))
    return spark.createDataFrame(rows, "docid long, term string, impact long")


def _queries_df(spark):
    return spark.createDataFrame(QUERIES, "qid string, text string")


def _qweights_df(spark):
    rows = []
    for qid, text in QUERIES:
        tf: dict[str, int] = {}
        for t in text.split():
            tf[t] = tf.get(t, 0) + 1
        rows += [(qid, t, float(c)) for t, c in tf.items()]
    return spark.createDataFrame(rows, "qid string, term string, weight double")


@pytest.fixture(scope="module")
def impact_idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("impact_idx") / "idx")
    build_impact_index(
        spark,
        _impacts_df(spark),
        d,
        analyzer_mode="simple",
        chunk_bits=2,  # docids 0..5 span 2 chunks — exercises the merge
        block_size=4,
    )
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _runs(df):
    return sorted(
        (r["qid"], r["rank"], r["docid"], round(r["score"], 6))
        for r in df.collect()
    )


# ------------------------------------------------------------- quantization


def test_quantize_maps_max_to_levels_and_nonzero_to_at_least_one(spark):
    w = spark.createDataFrame(
        [
            (0, "a", 10.0),
            (0, "b", 0.0390625),  # tiny but nonzero -> clamps to 1
            (1, "a", 5.0),
            (1, "c", 0.0),  # dropped (encoder sparsification)
            (2, "d", -1.0),  # dropped
        ],
        "docid long, term string, weight double",
    )
    got = {
        (r["docid"], r["term"]): r["impact"]
        for r in quantize_impacts(w, bits=8).collect()
    }
    assert got[(0, "a")] == 255  # corpus max -> 2^8 - 1
    assert got[(1, "a")] == 128  # 5/10*255 = 127.5 -> half-up 128
    assert got[(0, "b")] == 1  # 0.039.../10*255 ~ 0.996 -> floor 0 -> clamp 1
    assert (1, "c") not in got and (2, "d") not in got


def test_quantize_bits_guard(spark):
    w = spark.createDataFrame([(0, "a", 1.0)], "docid long, term string, weight double")
    with pytest.raises(ValueError, match="bits"):
        quantize_impacts(w, bits=0)


def test_quantized_scores_are_exact_integers(spark):
    # integer impacts x integer query weights -> integer scores end-to-end
    q = quantize_impacts(
        spark.createDataFrame(
            [(0, "a", 2.5), (1, "a", 1.25), (1, "b", 5.0)],
            "docid long, term string, weight double",
        ),
        bits=4,
    )
    qw = spark.createDataFrame(
        [("q", "a", 3), ("q", "b", 1)], "qid string, term string, qweight long"
    )
    scores = {r["docid"]: r["score"] for r in impact_topk(q, qw, 10).collect()}
    assert all(s == int(s) for s in scores.values())
    # max weight 5.0 -> 15; 2.5 -> 7.5 half-up 8; 1.25 -> 3.75 -> 4
    assert scores[0] == 3 * 8 and scores[1] == 3 * 4 + 15


# ------------------------------------------------- index == slow path


def test_search_impact_matches_slow_path(spark, impact_idx):
    s = Searcher(spark, impact_idx)
    fast = s.search_impact(_queries_df(spark), k=10)
    qw = _qweights_df(spark).withColumnRenamed("weight", "qweight")
    slow = impact_topk(_impacts_df(spark), qw, k=10)
    assert _runs(fast) == _runs(slow)


def test_search_impact_weighted_queries(spark, impact_idx):
    s = Searcher(spark, impact_idx)
    # fractional encoder weights exercise the non-analyzer path
    qw = spark.createDataFrame(
        [("qa", "spark", 1.5), ("qa", "data", 0.5), ("qb", "engine", 2.0)],
        "qid string, term string, weight double",
    )
    fast = s.search_impact(qw, k=10)
    slow = impact_topk(
        _impacts_df(spark), qw.withColumnRenamed("weight", "qweight"), k=10
    )
    assert _runs(fast) == _runs(slow)
    # zero/negative weights contribute nothing
    qw0 = qw.union(
        spark.createDataFrame(
            [("qa", "fast", 0.0), ("qb", "join", -3.0)],
            "qid string, term string, weight double",
        )
    )
    assert _runs(s.search_impact(qw0, k=10)) == _runs(fast)


def test_prune_equals_noprune(spark, impact_idx):
    s = Searcher(spark, impact_idx)
    q = _queries_df(spark)
    assert _runs(s.search_impact(q, k=3, prune=True)) == _runs(
        s.search_impact(q, k=3, prune=False)
    )


def test_oov_query_empty(spark, impact_idx):
    s = Searcher(spark, impact_idx)
    q = spark.createDataFrame([("q", "zzyzx")], "qid string, text string")
    assert s.search_impact(q, k=5).count() == 0


# --------------------------------------------------------------- guards


def test_bm25_refused_on_impact_index(spark, impact_idx):
    s = Searcher(spark, impact_idx)
    with pytest.raises(ValueError, match="impact"):
        s.search(_queries_df(spark), k=5).collect()


def test_search_impact_refused_on_text_index(spark, tmp_path):
    from dhr_spark.index.builder import build_index_from_docs

    docs = spark.createDataFrame(
        [(0, "spark data"), (1, "fast engine")], "docid long, text string"
    )
    d = str(tmp_path / "txt_idx")
    build_index_from_docs(spark, docs, d, analyzer_mode="simple", chunk_bits=2)
    s = Searcher(spark, d)
    with pytest.raises(ValueError, match="impact"):
        s.search_impact(_queries_df(spark), k=5)


def test_build_rejects_nonpositive_impacts(spark, tmp_path):
    bad = spark.createDataFrame(
        [(0, "a", 1), (1, "b", 0)], "docid long, term string, impact long"
    )
    with pytest.raises(ValueError, match=r"\[1, 2\^31-1\]"):
        build_impact_index(spark, bad, str(tmp_path / "bad_idx"))


def test_resume_skips_committed_chunks(spark, tmp_path):
    d = str(tmp_path / "res_idx")
    imp = _impacts_df(spark)
    m1 = build_impact_index(spark, imp, d, analyzer_mode="simple", chunk_bits=2)
    m2 = build_impact_index(
        spark, imp, d, analyzer_mode="simple", chunk_bits=2, resume=True
    )
    assert m2["chunks"] == m1["chunks"]
    assert m2["resumed_from"] == sorted(m1["chunks"].keys())
    s = Searcher(spark, d)
    qw = _qweights_df(spark).withColumnRenamed("weight", "qweight")
    assert _runs(s.search_impact(_queries_df(spark), k=10)) == _runs(
        impact_topk(imp, qw, k=10)
    )


def test_federated_impact_equals_union_index(spark, tmp_path):
    from dhr_spark.operators.federate import MultiSearcher

    imp = _impacts_df(spark)
    a = imp.filter(F.col("docid") < 3)
    b = imp.filter(F.col("docid") >= 3)
    da, db, du = (str(tmp_path / x) for x in ("a", "b", "u"))
    for d, part in ((da, a), (db, b), (du, imp)):
        build_impact_index(
            spark, part, d, analyzer_mode="simple", chunk_bits=2, block_size=4
        )
    ms = MultiSearcher(spark, [da, db])
    fed = ms.search_impact(_queries_df(spark), k=10)
    uni = Searcher(spark, du).search_impact(_queries_df(spark), k=10)
    # drop index_id (shard-local detail); scores/ranks must match exactly
    fs = sorted(
        (r["qid"], r["rank"], r["docid"], r["score"]) for r in fed.collect()
    )
    us = sorted(
        (r["qid"], r["rank"], r["docid"], r["score"]) for r in uni.collect()
    )
    assert fs == us


def test_append_impacts_equals_rebuild(spark, tmp_path):
    from dhr_spark.index.impact import append_impacts_to_index

    imp = _impacts_df(spark)
    base = imp.filter(F.col("docid") < 4)
    d = str(tmp_path / "app_idx")
    build_impact_index(spark, base, d, analyzer_mode="simple", chunk_bits=2, block_size=4)
    # batch at the next chunk boundary (chunk_bits=2 -> next boundary 4)
    batch = imp.filter(F.col("docid") >= 4).union(
        spark.createDataFrame(
            [(6, "brandnewterm", 5)], "docid long, term string, impact long"
        )
    )
    man = append_impacts_to_index(spark, batch, d)
    assert man["appends"] == 1 and man["n_docs"] == 7
    du = str(tmp_path / "reb_idx")
    build_impact_index(
        spark, imp.union(spark.createDataFrame(
            [(6, "brandnewterm", 5)], "docid long, term string, impact long"
        )), du, analyzer_mode="simple", chunk_bits=2, block_size=4,
    )
    q = _queries_df(spark).union(
        spark.createDataFrame([("q4", "brandnewterm")], "qid string, text string")
    )
    got = _runs(Searcher(spark, d).search_impact(q, k=10))
    want = _runs(Searcher(spark, du).search_impact(q, k=10))
    assert got == want and any(r[0] == "q4" for r in got)
    # guards: wrong index kind, below-boundary docid, dup (docid, term)
    with pytest.raises(ValueError, match="below the next chunk boundary"):
        append_impacts_to_index(
            spark,
            spark.createDataFrame(
                [(2, "x", 1)], "docid long, term string, impact long"
            ),
            d,
        )
    with pytest.raises(ValueError, match="duplicate"):
        append_impacts_to_index(
            spark,
            spark.createDataFrame(
                [(64, "x", 1), (64, "x", 2)],
                "docid long, term string, impact long",
            ),
            d,
        )


def test_encode_term_weights_hand_example(spark):
    # 3-doc corpus; weight(d,t) = ln(1+tf)·ln(1+(N−df+.5)/(df+.5))
    import math

    from dhr_spark.operators.termfreq import with_tokens
    from dhr_spark.operators.impact import encode_term_weights

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a c"), (2, "c c c")],
        "docid long, text string",
    )
    tok = with_tokens(docs, mode="simple")
    got = {
        (r["docid"], r["term"]): r["weight"]
        for r in encode_term_weights(tok).collect()
    }

    def w(tf, df, n=3):
        return math.log(1 + tf) * math.log(1 + (n - df + 0.5) / (df + 0.5))

    want = {
        (0, "a"): w(2, 2), (0, "b"): w(1, 1), (1, "a"): w(1, 2),
        (1, "c"): w(1, 2), (2, "c"): w(3, 2),
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])


def test_from_text_pipeline_end_to_end(spark, tmp_path):
    # raw text -> encoder -> quantizer -> impact index -> WAND search ==
    # the DataFrame slow path over the same impacts (no external model)
    from dhr_spark.operators.termfreq import with_tokens
    from dhr_spark.operators.impact import encode_term_weights

    docs = spark.createDataFrame(CORPUS, "docid long, text string")
    imp = quantize_impacts(
        encode_term_weights(with_tokens(docs, mode="simple")), bits=8
    )
    d = str(tmp_path / "fromtext_idx")
    build_impact_index(spark, imp, d, analyzer_mode="simple", chunk_bits=2)
    qdf = spark.createDataFrame(QUERIES, "qid string, text string")
    fast = Searcher(spark, d).search_impact(qdf, k=10)
    # query side: analyzed term counts (DeepImpact convention)
    qw = (
        qdf.select("qid", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("qid", "term")
        .agg(F.count("*").cast("double").alias("qweight"))
    )
    slow = impact_topk(imp, qw, k=10)
    lhs = {(r["qid"], r["docid"], r["rank"], round(r["score"], 6))
           for r in fast.collect()}
    rhs = {(r["qid"], r["docid"], r["rank"], round(r["score"], 6))
           for r in slow.collect()}
    assert lhs == rhs and lhs  # non-empty and identical
    # corpus-max weight maps to 255 (Anserini convention)
    assert imp.agg(F.max("impact")).collect()[0][0] == 255
