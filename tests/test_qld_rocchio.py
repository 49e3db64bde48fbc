"""QLD (LM-Dirichlet), Rocchio PRF, SpanFirst and block-join operators.

Semantics pins:
  * qld_weights == hand-computed Lucene LMDirichletSimilarity on a tiny
    corpus (per-term clamp to >= 0 included).
  * rocchio_expand(gamma=0) == hand-computed alpha/beta vector update;
    the gamma arm strictly lowers weights of bottom-doc terms.
  * span_first_match == phrase starts filtered to start <= end - n (Lucene
    SpanFirstQuery: span END exclusive <= end), boundary exact.
  * block_join_topk reproduces hand-rolled parent aggregation for every
    Lucene ScoreMode and rejects unknown modes.

The full DuckDB oracles live in __spark_entry__ (entries qld_topk,
rocchio_expansion, rocchio_topk, span_first, blockjoin_topk) and run in
tests/test_entry_oracle.py; these tests pin the algebra itself.
"""

from __future__ import annotations

import math

import pytest

from dhr_spark.operators.conversations import block_join_topk
from dhr_spark.operators.phrase import phrase_match, span_first_match
from dhr_spark.operators.qld import qld_topk, qld_weights
from dhr_spark.operators.rocchio import rocchio_expand
from dhr_spark.operators.termfreq import doc_lengths, term_freqs, with_tokens

DOCS = [
    (0, "spark table scan spark"),
    (1, "table join order"),
    (2, "slow query window query"),
    (3, "spark spark spark spark spark spark spark spark"),
    (4, "hash"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(DOCS, "docid long, text string")
    tok = with_tokens(docs, mode="simple").cache()
    return dict(docs=docs, tfs=term_freqs(tok), dls=doc_lengths(tok))


def _py_qld_weights(mu=1000.0):
    """Reference implementation: plain python dicts over DOCS."""
    toks = {d: t.split() for d, t in DOCS}
    cl = sum(len(v) for v in toks.values())
    ctf: dict[str, int] = {}
    for v in toks.values():
        for t in v:
            ctf[t] = ctf.get(t, 0) + 1
    out = {}
    for d, v in toks.items():
        dl = len(v)
        for t in set(v):
            tf = v.count(t)
            w = math.log(1 + tf / (mu * (ctf[t] / cl))) + math.log(
                mu / (dl + mu)
            )
            w = round(max(w, 0.0), 6)
            if w > 0:
                out[(t, d)] = w
    return out


def test_qld_weights_match_reference(corpus):
    got = {
        (r["term"], r["docid"]): r["weight"]
        for r in qld_weights(corpus["tfs"], corpus["dls"], mu=1000.0).collect()
    }
    assert got == _py_qld_weights()


def test_qld_clamp_iff_above_collection_lm(corpus):
    # The LM-Dirichlet weight is log((mu·P(t|C) + tf) / (P(t|C)·(dl + mu))),
    # which is > 0 iff tf/dl > P(t|C) — the SIGN is mu-independent. So
    # Lucene's >= 0 clamp fires exactly on matches whose in-doc rate does
    # not exceed the collection LM, for every mu. Pin that with exact
    # integer cross-multiplication (tf·cl > ctf·dl).
    toks = {d: t.split() for d, t in DOCS}
    cl = sum(len(v) for v in toks.values())
    ctf: dict[str, int] = {}
    for v in toks.values():
        for t in v:
            ctf[t] = ctf.get(t, 0) + 1
    want = {
        (t, d)
        for d, v in toks.items()
        for t in set(v)
        if v.count(t) * cl > ctf[t] * len(v)
    }
    for mu in (0.5, 50.0, 1000.0):
        rows = qld_weights(corpus["tfs"], corpus["dls"], mu=mu).collect()
        assert all(r["weight"] > 0 for r in rows)
        got = {(r["term"], r["docid"]) for r in rows}
        assert got == want, mu
    # the fixture exercises both clamp classes, including the exact-equality
    # doc (spark in doc 0: tf/dl = 2/4 == P(spark|C) = 10/20 -> weight 0)
    assert ("spark", 0) not in want and ("spark", 3) in want


def test_qld_topk_ranks(spark, corpus):
    q = spark.createDataFrame(
        [("q1", "spark", 1), ("q1", "table", 1)], "qid string, term string, qtf long"
    )
    res = qld_topk(q, corpus["tfs"], corpus["dls"], k=3).collect()
    ref = _py_qld_weights()
    scores = {}
    for d in range(len(DOCS)):
        s = ref.get(("spark", d), 0.0) + ref.get(("table", d), 0.0)
        if s > 0:
            scores[d] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = [(r["docid"], r["score"]) for r in sorted(res, key=lambda r: r["rank"])]
    assert got == [(d, s) for d, s in want]


# ------------------------------------------------------------------ rocchio

def _fixture_first_pass(spark):
    # q1 ranked: doc0 (rank1), doc1 (rank2), doc2 (rank3)
    return spark.createDataFrame(
        [("q1", 0, 1, 2.0), ("q1", 1, 2, 1.0), ("q1", 2, 3, 0.5)],
        "qid string, docid long, rank int, score double",
    )


def test_rocchio_positive_update(spark, corpus):
    qtfs = spark.createDataFrame(
        [("q1", "spark", 1)], "qid string, term string, qtf long"
    )
    exp = rocchio_expand(
        qtfs,
        _fixture_first_pass(spark),
        corpus["tfs"],
        corpus["dls"],
        fb_docs=2,  # docs 0 and 1
        fb_terms=10,
        alpha=1.0,
        beta=0.5,
        gamma=0.0,
    ).collect()
    got = {r["term"]: r["weight"] for r in exp}
    # hand computation: doc0 toks = spark(2) table scan, dl=4; doc1 = table
    # join order, dl=3; centroid = mean of tf/dl over the 2 fb docs,
    # integer-micros then L1-normalized over ALL terms (<= fb_terms cut).
    cents = {
        "spark": (2 / 4) / 2,
        "table": (1 / 4 + 1 / 3) / 2,
        "scan": (1 / 4) / 2,
        "join": (1 / 3) / 2,
        "order": (1 / 3) / 2,
    }
    micros = {t: round(round(c, 6) * 1e6) for t, c in cents.items()}
    tot = sum(micros.values())
    want = {}
    for t, m in micros.items():
        w = 1.0 * (1.0 if t == "spark" else 0.0) + 0.5 * (m / tot)
        want[t] = round(w, 6)
    assert got == want


def test_rocchio_negative_arm_lowers_bottom_terms(spark, corpus):
    qtfs = spark.createDataFrame(
        [("q1", "spark", 1)], "qid string, term string, qtf long"
    )
    kw = dict(fb_docs=2, fb_terms=10, alpha=1.0, beta=0.5, bottom_docs=1)
    base = {
        r["term"]: r["weight"]
        for r in rocchio_expand(
            qtfs, _fixture_first_pass(spark), corpus["tfs"], corpus["dls"],
            gamma=0.0, **kw,
        ).collect()
    }
    neg = {
        r["term"]: r["weight"]
        for r in rocchio_expand(
            qtfs, _fixture_first_pass(spark), corpus["tfs"], corpus["dls"],
            gamma=0.4, **kw,
        ).collect()
    }
    # bottom doc is doc2 = "slow query window query": its terms lose weight
    # (here: absent from the positive sets entirely, so they stay absent),
    # while positive-only terms are untouched by the subtraction.
    for t in ("spark", "table", "scan", "join", "order"):
        assert neg[t] == base[t]
    assert "query" not in neg and "slow" not in neg  # negative never adds


# --------------------------------------------------------------- span first

def test_span_first_exact_boundary(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),       # beta ends at 2
            (1, "x x alpha beta"),         # beta ends at 4
            (2, "beta alpha beta alpha"),  # spans end at 1 and 3
        ],
        "doc_id long, text string",
    )
    # single term: span over "beta" must END at <= 2 -> start <= 1
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in span_first_match(docs, "beta", end=2).collect()
    }
    assert got == {0: (1, 1), 2: (1, 0)}
    # two-term phrase "alpha beta": n=2, end<=4 -> start <= 2
    got2 = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in span_first_match(docs, "alpha beta", end=4).collect()
    }
    assert got2 == {0: (1, 0), 1: (1, 2), 2: (1, 1)}


def test_span_first_superset_of_none_subset_of_phrase(spark, corpus):
    docs = corpus["docs"].withColumnRenamed("docid", "doc_id")
    full = {r["doc_id"] for r in phrase_match(docs, "spark").collect()}
    first = {r["doc_id"] for r in span_first_match(docs, "spark", end=1).collect()}
    assert first <= full
    # end beyond any doc length == plain phrase match
    wide = {r["doc_id"] for r in span_first_match(docs, "spark", end=999).collect()}
    assert wide == full


# --------------------------------------------------------------- block join

def test_block_join_score_modes(spark):
    child = spark.createDataFrame(
        [("q1", 0, 1.0), ("q1", 1, 3.0), ("q1", 2, 2.0), ("q2", 3, 5.0)],
        "qid string, docid long, score double",
    )
    parent = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 11), (3, 11)], "docid long, parent long"
    )
    want = {
        "max": {("q1", 10): 3.0, ("q1", 11): 2.0, ("q2", 11): 5.0},
        "total": {("q1", 10): 4.0, ("q1", 11): 2.0, ("q2", 11): 5.0},
        "avg": {("q1", 10): 2.0, ("q1", 11): 2.0, ("q2", 11): 5.0},
        "min": {("q1", 10): 1.0, ("q1", 11): 2.0, ("q2", 11): 5.0},
    }
    for mode, exp in want.items():
        got = {
            (r["qid"], r["docid"]): r["score"]
            for r in block_join_topk(child, parent, k=10, score_mode=mode).collect()
        }
        assert got == exp, mode
    with pytest.raises(ValueError):
        block_join_topk(child, parent, score_mode="nope")


def test_block_join_parent_without_match_absent(spark):
    child = spark.createDataFrame([("q1", 0, 1.0)], "qid string, docid long, score double")
    parent = spark.createDataFrame([(0, 10), (99, 11)], "docid long, parent long")
    rows = block_join_topk(child, parent, k=10).collect()
    assert {r["docid"] for r in rows} == {10}


# ------------------------------------------- index-backed rocchio identity

SF = "/root/testdata/sf0.001"
K1, B = 0.9, 0.4
FB_DOCS, FB_TERMS, FB_DEPTH, BOTTOM = 5, 8, 15, 4


@pytest.fixture(scope="module")
def sfdocs(spark):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.col("doc_id").alias("docid"), "text")
    )


@pytest.fixture(scope="module")
def rocchio_idx(spark, sfdocs, tmp_path_factory):
    from dhr_spark.index.builder import build_index_from_docs

    d = str(tmp_path_factory.mktemp("rocchio_idx") / "idx")
    build_index_from_docs(
        spark, sfdocs, d, analyzer_mode="simple", chunk_bits=6, block_size=16,
        forward_index=True,
    )
    return d


@pytest.fixture(scope="module")
def rocchio_queries(spark):
    rows = [
        ("q1", "spark table scan"),
        ("q2", "merge batch value value"),
        ("q3", "zzyzx unseenterm hash"),   # partially OOV
        ("q4", "the slow window"),
    ]
    return spark.createDataFrame(rows, "qid string, text string")


def _slow_rocchio(spark, docs, queries, k, gamma):
    from pyspark.sql import functions as F

    from dhr_spark.functions.bm25 import bm25_weight_col, idf_col
    from dhr_spark.operators.rocchio import rocchio_topk
    from dhr_spark.operators.termfreq import query_term_freqs
    from dhr_spark.operators.topk import score_all, topk

    tok = with_tokens(docs, mode="simple")
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
    first = topk(score_all(qtfs, post, on="term"), FB_DEPTH)
    expanded = rocchio_expand(
        qtfs, first, tfs, dls, fb_docs=FB_DOCS, fb_terms=FB_TERMS,
        alpha=1.0, beta=0.75, gamma=gamma, bottom_docs=BOTTOM,
    )
    return rocchio_topk(expanded, post, k=k, on="term")


def _as_map(rows):
    return {(r["qid"], r["docid"]): (r["rank"], round(r["score"], 4)) for r in rows}


@pytest.mark.parametrize("gamma", [0.0, 0.3])
def test_search_rocchio_equals_slow_path(spark, sfdocs, rocchio_idx,
                                         rocchio_queries, gamma):
    from dhr_spark.operators.wand import Searcher

    fast = Searcher(spark, rocchio_idx).search_rocchio(
        rocchio_queries, k=20, fb_docs=FB_DOCS, fb_terms=FB_TERMS,
        alpha=1.0, beta=0.75, gamma=gamma, bottom_docs=BOTTOM,
        fb_depth=FB_DEPTH,
    )
    slow = _slow_rocchio(spark, sfdocs, rocchio_queries, k=20, gamma=gamma)
    assert _as_map(fast.collect()) == _as_map(slow.collect())


def test_search_rocchio_requires_forward_index(spark, sfdocs,
                                               rocchio_queries, tmp_path):
    from dhr_spark.index.builder import build_index_from_docs
    from dhr_spark.operators.wand import Searcher

    d = str(tmp_path / "nofwd")
    build_index_from_docs(
        spark, sfdocs, d, analyzer_mode="simple", chunk_bits=6, block_size=16
    )
    with pytest.raises(ValueError, match="forward_index"):
        Searcher(spark, d).search_rocchio(rocchio_queries)


# ---------------------------------------------- index-backed QLD identity

def _slow_qld(spark, docs, queries, k, mu):
    from dhr_spark.operators.termfreq import query_term_freqs

    tok = with_tokens(docs, mode="simple")
    qtfs = query_term_freqs(with_tokens(queries, mode="simple"))
    return qld_topk(qtfs, term_freqs(tok), doc_lengths(tok), k=k, mu=mu)


@pytest.mark.parametrize("mu", [1000.0, 300.0])
def test_search_qld_equals_slow_path(spark, sfdocs, rocchio_idx,
                                     rocchio_queries, mu):
    from dhr_spark.operators.wand import Searcher

    fast = Searcher(spark, rocchio_idx).search_qld(rocchio_queries, k=20, mu=mu)
    slow = _slow_qld(spark, sfdocs, rocchio_queries, k=20, mu=mu)
    assert _as_map(fast.collect()) == _as_map(slow.collect())


def test_search_qld_prune_matches_noprune(spark, rocchio_idx, rocchio_queries):
    from dhr_spark.operators.wand import Searcher

    s = Searcher(spark, rocchio_idx)
    a = s.search_qld(rocchio_queries, k=15, prune=True)
    b = s.search_qld(rocchio_queries, k=15, prune=False)
    assert _as_map(a.collect()) == _as_map(b.collect())


def test_search_qld_guards(spark, sfdocs, rocchio_idx, rocchio_queries,
                           tmp_path):
    import shutil

    from pyspark.sql import functions as F

    from dhr_spark.operators.wand import Searcher

    with pytest.raises(ValueError, match="mu"):
        Searcher(spark, rocchio_idx).search_qld(rocchio_queries, mu=0.0)
    with pytest.raises(ValueError, match="corpus_stats"):
        Searcher(spark, rocchio_idx, corpus_stats={"avgdl": 5.0}).search_qld(
            rocchio_queries
        )
    # legacy dictionary (no ctf column) -> rebuild hint
    d = str(tmp_path / "legacy")
    shutil.copytree(rocchio_idx, d)
    td = spark.read.parquet(f"{d}/term_dict").drop("ctf").toPandas()
    shutil.rmtree(f"{d}/term_dict")
    spark.createDataFrame(td).write.parquet(f"{d}/term_dict")
    with pytest.raises(ValueError, match="ctf"):
        Searcher(spark, d).search_qld(rocchio_queries)


def test_qld_ctf_survives_append_and_delete(spark, sfdocs, rocchio_idx,
                                            rocchio_queries, tmp_path):
    """ctf stays an exact collection recount across the index lifecycle:
    after an append (additive merge) and an exact-stats delete
    (subtractive), the dictionary's ctf equals sum(tf) over the LIVE
    forward index, and search_qld == the slow path fed from that same
    forward index."""
    import shutil

    from pyspark.sql import functions as F

    from dhr_spark.index.delete import delete_docs
    from dhr_spark.index.incremental import append_to_index
    from dhr_spark.operators.termfreq import query_term_freqs
    from dhr_spark.operators.wand import Searcher

    d = str(tmp_path / "life")
    shutil.copytree(rocchio_idx, d)
    extra = spark.createDataFrame(
        [
            ("x-1", 0, "u", "spark table scan spark table spark", None, None),
            ("x-2", 0, "u", "hash window query merge", None, None),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    man = append_to_index(spark, extra, d)
    # rocchio_idx has no doc_map (built without doc_map_df) and an append
    # must NOT create a partial one — pick the victim off the forward index
    victim = int(
        spark.read.parquet(f"{d}/forward").agg(F.min("docid")).collect()[0][0]
    )
    import os as _os

    assert not _os.path.isdir(f"{d}/doc_map")
    man = delete_docs(spark, d, docids=[victim])

    s = Searcher(spark, d)
    tdict = spark.read.parquet(f"{d}/{man['term_dict_dir']}")
    fwd = spark.read.parquet(f"{d}/forward")
    live = fwd.join(
        spark.createDataFrame([(victim,)], "docid long"), "docid", "left_anti"
    )
    # dictionary ctf == live forward recount (terms fully deleted keep a
    # row at ctf 0, Lucene keeps dict entries until merge)
    recount = live.groupBy("term_id").agg(F.sum("tf").alias("ctf_live"))
    bad = (
        tdict.join(recount, "term_id", "left")
        .filter(
            F.col("ctf") != F.coalesce(F.col("ctf_live"), F.lit(0))
        )
        .count()
    )
    assert bad == 0
    assert int(man["total_dl"]) == int(
        live.select("docid", "dl").distinct().agg(F.sum("dl")).collect()[0][0]
    )
    # search identity through an independent data path: slow QLD fed from
    # the live forward index (term strings via the dictionary)
    tfs = live.join(
        F.broadcast(tdict.select("term_id", "term")), "term_id"
    ).select("docid", "term", "tf")
    dls = live.select("docid", "dl").distinct()
    qtfs = query_term_freqs(with_tokens(rocchio_queries, mode="simple"))
    slow = qld_topk(qtfs, tfs, dls, k=15, mu=1000.0)
    fast = s.search_qld(rocchio_queries, k=15, mu=1000.0)
    assert _as_map(fast.collect()) == _as_map(slow.collect())


# -------------------------------------------------- LM Jelinek-Mercer

def _py_lmjm_weights(lam=0.1):
    toks = {d: t.split() for d, t in DOCS}
    cl = sum(len(v) for v in toks.values())
    ctf: dict[str, int] = {}
    for v in toks.values():
        for t in v:
            ctf[t] = ctf.get(t, 0) + 1
    jm = (1.0 - lam) / lam
    out = {}
    for d, v in toks.items():
        dl = len(v)
        for t in set(v):
            w = math.log(1.0 + jm * v.count(t) / dl / (ctf[t] / cl))
            out[(t, d)] = round(w, 6)
    return out


def test_lmjm_weights_match_reference(corpus):
    from dhr_spark.operators.qld import lmjm_weights

    got = {
        (r["term"], r["docid"]): r["weight"]
        for r in lmjm_weights(corpus["tfs"], corpus["dls"], lam=0.1).collect()
    }
    assert got == _py_lmjm_weights(0.1)
    # always positive: JM smoothing never clamps a real match away
    assert all(w > 0 for w in got.values())


@pytest.mark.parametrize("lam", [0.1, 0.7])
def test_search_lmjm_equals_slow_path(spark, sfdocs, rocchio_idx,
                                      rocchio_queries, lam):
    from dhr_spark.operators.qld import lmjm_topk
    from dhr_spark.operators.termfreq import query_term_freqs
    from dhr_spark.operators.wand import Searcher

    fast = Searcher(spark, rocchio_idx).search_lmjm(
        rocchio_queries, k=20, lam=lam
    )
    tok = with_tokens(sfdocs, mode="simple")
    qtfs = query_term_freqs(with_tokens(rocchio_queries, mode="simple"))
    slow = lmjm_topk(qtfs, term_freqs(tok), doc_lengths(tok), k=20, lam=lam)
    assert _as_map(fast.collect()) == _as_map(slow.collect())


def test_search_lmjm_lambda_guard(spark, rocchio_idx, rocchio_queries):
    from dhr_spark.operators.wand import Searcher

    for bad in (0.0, 1.0, -0.3):
        with pytest.raises(ValueError, match="lambda"):
            Searcher(spark, rocchio_idx).search_lmjm(rocchio_queries, lam=bad)


# ------------------------------------------- axiomatic F2EXP

def _py_f2exp_weights(s=0.5, kexp=0.35):
    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df: dict[str, int] = {}
    for v in toks.values():
        for t in set(v):
            df[t] = df.get(t, 0) + 1
    out = {}
    for d, v in toks.items():
        dl = len(v)
        for t in set(v):
            tf = v.count(t)
            w = ((n + 1) / df[t]) ** kexp * tf / (tf + s + s * dl / avgdl)
            out[(t, d)] = round(w, 6)
    return out


def test_f2exp_weights_match_reference(corpus):
    from dhr_spark.operators.axiomatic import f2exp_weights

    got = {
        (r["term"], r["docid"]): r["weight"]
        for r in f2exp_weights(corpus["tfs"], corpus["dls"]).collect()
    }
    assert got == _py_f2exp_weights()
    # always positive: the axiomatic weight never clamps a match away
    assert all(w > 0 for w in got.values())


@pytest.mark.parametrize("s,kexp", [(0.5, 0.35), (1.0, 0.5)])
def test_search_f2exp_equals_slow_path(spark, sfdocs, rocchio_idx,
                                       rocchio_queries, s, kexp):
    from dhr_spark.operators.axiomatic import f2exp_topk
    from dhr_spark.operators.termfreq import query_term_freqs
    from dhr_spark.operators.wand import Searcher

    fast = Searcher(spark, rocchio_idx).search_f2exp(
        rocchio_queries, k=20, s=s, kexp=kexp
    )
    tok = with_tokens(sfdocs, mode="simple")
    qtfs = query_term_freqs(with_tokens(rocchio_queries, mode="simple"))
    slow = f2exp_topk(
        qtfs, term_freqs(tok), doc_lengths(tok), k=20, s=s, kexp=kexp
    )
    assert _as_map(fast.collect()) == _as_map(slow.collect())


def test_search_f2exp_prune_matches_noprune(spark, rocchio_idx,
                                            rocchio_queries):
    from dhr_spark.operators.wand import Searcher

    sr = Searcher(spark, rocchio_idx)
    a = sr.search_f2exp(rocchio_queries, k=15, prune=True)
    b = sr.search_f2exp(rocchio_queries, k=15, prune=False)
    assert _as_map(a.collect()) == _as_map(b.collect())


def test_search_f2exp_param_guards(spark, rocchio_idx, rocchio_queries):
    from dhr_spark.operators.wand import Searcher

    with pytest.raises(ValueError, match="s must"):
        Searcher(spark, rocchio_idx).search_f2exp(rocchio_queries, s=0.0)
    with pytest.raises(ValueError, match="kexp"):
        Searcher(spark, rocchio_idx).search_f2exp(rocchio_queries, kexp=-1.0)


# ------------------------------------------- index-backed block join

@pytest.fixture(scope="module")
def conv_idx(spark, tmp_path_factory):
    from dhr_spark.data.synthetic import synth_transcripts
    from dhr_spark.index.builder import build_index

    d = str(tmp_path_factory.mktemp("parents_idx") / "idx")
    tr = synth_transcripts(spark, 40)
    build_index(spark, tr, d, chunk_bits=7, block_size=16,
                docid_strategy="window")
    return d


@pytest.mark.parametrize("mode", ["max", "total", "avg", "min"])
def test_search_parents_equals_manual_rollup(spark, conv_idx, mode):
    from pyspark.sql import functions as F

    from dhr_spark.data.synthetic import synth_queries
    from dhr_spark.operators.wand import Searcher

    s = Searcher(spark, conv_idx)
    q = synth_queries(spark, 6)
    fast = s.search_parents(q, k=8, score_mode=mode)
    # manual: ALL child hits (exhaustive, unpruned) rolled up the same way
    child = s.search(q, k=10_000_000, prune=False).select(
        "qid", "docid", "score"
    )
    parents = spark.read.parquet(f"{conv_idx}/doc_map").select(
        "docid", F.col("conv_id").alias("parent")
    )
    slow = block_join_topk(child, parents, k=8, score_mode=mode)
    f = {(r["qid"], r["parent"]): (r["rank"], round(r["score"], 4))
         for r in fast.collect()}
    g = {(r["qid"], r["docid"]): (r["rank"], round(r["score"], 4))
         for r in slow.collect()}
    assert f == g and f


# ------------------------------------------- SpanNotQuery

def test_span_not_exact_overlap_semantics(spark):
    from dhr_spark.operators.phrase import span_not_match

    docs = spark.createDataFrame(
        [
            (0, "new york city new jersey"),
            (1, "new deal new deal"),
            (2, "york new york"),
        ],
        "doc_id long, text string",
    )
    # spans are exclusive-end: "new" [s,s+1) never OVERLAPS "york" [e,e+1)
    # at pre=post=0, so every "new" survives
    got = {
        r["doc_id"]: r["n_matches"]
        for r in span_not_match(docs, "new", "york").collect()
    }
    assert got == {0: 2, 1: 2, 2: 1}
    # post=1 widens the exclusion window to the token AFTER the include:
    # "new" immediately followed by "york" is excluded
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in span_not_match(docs, "new", "york", post=1).collect()
    }
    assert got == {0: (1, 3), 1: (2, 0)}  # doc2's only "new" precedes york
    # pre=1: "new" immediately AFTER a "york" is excluded
    got = {
        r["doc_id"]: r["n_matches"]
        for r in span_not_match(docs, "new", "york", pre=1).collect()
    }
    assert got == {0: 2, 1: 2}  # doc2: york new -> excluded


def test_span_not_phrase_include_and_exclude(spark):
    from dhr_spark.operators.phrase import span_not_match

    docs = spark.createDataFrame(
        [
            (0, "big apple pie big apple tart"),
            (1, "big apple pie"),
        ],
        "doc_id long, text string",
    )
    # include "big apple" (n=2), exclude "pie": no overlap at pre=post=0
    got = {
        r["doc_id"]: r["n_matches"]
        for r in span_not_match(docs, "big apple", "pie").collect()
    }
    assert got == {0: 2, 1: 1}
    # post=1: "big apple" directly followed by "pie" is excluded
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in span_not_match(docs, "big apple", "pie", post=1).collect()
    }
    assert got == {0: (1, 3)}  # doc1 drops out entirely


def test_span_not_guards(spark):
    from dhr_spark.operators.phrase import span_not_match

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    import pytest as _pt
    with _pt.raises(ValueError, match="pre/post"):
        span_not_match(docs, "a", "b", pre=-1)


# ------------------------------------------- axiomatic F2LOG

def _py_f2log_weights(s=0.5):
    import math

    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df: dict[str, int] = {}
    for v in toks.values():
        for t in set(v):
            df[t] = df.get(t, 0) + 1
    out = {}
    for d, v in toks.items():
        dl = len(v)
        for t in set(v):
            tf = v.count(t)
            w = math.log((n + 1) / df[t]) * tf / (tf + s + s * dl / avgdl)
            out[(t, d)] = round(w, 6)
    return out


def test_f2log_weights_match_reference(corpus):
    from dhr_spark.operators.axiomatic import f2log_weights

    got = {
        (r["term"], r["docid"]): r["weight"]
        for r in f2log_weights(corpus["tfs"], corpus["dls"]).collect()
    }
    assert got == _py_f2log_weights()
    # df <= N < N+1, so the log idf (and every weight) stays positive
    assert all(w > 0 for w in got.values())


@pytest.mark.parametrize("s", [0.5, 1.0])
def test_search_f2log_equals_slow_path(spark, sfdocs, rocchio_idx,
                                       rocchio_queries, s):
    from dhr_spark.operators.axiomatic import f2log_topk
    from dhr_spark.operators.termfreq import query_term_freqs
    from dhr_spark.operators.wand import Searcher

    fast = Searcher(spark, rocchio_idx).search_f2log(
        rocchio_queries, k=20, s=s
    )
    tok = with_tokens(sfdocs, mode="simple")
    qtfs = query_term_freqs(with_tokens(rocchio_queries, mode="simple"))
    slow = f2log_topk(qtfs, term_freqs(tok), doc_lengths(tok), k=20, s=s)
    assert _as_map(fast.collect()) == _as_map(slow.collect())


def test_search_f2log_prune_matches_noprune(spark, rocchio_idx,
                                            rocchio_queries):
    from dhr_spark.operators.wand import Searcher

    sr = Searcher(spark, rocchio_idx)
    a = sr.search_f2log(rocchio_queries, k=15, prune=True)
    b = sr.search_f2log(rocchio_queries, k=15, prune=False)
    assert _as_map(a.collect()) == _as_map(b.collect())


def test_search_f2log_param_guard(spark, rocchio_idx, rocchio_queries):
    from dhr_spark.operators.wand import Searcher

    with pytest.raises(ValueError, match="s must"):
        Searcher(spark, rocchio_idx).search_f2log(rocchio_queries, s=0.0)


# ------------------------------------------- ClassicSimilarity TF-IDF

def _py_tfidf_weights():
    import math

    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    df: dict[str, int] = {}
    for v in toks.values():
        for t in set(v):
            df[t] = df.get(t, 0) + 1
    out = {}
    for d, v in toks.items():
        dl = len(v)
        for t in set(v):
            tf = v.count(t)
            idf = 1.0 + math.log(n / (df[t] + 1.0))
            w = idf * idf * math.sqrt(tf) / math.sqrt(dl)
            out[(t, d)] = round(w, 6)
    return out


def test_tfidf_weights_match_reference(corpus):
    from dhr_spark.operators.classic import tfidf_weights

    got = {
        (r["term"], r["docid"]): r["weight"]
        for r in tfidf_weights(corpus["tfs"], corpus["dls"]).collect()
    }
    assert got == _py_tfidf_weights()
    # idf bottoms out at 1 - ln((N+1)/N)-ish: never <= 0, so no clamp
    assert all(w > 0 for w in got.values())


def test_search_tfidf_equals_slow_path(spark, sfdocs, rocchio_idx,
                                       rocchio_queries):
    from dhr_spark.operators.classic import tfidf_topk
    from dhr_spark.operators.termfreq import query_term_freqs
    from dhr_spark.operators.wand import Searcher

    fast = Searcher(spark, rocchio_idx).search_tfidf(rocchio_queries, k=20)
    tok = with_tokens(sfdocs, mode="simple")
    qtfs = query_term_freqs(with_tokens(rocchio_queries, mode="simple"))
    slow = tfidf_topk(qtfs, term_freqs(tok), doc_lengths(tok), k=20)
    assert _as_map(fast.collect()) == _as_map(slow.collect())


def test_search_tfidf_prune_matches_noprune(spark, rocchio_idx,
                                            rocchio_queries):
    from dhr_spark.operators.wand import Searcher

    sr = Searcher(spark, rocchio_idx)
    a = sr.search_tfidf(rocchio_queries, k=15, prune=True)
    b = sr.search_tfidf(rocchio_queries, k=15, prune=False)
    assert _as_map(a.collect()) == _as_map(b.collect())
