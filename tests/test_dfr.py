"""DFR InL2 + information-based SPL similarities (operators/dfr.py).

Semantics pins:
  * inl2_weights / spl_weights == hand-computed published formulas on a
    tiny corpus (Amati & van Rijsbergen TOIS 2002; Clinchant & Gaussier
    SIGIR 2010), including SPL's analytic λ→1 limit branch for
    λ = ctf/N ≥ 1−1e−6 — the fixture corpus has a term ("spark",
    ctf=10 > N=5) that exercises the branch naturally.
  * index-backed Searcher.search_inl2/search_spl == the DataFrame slow
    paths exactly (same sf0.001 corpus + index as the QLD/F2EXP pins).
  * prune == no-prune (block-bound admissibility over the new weights).

The full DuckDB oracles live in __spark_entry__ (entries inl2_topk,
spl_topk + *_vs_slow_identity) and run in tests/test_entry_oracle.py.
"""

from __future__ import annotations

import math

import pytest

from dhr_spark.operators.dfr import (
    SPL_LAMBDA_LIMIT,
    inl2_topk,
    inl2_weights,
    spl_topk,
    spl_weights,
)
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


def _corpus_stats():
    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df: dict[str, int] = {}
    ctf: dict[str, int] = {}
    for v in toks.values():
        for t in set(v):
            df[t] = df.get(t, 0) + 1
        for t in v:
            ctf[t] = ctf.get(t, 0) + 1
    return toks, n, avgdl, df, ctf


def _py_inl2_weights(c=0.1):
    toks, n, avgdl, df, _ = _corpus_stats()
    out = {}
    for d, v in toks.items():
        dl = len(v)
        for t in set(v):
            tfn = v.count(t) * math.log2(1 + c * avgdl / dl)
            w = math.log2((n + 1) / (df[t] + 0.5)) * tfn / (tfn + 1)
            out[(t, d)] = round(w, 6)
    return out


def _py_spl_weights(c=0.1):
    toks, n, avgdl, _, ctf = _corpus_stats()
    out = {}
    for d, v in toks.items():
        dl = len(v)
        for t in set(v):
            lam = ctf[t] / n
            tfn = v.count(t) * math.log2(1 + c * avgdl / dl)
            if lam >= SPL_LAMBDA_LIMIT:
                w = math.log2(tfn + 1)
            else:
                x = tfn / (tfn + 1)
                w = -math.log2((lam**x - lam) / (1 - lam))
            out[(t, d)] = round(w, 6)
    return out


def test_inl2_weights_match_reference(corpus):
    got = {
        (r["term"], r["docid"]): r["weight"]
        for r in inl2_weights(corpus["tfs"], corpus["dls"], c=0.1).collect()
    }
    assert got == _py_inl2_weights(0.1)
    assert all(w > 0 for w in got.values())


def test_spl_weights_match_reference(corpus):
    got = {
        (r["term"], r["docid"]): r["weight"]
        for r in spl_weights(corpus["tfs"], corpus["dls"], c=0.1).collect()
    }
    assert got == _py_spl_weights(0.1)
    assert all(w > 0 for w in got.values())


def test_spl_lambda_limit_branch_engaged(corpus):
    # "spark" has ctf=10 over N=5 docs: λ = 2.0 is outside the power-law
    # formula's domain (log of a negative), so the weight is EXACTLY the
    # analytic λ→1 limit log2(tfn + 1) — a single well-conditioned log2,
    # identical across numpy / JVM / DuckDB (see dfr.py module doc).
    _, n, avgdl, _, ctf = _corpus_stats()
    assert ctf["spark"] / n > 1.0
    got = {
        (r["term"], r["docid"]): r["weight"]
        for r in spl_weights(corpus["tfs"], corpus["dls"], c=0.1).collect()
    }
    tfn = 2 * math.log2(1 + 0.1 * avgdl / 4)  # doc 0: tf=2, dl=4
    assert got[("spark", 0)] == round(math.log2(tfn + 1), 6)


def test_weight_monotonicity_tf_dl():
    # block-bound admissibility rests on monotone ↑tf ↓dl; probe the two
    # formulas across a grid (both SPL branches)
    c, avgdl = 0.1, 5.0
    for lam in (0.05, 0.5, 1.5):
        prev = 0.0
        for tf in range(1, 30):
            tfn = tf * math.log2(1 + c * avgdl / 7.0)
            if lam >= SPL_LAMBDA_LIMIT:
                w = math.log2(tfn + 1)
            else:
                x = tfn / (tfn + 1)
                w = -math.log2((lam**x - lam) / (1 - lam))
            assert w > prev
            prev = w
    for stat in (0.5, 3.0):
        prev = float("inf")
        for dl in (1, 2, 5, 20, 100):
            tfn = 3 * math.log2(1 + c * avgdl / dl)
            w = stat * tfn / (tfn + 1)
            assert w < prev
            prev = w


SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sfdocs(spark):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.col("doc_id").alias("docid"), "text")
    )


@pytest.fixture(scope="module")
def dfr_idx(spark, sfdocs, tmp_path_factory):
    from dhr_spark.index.builder import build_index_from_docs

    d = str(tmp_path_factory.mktemp("dfr_idx") / "idx")
    build_index_from_docs(
        spark, sfdocs, d, analyzer_mode="simple", chunk_bits=6, block_size=16,
    )
    return d


@pytest.fixture(scope="module")
def dfr_queries(spark):
    rows = [
        ("q1", "spark table scan"),
        ("q2", "merge batch value value"),
        ("q3", "zzyzx unseenterm hash"),   # partially OOV
        ("q4", "the slow window"),
    ]
    return spark.createDataFrame(rows, "qid string, text string")


def _as_map(rows):
    return {(r["qid"], r["docid"]): (r["rank"], r["score"]) for r in rows}


@pytest.mark.parametrize("c", [0.1, 1.0])
def test_search_inl2_equals_slow_path(spark, sfdocs, dfr_idx, dfr_queries, c):
    from dhr_spark.operators.termfreq import query_term_freqs
    from dhr_spark.operators.wand import Searcher

    fast = Searcher(spark, dfr_idx).search_inl2(dfr_queries, k=20, c=c)
    tok = with_tokens(sfdocs, mode="simple")
    qtfs = query_term_freqs(with_tokens(dfr_queries, mode="simple"))
    slow = inl2_topk(qtfs, term_freqs(tok), doc_lengths(tok), k=20, c=c)
    assert _as_map(fast.collect()) == _as_map(slow.collect())


@pytest.mark.parametrize("c", [0.1, 0.5, 1.0])
def test_search_spl_equals_slow_path(spark, sfdocs, dfr_idx, dfr_queries, c):
    from dhr_spark.operators.termfreq import query_term_freqs
    from dhr_spark.operators.wand import Searcher

    fast = Searcher(spark, dfr_idx).search_spl(dfr_queries, k=20, c=c)
    tok = with_tokens(sfdocs, mode="simple")
    qtfs = query_term_freqs(with_tokens(dfr_queries, mode="simple"))
    slow = spl_topk(qtfs, term_freqs(tok), doc_lengths(tok), k=20, c=c)
    assert _as_map(fast.collect()) == _as_map(slow.collect())


def test_prune_matches_noprune(spark, dfr_idx, dfr_queries):
    from dhr_spark.operators.wand import Searcher

    sr = Searcher(spark, dfr_idx)
    for meth in (sr.search_inl2, sr.search_spl):
        a = meth(dfr_queries, k=15, prune=True)
        b = meth(dfr_queries, k=15, prune=False)
        assert _as_map(a.collect()) == _as_map(b.collect())


def test_param_guards(spark, dfr_idx, dfr_queries):
    from dhr_spark.operators.wand import Searcher

    sr = Searcher(spark, dfr_idx)
    for bad in (0.0, -0.5):
        with pytest.raises(ValueError, match="c must be > 0"):
            sr.search_inl2(dfr_queries, c=bad)
        with pytest.raises(ValueError, match="c must be > 0"):
            sr.search_spl(dfr_queries, c=bad)
        with pytest.raises(ValueError, match="c must be > 0"):
            inl2_weights(None, None, c=bad)
        with pytest.raises(ValueError, match="c must be > 0"):
            spl_weights(None, None, c=bad)


def test_filtered_composes_with_dfr_sims(spark, sfdocs, dfr_idx, tmp_path):
    # _prep_sim dispatch: search_min_docid under sim="inl2"/"spl" must
    # score identically to the unfiltered search restricted by the gate
    from dhr_spark.operators.wand import Searcher

    sr = Searcher(spark, dfr_idx)
    q = spark.createDataFrame([("q1", "spark table scan")],
                              "qid string, text string")
    for sim in ("inl2", "spl"):
        full = sr.search_min_docid(q, min_docid=0, k=500, sim=sim)
        gated = sr.search_min_docid(q, min_docid=40, k=500, sim=sim)
        fmap = {
            (r["qid"], r["docid"]): r["score"] for r in full.collect()
            if r["docid"] >= 40
        }
        gmap = {(r["qid"], r["docid"]): r["score"] for r in gated.collect()}
        assert fmap == gmap
