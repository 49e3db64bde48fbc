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
    TWO_PI,
    dph_topk,
    dph_weights,
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
    # tf("spark")=1 at dl=8 with λ("spark") ≈ 1.83: the raw DPH formula
    # goes NEGATIVE here (A = log2(avgdl/8/λ) < −B), pinning the clamp
    (5, "spark join order hash window slow scan table"),
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


# ------------------------------------------------------------- DPH (ninth)

def _py_dph_weights():
    toks, n, avgdl, _, ctf = _corpus_stats()
    out = {}
    for d, v in toks.items():
        dl = len(v)
        for t in set(v):
            tf = v.count(t)
            if tf >= dl:
                continue  # analytic (1-f)^2 -> 0 limit: weight 0, filtered
            lam = ctf[t] / n
            f = tf / dl
            norm = (1 - f) * (1 - f) / (tf + 1)
            a = tf * math.log2(tf * avgdl / dl / lam)
            b = 0.5 * math.log2(TWO_PI * tf * (1 - f))
            w = round(max(norm * (a + b), 0.0), 6)
            if w > 0:
                out[(t, d)] = w
    return out


def test_dph_weights_match_reference(corpus):
    got = {
        (r["term"], r["docid"]): r["weight"]
        for r in dph_weights(corpus["tfs"], corpus["dls"]).collect()
    }
    assert got == _py_dph_weights()
    assert all(w > 0 for w in got.values())


def test_dph_clamp_and_tf_eq_dl_limit(corpus):
    got = {
        (r["term"], r["docid"]): r["weight"]
        for r in dph_weights(corpus["tfs"], corpus["dls"]).collect()
    }
    # tf == dl single-term docs: "hash" doc 4 and "spark" doc 3 take the
    # analytic limit (weight 0) and are filtered as non-matches
    assert ("hash", 4) not in got
    assert ("spark", 3) not in got
    # the negative-raw case (doc 5 fixture comment) clamps to 0 -> absent
    toks, n, avgdl, _, ctf = _corpus_stats()
    lam = ctf["spark"] / n
    raw = (
        (1 - 1 / 8) ** 2 / 2
        * (math.log2(avgdl / 8 / lam) + 0.5 * math.log2(TWO_PI * (1 - 1 / 8)))
    )
    assert raw < 0
    assert ("spark", 5) not in got


def test_dph_block_bound_admissible():
    # dfr.py's factored bound proof, checked numerically: for every
    # (tf, dl) with tf <= max_tf, dl >= min_dl, tf < dl, the (rounded)
    # weight never exceeds bound(max_tf, min_dl) + headroom
    avgdl = 6.3
    for lam in (0.01, 0.3, 1.0, 2.5):
        for max_tf, min_dl in ((1, 1), (3, 2), (10, 4), (50, 9)):
            lmax = math.log2(max_tf * avgdl / min_dl / lam)
            bmax = 0.5 * math.log2(TWO_PI * max_tf)
            bound = max(lmax, 0.0) + 0.5 * max(bmax, 0.0) + 5e-7
            for tf in range(1, max_tf + 1):
                for dl in range(max(min_dl, tf + 1), 80):
                    f = tf / dl
                    norm = (1 - f) * (1 - f) / (tf + 1)
                    a = tf * math.log2(tf * avgdl / dl / lam)
                    b = 0.5 * math.log2(TWO_PI * tf * (1 - f))
                    w = round(max(norm * (a + b), 0.0), 6)
                    assert w <= bound, (lam, max_tf, min_dl, tf, dl, w, bound)


def test_search_dph_equals_slow_path(spark, sfdocs, dfr_idx, dfr_queries):
    from dhr_spark.operators.termfreq import query_term_freqs
    from dhr_spark.operators.wand import Searcher

    fast = Searcher(spark, dfr_idx).search_dph(dfr_queries, k=20)
    tok = with_tokens(sfdocs, mode="simple")
    qtfs = query_term_freqs(with_tokens(dfr_queries, mode="simple"))
    slow = dph_topk(qtfs, term_freqs(tok), doc_lengths(tok), k=20)
    assert _as_map(fast.collect()) == _as_map(slow.collect())


def test_dph_prune_matches_noprune(spark, dfr_idx, dfr_queries):
    from dhr_spark.operators.wand import Searcher

    sr = Searcher(spark, dfr_idx)
    a = sr.search_dph(dfr_queries, k=15, prune=True)
    b = sr.search_dph(dfr_queries, k=15, prune=False)
    assert _as_map(a.collect()) == _as_map(b.collect())


def test_dph_is_parameter_free(spark, dfr_idx, dfr_queries):
    # the filter-context dispatch must refuse a knob for dph
    from dhr_spark.operators.wand import Searcher

    sr = Searcher(spark, dfr_idx)
    with pytest.raises(ValueError, match="parameter-free"):
        sr.search_min_docid(dfr_queries, min_docid=0, sim="dph", sim_param=0.5)
    # and compose without one: gated == full restricted (same as inl2/spl)
    q = spark.createDataFrame(
        [("q1", "spark table scan")], "qid string, text string"
    )
    full = sr.search_min_docid(q, min_docid=0, k=500, sim="dph")
    gated = sr.search_min_docid(q, min_docid=40, k=500, sim="dph")
    fmap = {
        (r["qid"], r["docid"]): r["score"] for r in full.collect()
        if r["docid"] >= 40
    }
    gmap = {(r["qid"], r["docid"]): r["score"] for r in gated.collect()}
    assert fmap == gmap
