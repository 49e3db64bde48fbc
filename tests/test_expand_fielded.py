"""Multi-term query rewrites (prefix / wildcard / fuzzy / MoreLikeThis) and
BM25F field-weighted ranking.

Identity contract: every index-backed rewrite (Searcher.search_prefix /
search_wildcard / search_fuzzy / search_like) must match its DataFrame slow
path (operators/expand.py expansion -> operators/topk scoring) rank- and
score-identically — the same fast-vs-slow discipline as WAND itself
(tests/test_index_wand.py). BM25F is pinned by its degenerate case: all
field weights = 1.0 must equal plain BM25 over the concatenated text.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_transcripts
from dhr_spark.index.builder import build_index
from dhr_spark.operators.docids import with_docids
from dhr_spark.operators.expand import (
    expand_fuzzy,
    expand_prefix,
    expand_regexp,
    expand_wildcard,
    exclude_seeds_and_rank,
    levenshtein_py,
    mlt_seed_terms,
    wildcard_to_regex,
)
from dhr_spark.operators.fielded import bm25f_topk
from dhr_spark.operators.postings import postings_flat
from dhr_spark.operators.stats import corpus_stats, term_dictionary, term_stats
from dhr_spark.operators.termfreq import doc_lengths, term_freqs, with_tokens
from dhr_spark.operators.topk import score_all, topk
from dhr_spark.operators.wand import Searcher

N_CONVS = 40
K = 25


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("expand_idx") / "idx")
    tr = synth_transcripts(spark, N_CONVS)
    build_index(
        spark, tr, idx, chunk_bits=6, block_size=8,
        docid_strategy="window", forward_index=True,
    )
    # slow-path ingredients over the SAME corpus/analyzer
    docs = with_docids(tr, "window")
    tok = with_tokens(docs, mode="lucene").cache()
    tfs, dls = term_freqs(tok), doc_lengths(tok)
    cs = corpus_stats(dls).collect()[0]
    tdict = term_dictionary(term_stats(tfs, cs["n_docs"])).cache()
    postings = postings_flat(tfs, dls, tdict, cs["avgdl"]).cache()
    searcher = Searcher(spark, idx)
    return dict(
        tr=tr, tok=tok, tfs=tfs, tdict=tdict, postings=postings,
        searcher=searcher,
    )


def _rows(df):
    return sorted(
        (r["qid"], r["docid"], r["rank"], round(r["score"], 6))
        for r in df.collect()
    )


def _slow(env, expansion, k=K, exclude=None):
    qtfs = expansion.join(env["tdict"].select("term", "term_id"), "term")
    scored = score_all(qtfs, env["postings"], on="term_id")
    if exclude:
        return _rows(exclude_seeds_and_rank(
            scored.select("qid", "docid", "score"), exclude, k
        ))
    return _rows(topk(scored, k))


# ------------------------------------------------------------- pure units

def test_wildcard_to_regex():
    assert wildcard_to_regex("gr?up") == "^gr.up$"
    assert wildcard_to_regex("*ow") == "^.*ow$"
    assert wildcard_to_regex("a.b*") == "^a\\.b.*$"  # dot escaped literally


@pytest.mark.parametrize(
    "a,b,d",
    [
        ("", "", 0),
        ("abc", "abc", 0),
        ("abc", "abd", 1),
        ("abc", "ab", 1),
        ("table", "tabel", 2),  # transposition = 2 (plain, not Damerau)
        ("kitten", "sitting", 3),
        ("", "xyz", 3),
    ],
)
def test_levenshtein_py(a, b, d):
    assert levenshtein_py(a, b) == d
    assert levenshtein_py(b, a) == d


def test_levenshtein_py_matches_spark(spark):
    words = ["table", "tabel", "tbl", "stable", "fable", "cable", "tables"]
    pairs = [(a, b) for a in words for b in words]
    df = spark.createDataFrame(pairs, "a string, b string").select(
        "a", "b", F.levenshtein("a", "b").alias("d")
    )
    for r in df.collect():
        assert levenshtein_py(r["a"], r["b"]) == r["d"], (r["a"], r["b"])


# ---------------------------------------------- index path == slow path

def _some_prefixes(env):
    terms = [r["term"] for r in env["tdict"].orderBy("term").limit(50).collect()]
    return [
        ("p1", terms[0][:1]),
        ("p2", terms[len(terms) // 2][:2]),
        ("p3", "zzzznomatch"),
    ]


def test_prefix_index_matches_slow(env):
    pairs = _some_prefixes(env)
    fast = _rows(env["searcher"].search_prefix(pairs, k=K, max_expansions=4))
    slow = _slow(env, expand_prefix(env["tdict"], pairs, max_expansions=4))
    assert fast == slow
    assert fast  # nonempty
    assert not any(q == "p3" for q, *_ in fast)  # no-match qid absent


def test_wildcard_index_matches_slow(env):
    terms = [r["term"] for r in env["tdict"].orderBy("term").limit(20).collect()]
    t = next(t for t in terms if len(t) >= 3)
    pairs = [
        ("w1", f"{t[0]}*"),
        ("w2", f"*{t[-2:]}"),     # leading wildcard: full dictionary scan
        ("w3", f"{t[0]}?{t[2:]}"),
    ]
    fast = _rows(env["searcher"].search_wildcard(pairs, k=K, max_expansions=4))
    slow = _slow(env, expand_wildcard(env["tdict"], pairs, max_expansions=4))
    assert fast == slow and fast


def test_regexp_index_matches_slow(env):
    terms = [r["term"] for r in env["tdict"].orderBy("term").limit(20).collect()]
    t = next(t for t in terms if len(t) >= 3)
    pairs = [
        ("r1", f"{t[0]}.*"),                # cap binds
        ("r2", f"{t[:2]}[a-z0-9]*"),        # char class
        ("r3", f"{t}|zzzznomatch"),         # alternation
        ("r4", "zz+qq+"),                   # no match
    ]
    fast = _rows(env["searcher"].search_regexp(pairs, k=K, max_expansions=4))
    slow = _slow(env, expand_regexp(env["tdict"], pairs, max_expansions=4))
    assert fast == slow and fast
    assert not any(q == "r4" for q, *_ in fast)


def test_regexp_anchored_whole_term(env):
    # Lucene RegexpQuery: the automaton must accept the ENTIRE term — a
    # pattern matching only a substring must expand to nothing.
    terms = [r["term"] for r in env["tdict"].orderBy("term").limit(20).collect()]
    t = next(t for t in terms if len(t) >= 4)
    inner = t[1:-1]  # substring of a real term, not a full term... unless
    full_terms = {r["term"] for r in env["tdict"].select("term").collect()}
    exp = expand_regexp(env["tdict"], [("r1", inner)], max_expansions=100)
    got = {r["term"] for r in exp.collect()}
    # every expansion must BE the pattern (full-match semantics): the only
    # way `inner` matches is if `inner` itself is a dictionary term
    assert got <= ({inner} & full_terms)


def test_fuzzy_index_matches_slow(env):
    terms = [r["term"] for r in env["tdict"].orderBy("term").limit(20).collect()]
    t = next(t for t in terms if len(t) >= 4)
    typo = t[0] + t[2] + t[1] + t[3:]  # transpose chars 2/3, keep 1st (gate)
    pairs = [("f1", typo), ("f2", t), ("f3", "qqqqqq")]
    fast = _rows(
        env["searcher"].search_fuzzy(pairs, k=K, max_edits=2, prefix_len=1)
    )
    slow = _slow(
        env,
        expand_fuzzy(env["tdict"], pairs, max_edits=2, prefix_len=1),
    )
    assert fast == slow and fast


def test_fuzzy_prefix_gate(env):
    # a term within edit distance but with a different first char must be
    # excluded when prefix_len=1 (Lucene prefixLength semantics)
    terms = [r["term"] for r in env["tdict"].orderBy("term").limit(100).collect()]
    t = next(t for t in terms if len(t) >= 4)
    other_first = "z" if t[0] != "z" else "q"
    pat = other_first + t[1:]  # distance 1 from t, different first char
    exp = expand_fuzzy(
        env["tdict"], [("g1", pat)], max_edits=2, prefix_len=1
    ).collect()
    assert all(r["term"][0] == other_first for r in exp)


def test_expansion_cap_order(env):
    # cap keeps the HIGHEST-df terms, ties by term ASC (Lucene top-terms
    # rewrite); verify against an independent driver-side computation
    terms = [r["term"] for r in env["tdict"].orderBy("term").limit(1).collect()]
    pre = terms[0][:1]
    allm = sorted(
        (
            (-r["df"], r["term"])
            for r in env["tdict"].filter(F.col("term").startswith(pre)).collect()
        ),
    )
    want = {t for _, t in allm[:3]}
    got = {
        r["term"]
        for r in expand_prefix(
            env["tdict"], [("c1", pre)], max_expansions=3
        ).collect()
    }
    assert got == want
    assert len(got) == min(3, len(allm))


# ------------------------------------------------------------ MoreLikeThis

def test_mlt_index_matches_slow(env):
    ids = [r["docid"] for r in env["tok"].select("docid").orderBy("docid").limit(3).collect()]
    seeds = [("m1", int(ids[0])), ("m2", int(ids[2]))]
    fast = _rows(env["searcher"].search_like(seeds, k=K, max_query_terms=8))
    exp = mlt_seed_terms(env["tfs"], env["tdict"], seeds, max_query_terms=8)
    slow = _slow(env, exp, exclude=seeds)
    assert fast == slow and fast


def test_mlt_excludes_seed_and_ranks_dense(env):
    ids = [r["docid"] for r in env["tok"].select("docid").orderBy("docid").limit(1).collect()]
    seeds = [("m1", int(ids[0]))]
    rows = env["searcher"].search_like(seeds, k=K, max_query_terms=8).collect()
    assert rows
    assert all(r["docid"] != ids[0] for r in rows)
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(ranks) + 1))  # dense after exclusion


def test_mlt_requires_forward_index(spark, tmp_path):
    idx = str(tmp_path / "nofwd")
    tr = synth_transcripts(spark, 4)
    build_index(spark, tr, idx, chunk_bits=6, block_size=8,
                docid_strategy="window")
    with pytest.raises(ValueError, match="forward_index"):
        Searcher(spark, idx).search_like([("m1", 0)], k=5)


# ------------------------------------------------------------------ BM25F

def _turns_and_queries(env):
    turns = env["tok"].select(
        (F.col("docid") % 7).alias("conv_id"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.col("docid") % 3 + 1).cast("int"),
        ).alias("role"),
        "tokens",
    )
    qterms = [r["term"] for r in env["tdict"].orderBy(F.col("df").desc()).limit(4).collect()]
    qtfs = env["tok"].sparkSession.createDataFrame(
        [("q1", qterms[0], 1), ("q1", qterms[1], 1), ("q2", qterms[2], 2)],
        "qid string, term string, qtf long",
    )
    return turns, qtfs


def test_bm25f_unit_weights_is_plain_bm25(env):
    turns, qtfs = _turns_and_queries(env)
    got = _rows(bm25f_topk(
        qtfs, turns, {"user": 1.0, "assistant": 1.0, "tool": 1.0}, k=K
    ))
    # plain BM25 over the concatenated per-conv text
    docs = turns.groupBy("conv_id").agg(
        F.flatten(F.collect_list("tokens")).alias("tokens")
    ).withColumnRenamed("conv_id", "docid")
    tfs, dls = term_freqs(docs), doc_lengths(docs)
    cs = corpus_stats(dls).collect()[0]
    tdict = term_dictionary(term_stats(tfs, cs["n_docs"]))
    post = postings_flat(tfs, dls, tdict, cs["avgdl"])
    qtid = qtfs.join(tdict.select("term", "term_id"), "term")
    want = _rows(topk(score_all(qtid, post, on="term_id"), K))
    assert got == want and got


def test_bm25f_weights_change_ranking(env):
    turns, qtfs = _turns_and_queries(env)
    unit = _rows(bm25f_topk(
        qtfs, turns, {"user": 1.0, "assistant": 1.0, "tool": 1.0}, k=K
    ))
    weighted = _rows(bm25f_topk(
        qtfs, turns, {"user": 4.0, "assistant": 1.0, "tool": 0.25}, k=K
    ))
    assert unit != weighted  # weights flow into scores


def test_bm25f_empty_field_doc_survives(spark):
    # a conversation whose every turn is empty keeps wdl=0 and simply never
    # matches; it must not crash the avgwdl aggregate
    turns = spark.createDataFrame(
        [(0, "user", ["alpha", "beta"]), (1, "user", [])],
        "conv_id long, role string, tokens array<string>",
    )
    qtfs = spark.createDataFrame(
        [("q1", "alpha", 1)], "qid string, term string, qtf long"
    )
    rows = bm25f_topk(qtfs, turns, {"user": 1.0}, k=5).collect()
    assert [r["docid"] for r in rows] == [0]


# --------------------------------------------------------------- dis-max

def test_dismax_single_field_equals_plain_bm25(env):
    """With every turn in ONE field, dis-max degenerates to plain BM25
    over the concatenated per-conv text for ANY tie value (max == sum ==
    the only field's score, and that field's stats are the corpus stats)."""
    from dhr_spark.operators.fielded import dismax_topk

    turns, qtfs = _turns_and_queries(env)
    mono = turns.withColumn("role", F.lit("user"))
    docs = turns.groupBy("conv_id").agg(
        F.flatten(F.collect_list("tokens")).alias("tokens")
    ).withColumnRenamed("conv_id", "docid")
    tfs, dls = term_freqs(docs), doc_lengths(docs)
    cs = corpus_stats(dls).collect()[0]
    tdict = term_dictionary(term_stats(tfs, cs["n_docs"]))
    post = postings_flat(tfs, dls, tdict, cs["avgdl"])
    qtid = qtfs.join(tdict.select("term", "term_id"), "term")
    want = _rows(topk(score_all(qtid, post, on="term_id"), K))
    for tie in (0.0, 0.5, 1.0):
        assert _rows(dismax_topk(qtfs, mono, tie=tie, k=K)) == want


def test_dismax_tie_monotone(env):
    """Per-(qid, docid) dis-max scores are nondecreasing in tie, and a doc
    matching in >= 2 fields strictly gains from tie > 0."""
    from dhr_spark.operators.fielded import dismax_topk

    turns, qtfs = _turns_and_queries(env)
    s0 = {(r["qid"], r["docid"]): r["score"]
          for r in dismax_topk(qtfs, turns, tie=0.0, k=10**6).collect()}
    s5 = {(r["qid"], r["docid"]): r["score"]
          for r in dismax_topk(qtfs, turns, tie=0.5, k=10**6).collect()}
    assert set(s0) == set(s5) and s0
    assert all(s5[key] >= s0[key] - 1e-9 for key in s0)
    assert any(s5[key] > s0[key] + 1e-6 for key in s0)
