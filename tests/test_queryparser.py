"""Lucene classic query syntax: parser unit tests + exact execution
identities against the engine's own primitive surfaces.

Contracts: a pure SHOULD-of-terms string is score-identical to ``search``;
single-clause wildcard/fuzzy strings are score-identical to
``search_wildcard``/``search_fuzzy``; +term/-term filters equal a
corpus-recomputed membership filter over the unbounded search; a phrase
clause scores with sloppy-freq BM25 recomputed from ``search_phrase`` and
the doclens; unsatisfiable MUST clauses empty the query.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.builder import build_index
from dhr_spark.operators.docids import with_docids
from dhr_spark.operators.queryparser import (
    FUZZY,
    MUST,
    MUST_NOT,
    PHRASE,
    SHOULD,
    TERM,
    WILDCARD,
    parse_query,
)
from dhr_spark.operators.termfreq import with_tokens
from dhr_spark.operators.wand import Searcher


# ------------------------------------------------------------------ parser

def test_parse_flat_clauses():
    p = parse_query('+alpha -beta gamma "delta epsilon"~2 wild* fu?z zeta~1 eta~')
    kinds = [(c.occur, c.kind, c.text) for c in p.clauses]
    assert kinds == [
        (MUST, TERM, "alpha"),
        (MUST_NOT, TERM, "beta"),
        (SHOULD, TERM, "gamma"),
        (SHOULD, PHRASE, "delta epsilon"),
        (SHOULD, WILDCARD, "wild*"),
        (SHOULD, WILDCARD, "fu?z"),
        (SHOULD, FUZZY, "zeta"),
        (SHOULD, FUZZY, "eta"),
    ]
    assert p.clauses[3].slop == 2
    assert p.clauses[6].edits == 1 and p.clauses[7].edits == 2


def test_parse_rejects_unsupported():
    for bad in ["(a b)", "a^x", "a^", "a AND b", "a OR b", "NOT a"]:
        with pytest.raises(ValueError):
            parse_query(bad)


def test_parse_boosts():
    p = parse_query('alpha^2 +beta^0.5 wild*^3 zeta~1^1.5 "a b"~2^4 plain')
    got = [(c.kind, c.text, c.boost) for c in p.clauses]
    assert got == [
        (TERM, "alpha", 2.0),
        (TERM, "beta", 0.5),
        (WILDCARD, "wild*", 3.0),
        (FUZZY, "zeta", 1.5),
        (PHRASE, "a b", 4.0),
        (TERM, "plain", 1.0),
    ]
    assert p.clauses[3].edits == 1 and p.clauses[4].slop == 2
    assert not p.pure_should_terms  # boosted strings leave the fast path


def test_parse_pure_should():
    assert parse_query("a b c").pure_should_terms
    assert not parse_query("+a b").pure_should_terms
    assert not parse_query('"a b"').pure_should_terms
    assert not parse_query("a^2 b").pure_should_terms


# --------------------------------------------------------------- execution

@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("syntax_idx") / "idx")
    tr = synth_transcripts(spark, 40)
    build_index(spark, tr, idx, chunk_bits=6, block_size=8,
                docid_strategy="window", positional=True,
                docvalues=["role"])
    s = Searcher(spark, idx)
    tok = with_tokens(with_docids(tr, "window"), mode="lucene")
    # derive a phrase guaranteed to exist: two adjacent raw words of some
    # doc that each analyze to one non-stop token
    phrase = None
    docs = with_docids(tr, "window").select("text").limit(50).collect()
    for row in docs:
        ws = (row["text"] or "").split()
        for a, b in zip(ws, ws[1:]):
            if len(s._analyze(a)) == 1 and len(s._analyze(b)) == 1:
                cand = f"{a} {b}"
                if s.search_phrase(cand).count() > 0:
                    phrase = cand
                    break
        if phrase:
            break
    assert phrase, "no analyzable adjacent word pair found in fixture"
    return dict(searcher=s, tok=tok, phrase=phrase)


def _rows(df):
    return sorted(
        (r["qid"], r["docid"], r["rank"], round(r["score"], 6))
        for r in df.collect()
    )


def _docs_with(env, term):
    return {
        r["docid"]
        for r in env["tok"]
        .filter(F.array_contains("tokens", term))
        .select("docid")
        .collect()
    }


def test_pure_should_routes_to_wand(spark, env):
    q = synth_queries(spark, 6)
    assert _rows(env["searcher"].search_syntax(q, k=15)) == _rows(
        env["searcher"].search(q, k=15)
    )


def test_single_wildcard_equals_search_wildcard(spark, env):
    q = spark.createDataFrame([("w1", "tab*")], "qid string, text string")
    got = _rows(env["searcher"].search_syntax(q, k=10, max_expansions=8))
    want = _rows(
        env["searcher"].search_wildcard([("w1", "tab*")], k=10,
                                        max_expansions=8)
    )
    assert got == want and got


def test_parse_regexp_clauses():
    from dhr_spark.operators.queryparser import REGEXP

    p = parse_query('+/sc.n|sl.w/ table -/zz+q/ /qu(ery|ary)/^2.5')
    kinds = [(c.occur, c.kind, c.text, c.boost) for c in p.clauses]
    assert kinds == [
        (MUST, REGEXP, "sc.n|sl.w", 1.0),
        (SHOULD, TERM, "table", 1.0),
        (MUST_NOT, REGEXP, "zz+q", 1.0),
        (SHOULD, REGEXP, "qu(ery|ary)", 2.5),
    ]
    with pytest.raises(ValueError):
        parse_query("//")  # empty regex body
    with pytest.raises(ValueError):
        parse_query("(a b)")  # grouping still rejected outside regexes
    # a slash-bearing bare token is NOT a regex clause
    assert parse_query("path/to/file").clauses[0].kind == TERM


def test_single_regexp_equals_search_regexp(spark, env):
    q = spark.createDataFrame([("r1", "/tab.*/")], "qid string, text string")
    got = _rows(env["searcher"].search_syntax(q, k=10, max_expansions=8))
    want = _rows(
        env["searcher"].search_regexp([("r1", "tab.*")], k=10,
                                      max_expansions=8)
    )
    assert got == want and got


def test_single_fuzzy_equals_search_fuzzy(spark, env):
    q = spark.createDataFrame([("f1", "tabel~2")], "qid string, text string")
    got = _rows(env["searcher"].search_syntax(q, k=10))
    want = _rows(env["searcher"].search_fuzzy([("f1", "tabel")], k=10))
    assert got == want and got


def test_must_and_not_filter_membership(spark, env):
    s = env["searcher"]
    # pick two corpus terms (post-analysis) present in the fixture
    base = spark.createDataFrame(
        [("q", "table merge slow")], "qid string, text string"
    )
    full = {r["docid"]: r["score"]
            for r in s.search(base, k=1_000_000, prune=False).collect()}
    must, forbidden = "tabl", "merg"  # lucene-analyzed stems
    got = s.search_syntax(
        spark.createDataFrame(
            [("q", "+table merge slow -nonexistentzz")],
            "qid string, text string",
        ),
        k=1_000_000,
    ).collect()
    have_must = _docs_with(env, must)
    assert got
    for r in got:
        assert r["docid"] in have_must
        assert round(full[r["docid"]], 6) == pytest.approx(r["score"], abs=1e-6)
    # and -term actually removes
    got2 = {
        r["docid"]
        for r in s.search_syntax(
            spark.createDataFrame(
                [("q", "+table merge slow -merge")],
                "qid string, text string",
            ),
            k=1_000_000,
        ).collect()
    }
    have_not = _docs_with(env, forbidden)
    assert got2 and not (got2 & have_not)
    assert got2 == {d for r in got if (d := r["docid"]) not in have_not}


def test_phrase_clause_sloppy_freq_bm25(spark, env):
    s = env["searcher"]
    phrase = env["phrase"]
    hits = {r["docid"]: r["n_matches"]
            for r in s.search_phrase(phrase).collect()}
    q = spark.createDataFrame(
        [("p", f'"{phrase}"')], "qid string, text string"
    )
    got = {r["docid"]: r["score"] for r in s.search_syntax(q, k=100).collect()}
    man = s.manifest
    dlmap = {r["docid"]: r["dl"]
             for r in s.doc_lengths_frame().collect()}
    n, df_p = int(man["n_docs"]), len(hits)
    idf = math.log(1.0 + (n - df_p + 0.5) / (df_p + 0.5))
    assert set(got) == set(hits)
    for d, nm in hits.items():
        w = idf * nm / (nm + s.k1 * (1 - s.b + s.b * dlmap[d] / s._avgdl))
        assert got[d] == pytest.approx(round(w, 6), abs=1e-6)


def test_must_phrase_gates_and_scores(spark, env):
    s = env["searcher"]
    phrase = env["phrase"]
    hits = {r["docid"] for r in s.search_phrase(phrase).collect()}
    q = spark.createDataFrame(
        [("p", f'+"{phrase}" table')], "qid string, text string"
    )
    got = {r["docid"] for r in s.search_syntax(q, k=1_000_000).collect()}
    assert got == hits  # gated to phrase matches, scored with table added


def test_unsatisfiable_must_empties_query(spark, env):
    s = env["searcher"]
    for qs in ["+zzzznotaword table", '+"zzzz qqqq" table']:
        q = spark.createDataFrame([("q", qs)], "qid string, text string")
        assert s.search_syntax(q, k=10).count() == 0


def test_mixed_batch_isolates_queries(spark, env):
    """A boolean query and a plain query in one batch don't cross-talk."""
    s = env["searcher"]
    q = spark.createDataFrame(
        [("a", "table merge"), ("b", "+table -merge slow")],
        "qid string, text string",
    )
    res = s.search_syntax(q, k=10).collect()
    plain = _rows(
        s.search(
            spark.createDataFrame([("a", "table merge")],
                                  "qid string, text string"),
            k=10,
        )
    )
    assert _rows_of(res, "a") == [(d, r, sc) for (_, d, r, sc) in plain]
    assert all(r["qid"] in ("a", "b") for r in res)


def _rows_of(rows, qid):
    return sorted(
        (r["docid"], r["rank"], round(r["score"], 6))
        for r in rows
        if r["qid"] == qid
    )


def test_boost_scales_contributions_exactly(spark, env):
    """score(t1^2 t2^0.5) == 2*score(t1) + 0.5*score(t2) per doc — the
    qtf-fold IS Lucene BoostQuery because BM25 is qtf-linear; boosted
    phrase clauses scale their sloppy-freq contribution the same way."""
    s = env["searcher"]
    toks = env["phrase"].split()
    t1, t2 = toks[0], toks[1]

    def scores(text):
        q = spark.createDataFrame([("x", text)], "qid string, text string")
        return {
            r["docid"]: r["score"]
            for r in s.search_syntax(q, k=1_000_000).collect()
        }

    a, b_ = scores(t1 + " zzznotaword"), scores(t2 + " zzznotaword")
    got = scores(f"{t1}^2 {t2}^0.5")
    want = {}
    for d, v in a.items():
        want[d] = want.get(d, 0.0) + 2.0 * v
    for d, v in b_.items():
        want[d] = want.get(d, 0.0) + 0.5 * v
    assert got and set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=2e-6)

    # boosted MUST_NOT is legal and contributes nothing
    gate = scores(f"{t1} -{t2}^9")
    assert set(gate) == set(a) - set(b_)


# ------------------------------------------------------- property (parser)

def test_parser_never_crashes_property():
    """parse_query on arbitrary printable strings either returns a
    ParsedQuery or raises ValueError — never any other exception — and
    every structured clause it does build round-trips its modifiers."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F
        ),
        min_size=1, max_size=8,
    )
    clause = st.one_of(
        word,
        word.map(lambda w: f"+{w}"),
        word.map(lambda w: f"-{w}"),
        word.map(lambda w: f"{w}*"),
        st.tuples(word, st.integers(0, 3)).map(lambda t: f"{t[0]}~{t[1]}"),
        st.tuples(word, word).map(lambda t: f'"{t[0]} {t[1]}"'),
        st.tuples(word, st.integers(0, 9)).map(lambda t: f'"{t[0]}"~{t[1]}'),
        st.tuples(word, st.floats(0.1, 9.9).map(lambda f: round(f, 2))).map(
            lambda t: f"{t[0]}^{t[1]}"
        ),
    )
    structured = st.lists(clause, min_size=0, max_size=5).map(" ".join)
    arbitrary = st.text(max_size=40)

    @given(st.one_of(structured, arbitrary))
    @settings(max_examples=300, deadline=None)
    def check(s):
        try:
            p = parse_query(s)
        except ValueError:
            return
        from dhr_spark.operators.queryparser import FIELD, FIELD_RANGE, REGEXP

        for c in p.clauses:
            assert c.occur in (SHOULD, MUST, MUST_NOT)
            assert c.kind in (
                TERM, PHRASE, WILDCARD, FUZZY, FIELD, REGEXP, FIELD_RANGE
            )
            assert c.boost > 0 and c.slop >= 0 and c.edits >= 0
            # doubled modifiers ("--a") keep the inner char in the body —
            # the analyzer strips punctuation downstream, matching Lucene's
            # lenient handling; the body is never empty though
            assert c.text

    check()


def test_parser_structured_roundtrip_property():
    """Structured single-clause strings parse to exactly the clause that
    generated them (kind, body, slop/edits/boost)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcdefghij", min_size=1, max_size=6)

    @given(
        word,
        st.sampled_from(["", "+", "-"]),
        st.sampled_from(["term", "wild", "fuzzy", "phrase"]),
        st.integers(0, 5),
        st.one_of(st.none(), st.floats(0.5, 8.0).map(lambda f: round(f, 1))),
    )
    @settings(max_examples=200, deadline=None)
    def check(w, occ, kind, num, boost):
        if kind == "term":
            body = w
        elif kind == "wild":
            body = w + "*"
        elif kind == "fuzzy":
            body = f"{w}~{num % 3}"
        else:
            body = f'"{w} {w}"~{num}'
        s = occ + body + (f"^{boost}" if boost is not None else "")
        p = parse_query(s)
        assert len(p.clauses) == 1
        c = p.clauses[0]
        assert c.occur == {"": SHOULD, "+": MUST, "-": MUST_NOT}[occ]
        assert c.boost == (boost if boost is not None else 1.0)
        if kind == "term":
            assert c.kind == TERM and c.text == w
        elif kind == "wild":
            assert c.kind == WILDCARD and c.text == w + "*"
        elif kind == "fuzzy":
            assert c.kind == FUZZY and c.text == w and c.edits == num % 3
        else:
            assert c.kind == PHRASE and c.text == f"{w} {w}" and c.slop == num

    check()


def test_parse_field_clauses():
    from dhr_spark.operators.queryparser import FIELD

    p = parse_query("role:user +lang:de -tool:bash table turn_idx:3")
    got = [(c.occur, c.kind, c.field_name, c.text) for c in p.clauses]
    assert got == [
        (SHOULD, FIELD, "role", "user"),
        (MUST, FIELD, "lang", "de"),
        (MUST_NOT, FIELD, "tool", "bash"),
        (SHOULD, TERM, "", "table"),
        (SHOULD, FIELD, "turn_idx", "3"),
    ]
    assert not p.pure_should_terms
    # time-like tokens are NOT field clauses (non-identifier prefix)
    assert parse_query("12:30").clauses[0].kind == TERM
    for bad in ["role:", 'role:"a b"', "role:us*", "role:user^2", "role:u~1"]:
        with pytest.raises(ValueError):
            parse_query(bad)


def test_field_clause_filters_not_scores(spark, env):
    """role:user gates hits to user turns without touching scores;
    -role:user excludes them; a MUST term + field filter equals the
    search_filtered composition; field-only queries return nothing."""
    s = env["searcher"]
    base = spark.createDataFrame(
        [("q", "table merge")], "qid string, text string"
    )
    full = {r["docid"]: r["score"]
            for r in s.search(base, k=1_000_000, prune=False).collect()}
    roles = {r["docid"]: r["role"]
             for r in s.docvalues_frame(["role"]).collect()}

    got = {r["docid"]: r["score"] for r in s.search_syntax(
        spark.createDataFrame([("q", "table merge role:user")],
                              "qid string, text string"),
        k=1_000_000,
    ).collect()}
    want = {d: v for d, v in full.items() if roles[d] == "user"}
    assert got and set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(round(want[d], 6), abs=1e-6)

    neg = {r["docid"] for r in s.search_syntax(
        spark.createDataFrame([("q", "table merge -role:user")],
                              "qid string, text string"),
        k=1_000_000,
    ).collect()}
    assert neg and neg == {d for d in full if roles[d] != "user"}

    # equals the search_filtered composition on the same predicate
    sf = {r["docid"]: r["score"] for r in s.search_filtered(
        base, "role", values=["user"], k=1_000_000
    ).collect()}
    assert set(sf) == set(got)
    for d in got:
        assert got[d] == pytest.approx(sf[d], abs=1e-6)

    only = s.search_syntax(
        spark.createDataFrame([("q", "role:user")],
                              "qid string, text string"),
        k=10,
    )
    assert only.count() == 0


def test_minimum_should_match(spark, env):
    """min_should_match=m keeps docs satisfying >= m distinct SHOULD
    clauses (corpus-recomputed); m above the clause count empties the
    query; MUST clauses still gate independently; m<=1 is a no-op."""
    s = env["searcher"]
    q = spark.createDataFrame(
        [("q", "table merge slow")], "qid string, text string"
    )
    toks = ["tabl", "merg", "slow"]  # lucene-analyzed clause tokens
    have = {t: _docs_with(env, t) for t in toks}

    base = {r["docid"]: r["score"]
            for r in s.search(q, k=1_000_000, prune=False).collect()}
    m1 = {r["docid"]: r["score"]
          for r in s.search_syntax(q, k=1_000_000,
                                   min_should_match=1).collect()}
    assert m1 == {d: round(v, 6) for d, v in base.items()} or set(m1) == set(base)

    m2 = {r["docid"] for r in s.search_syntax(
        q, k=1_000_000, min_should_match=2
    ).collect()}
    want2 = {d for d in base
             if sum(d in have[t] for t in toks) >= 2}
    assert m2 and m2 == want2

    m9 = s.search_syntax(q, k=10, min_should_match=9)
    assert m9.count() == 0

    # MUST gates independently of the SHOULD requirement
    qm = spark.createDataFrame(
        [("q", "+table merge slow")], "qid string, text string"
    )
    got = {r["docid"] for r in s.search_syntax(
        qm, k=1_000_000, min_should_match=1
    ).collect()}
    want = {d for d in base
            if d in have["tabl"] and (d in have["merg"] or d in have["slow"])}
    assert got and got == want


def test_parse_field_range_clauses():
    from dhr_spark.operators.queryparser import FIELD_RANGE

    p = parse_query("+n_chars:[10 TO 90] table -ts:[* TO 5] lang:[a TO *]")
    rng = [(c.occur, c.kind, c.field_name, c.lo, c.hi) for c in p.clauses
           if c.kind == FIELD_RANGE]
    assert rng == [
        (MUST, FIELD_RANGE, "n_chars", "10", "90"),
        (MUST_NOT, FIELD_RANGE, "ts", "*", "5"),
        (SHOULD, FIELD_RANGE, "lang", "a", "*"),
    ]
    with pytest.raises(ValueError, match="open on both ends"):
        parse_query("x:[* TO *]")
    with pytest.raises(ValueError):
        parse_query("n_chars:[1 TO 2]^2")  # ranges are filter context


def test_field_range_filters_not_scores(spark, env):
    """turn_idx:[lo TO hi] gates hits without touching scores, matches the
    search_filtered range composition, honors open ends and MUST_NOT."""
    s = env["searcher"]
    base = spark.createDataFrame(
        [("q", "table merge")], "qid string, text string"
    )
    full = {r["docid"]: r["score"]
            for r in s.search(base, k=1_000_000, prune=False).collect()}
    tix = {r["docid"]: r["turn_idx"]
           for r in s.docvalues_frame(["turn_idx"]).collect()}

    got = {r["docid"]: r["score"] for r in s.search_syntax(
        spark.createDataFrame([("q", "table merge turn_idx:[1 TO 3]")],
                              "qid string, text string"),
        k=1_000_000,
    ).collect()}
    want = {d: v for d, v in full.items() if 1 <= tix[d] <= 3}
    assert got and set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(round(want[d], 6), abs=1e-6)

    sf = {r["docid"]: r["score"] for r in s.search_filtered(
        base, "turn_idx", lo=1, hi=3, k=1_000_000
    ).collect()}
    assert set(sf) == set(got)

    open_hi = {r["docid"] for r in s.search_syntax(
        spark.createDataFrame([("q", "table merge turn_idx:[2 TO *]")],
                              "qid string, text string"),
        k=1_000_000,
    ).collect()}
    assert open_hi == {d for d in full if tix[d] >= 2}

    excl = {r["docid"] for r in s.search_syntax(
        spark.createDataFrame([("q", "table merge -turn_idx:[0 TO 1]")],
                              "qid string, text string"),
        k=1_000_000,
    ).collect()}
    assert excl and excl == {d for d in full if tix[d] > 1}
