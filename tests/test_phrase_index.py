"""Index-backed phrase search (positions artifact) must equal the corpus-scan
phrase matcher, honor the analyzer chain, and survive incremental appends."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.index.builder import build_index, build_index_from_docs
from dhr_spark.operators.phrase import phrase_match
from dhr_spark.operators.wand import Searcher

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.col("doc_id").alias("docid"), "text")
    )


@pytest.fixture(scope="module")
def idx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("phidx") / "idx")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple", chunk_bits=6, block_size=16,
        positional=True,
    )
    return d


def _as_map(rows):
    return {r["docid"]: (r["n_matches"], r["first_pos"]) for r in rows}


@pytest.mark.parametrize("phrase", ["table hash", "big order scan", "hash"])
def test_index_phrase_equals_corpus_scan(spark, docs, idx, phrase):
    s = Searcher(spark, idx)
    fast = _as_map(s.search_phrase(phrase).collect())
    slow = _as_map(
        phrase_match(docs, phrase, id_col="docid").collect()
    )
    assert fast == slow and fast  # non-trivial match sets


def test_index_phrase_oov_and_guards(spark, idx, docs, tmp_path):
    s = Searcher(spark, idx)
    assert s.search_phrase("zzyzx table").count() == 0
    with pytest.raises(ValueError, match="no indexable"):
        s.search_phrase("!!!")
    d = str(tmp_path / "nopos")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple", chunk_bits=6, block_size=16
    )
    with pytest.raises(ValueError, match="positional"):
        Searcher(spark, d).search_phrase("table hash")


def test_lucene_position_increments(spark, tmp_path):
    # Lucene semantics: stopwords CONSUME a position (StopFilter increments)
    # — "new the york" stores new@0/york@2, so the exact phrase "new york"
    # does not match it while slop=1 does (Anserini PhraseQuery behavior)
    tr = spark.createDataFrame(
        [("c1", 0, "u", "new the york city", None, None),
         ("c1", 1, "u", "new york city", None, None),
         ("c1", 2, "u", "york new city", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    d = str(tmp_path / "idx")
    build_index(spark, tr, d, chunk_bits=6, block_size=16,
                docid_strategy="window", positional=True)
    s = Searcher(spark, d)
    exact = _as_map(s.search_phrase("new york").collect())
    assert exact == {1: (1, 0)}  # only the gap-free turn
    sloppy = {r["docid"] for r in s.search_phrase("new york", slop=1).collect()}
    assert sloppy == {0, 1}  # slop=1 bridges the stopword hole, stays ordered


def test_lucene_gapped_query_phrase(spark, tmp_path):
    # a stopword INSIDE the query phrase carries its increment too: "slow
    # the hash" exact-matches only text with the same one-position gap
    tr = spark.createDataFrame(
        [("c1", 0, "u", "slow the hash", None, None),
         ("c1", 1, "u", "slow hash", None, None),
         ("c1", 2, "u", "the slow in hash", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    d = str(tmp_path / "idx")
    build_index(spark, tr, d, chunk_bits=6, block_size=16,
                docid_strategy="window", positional=True)
    s = Searcher(spark, d)
    got = _as_map(s.search_phrase("slow the hash").collect())
    # turn 0: slow@0 hash@2 — matches the gapped query (anchor at slow@0);
    # turn 2: slow@1 hash@3 — same relative gap, anchored at 1
    assert got == {0: (1, 0), 2: (1, 1)}


def test_positions_survive_append(spark, idx, tmp_path):
    import shutil

    from dhr_spark.index.incremental import append_to_index

    d = str(tmp_path / "idx2")
    shutil.copytree(idx, d)
    extra = spark.createDataFrame(
        [("x-1", 0, "u", "table hash table hash", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    man = append_to_index(spark, extra, d)
    new_docid = man["next_docid"] - 1
    got = _as_map(Searcher(spark, d).search_phrase("table hash").collect())
    assert got[new_docid] == (2, 0)


def _naive_sloppy(tok_lists, phrase, slop):
    """anchors p0 s.t. ordered positions exist with span <= len-1+slop."""
    out = {}
    for docid, toks in tok_lists:
        pos = [[i for i, t in enumerate(toks) if t == term] for term in phrase]
        if any(not p for p in pos):
            continue
        anchors = []
        for p0 in pos[0]:
            bound = p0 + len(phrase) - 1 + slop

            def ok(i, prev):
                if i == len(phrase):
                    return True
                return any(prev < q <= bound and ok(i + 1, q) for q in pos[i])

            if ok(1, p0):
                anchors.append(p0)
        if anchors:
            out[docid] = (len(anchors), anchors[0])
    return out


def test_sloppy_phrase_vs_naive(spark, tmp_path):
    import random

    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd"]
    rows = [
        ("c", i, "u", " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))),
         None, None)
        for i in range(80)
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp",
    )
    d = str(tmp_path / "idx")
    build_index(spark, tr, d, chunk_bits=6, block_size=8,
                docid_strategy="window", analyzer_mode="simple",
                positional=True)
    tok_lists = [(r[1], r[3].split()) for r in rows]  # docid == turn_idx here
    s = Searcher(spark, d)
    for phrase, slop in [(["aa", "bb"], 0), (["aa", "bb"], 2),
                         (["aa", "bb", "cc"], 1), (["bb", "bb"], 3)]:
        got = _as_map(s.search_phrase(" ".join(phrase), slop=slop).collect())
        want = _naive_sloppy(tok_lists, phrase, slop)
        assert got == want, (phrase, slop)


def test_slop_zero_equals_exact_path(spark, idx):
    s = Searcher(spark, idx)
    exact = _as_map(s.search_phrase("table hash").collect())
    via_chain = _as_map(s.search_phrase("table hash", slop=0).collect())
    assert exact == via_chain and exact


def test_index_proximity_equals_corpus_scan(spark, docs, idx):
    from dhr_spark.operators.phrase import proximity_match

    s = Searcher(spark, idx)
    for terms, w in [(["customer", "join", "scan"], 12), (["table", "hash"], 4)]:
        fast = {(r["docid"], r["window_start"])
                for r in s.search_proximity(terms, w).collect()}
        slow = {(r["docid"], r["window_start"])
                for r in proximity_match(docs, terms, w, id_col="docid").collect()}
        assert fast == slow and fast


def test_index_proximity_oov_returns_empty(spark, idx):
    assert Searcher(spark, idx).search_proximity(["zzyzx", "table"], 5).count() == 0


def test_phrase_batch_equals_per_phrase(spark, idx):
    """search_phrase_batch must equal looping search_phrase, including the
    OOV-phrase drop, with gapped and repeated-term phrases in the mix."""
    s = Searcher(spark, idx)
    phrases = [
        ("b1", "table hash"),
        ("b2", "big order scan"),
        ("b3", "hash"),
        ("b4", "zzyzx table"),   # OOV -> no rows
        ("b5", "value value"),   # repeated term
    ]
    ph = spark.createDataFrame(phrases, "qid string, phrase string")
    got = {}
    for r in s.search_phrase_batch(ph).collect():
        got.setdefault(r["qid"], {})[r["docid"]] = (r["n_matches"], r["first_pos"])
    want = {}
    for qid, p in phrases:
        try:
            one = s.search_phrase(p).collect()
        except ValueError:
            continue
        for r in one:
            want.setdefault(qid, {})[r["docid"]] = (r["n_matches"], r["first_pos"])
    assert got == want
    assert "b4" not in got and got.get("b1")


def test_phrase_batch_lucene_gaps(spark, tmp_path):
    """Batch path honors Lucene position increments like search_phrase."""
    from dhr_spark.index.builder import build_index

    tr = spark.createDataFrame(
        [("c1", 0, "u", "new the york", None, None),
         ("c1", 1, "u", "new york", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    d = str(tmp_path / "idx")
    build_index(spark, tr, d, chunk_bits=6, block_size=16,
                docid_strategy="window", positional=True)
    ph = spark.createDataFrame(
        [("g1", "new york"), ("g2", "new the york")], "qid string, phrase string"
    )
    out = {(r["qid"], r["docid"]) for r in
           Searcher(spark, d).search_phrase_batch(ph).collect()}
    assert out == {("g1", 1), ("g2", 0)}


# ------------------------------------------------- index-backed span queries

def test_index_span_first_equals_corpus_scan(spark, docs, idx):
    from dhr_spark.operators.phrase import span_first_match

    s = Searcher(spark, idx)
    for phrase, end in (("table", 6), ("hash", 3)):
        fast = _as_map(s.search_span_first(phrase, end).collect())
        slow = _as_map(
            span_first_match(docs, phrase, end, id_col="docid").collect()
        )
        assert fast == slow and fast, (phrase, end)


def test_index_span_not_equals_corpus_scan(spark, docs, idx):
    from dhr_spark.operators.phrase import span_not_match

    s = Searcher(spark, idx)
    cases = [("table", "scan", 0, 1), ("spark", "table", 1, 1),
             ("hash", "zzyzx", 0, 0)]
    for inc, exc, pre, post in cases:
        fast = _as_map(s.search_span_not(inc, exc, pre=pre, post=post).collect())
        slow = _as_map(
            span_not_match(docs, inc, exc, pre=pre, post=post,
                           id_col="docid").collect()
        )
        assert fast == slow, (inc, exc, pre, post)
        assert fast  # non-trivial


def test_index_span_guards(spark, idx):
    s = Searcher(spark, idx)
    with pytest.raises(ValueError, match="pre/post"):
        s.search_span_not("table", "scan", pre=-1)
    assert s.search_span_first("zzyzx", 10).count() == 0
    assert s.search_span_not("zzyzx", "table").count() == 0


def test_index_span_lucene_gaps(spark, tmp_path):
    """Under the lucene chain, stopwords consume positions: the span width
    of "new the york" is 3, so SpanFirst(end=3) accepts only a span starting
    at 0 — and SpanNot widening counts gap tokens too."""
    docs = spark.createDataFrame(
        [(0, "new the york stuff"), (1, "pad new the york")],
        "docid long, text string",
    )
    d = str(tmp_path / "gapidx")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="lucene", chunk_bits=6, block_size=16,
        positional=True,
    )
    s = Searcher(spark, d)
    # query "new the york": the stopword consumes position 1, so offsets
    # are [0, 2] and the span width is 3 (matches "new <gap> york" text)
    got = _as_map(s.search_span_first("new the york", 3).collect())
    assert got == {0: (1, 0)}  # doc1's span is [1, 4) -> end 4 > 3
    got = _as_map(s.search_span_first("new the york", 4).collect())
    assert got == {0: (1, 0), 1: (1, 1)}


def test_span_or_corpus_and_index_agree(spark, docs, idx):
    from dhr_spark.operators.phrase import span_or_match

    s = Searcher(spark, idx)
    phrases = ["table hash", "hash", "zzyzx"]
    fast = _as_map(s.search_span_or(phrases).collect())
    slow = _as_map(span_or_match(docs, phrases, id_col="docid").collect())
    assert fast == slow and fast
    # distinct-start union: "hash" alone is a subset
    solo = _as_map(s.search_span_or(["hash"]).collect())
    assert all(d in fast and fast[d][0] >= n for d, (n, _) in solo.items())


def test_span_or_guards(spark, idx):
    s = Searcher(spark, idx)
    with pytest.raises(ValueError, match="at least one"):
        s.search_span_or([])
    assert s.search_span_or(["zzyzx", "qqqqz"]).count() == 0


def test_span_or_stopword_member_is_noop(spark, tmp_path):
    """Under the lucene chain an all-stopword member analyzes to nothing:
    the parser-built SpanOr simply has no clause for it — it must behave
    exactly like an OOV member (contribute nothing), never raise."""
    docs = spark.createDataFrame(
        [(0, "new the york stuff"), (1, "pad new the york")],
        "docid long, text string",
    )
    d = str(tmp_path / "soidx")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="lucene", chunk_bits=6, block_size=16,
        positional=True,
    )
    s = Searcher(spark, d)
    assert s.search_span_or(["the"]).count() == 0
    with_stop = _as_map(s.search_span_or(["the", "york"]).collect())
    without = _as_map(s.search_span_or(["york"]).collect())
    assert with_stop == without and with_stop


# ---------------- match_phrase_prefix (MultiPhraseQuery) ----------------


@pytest.mark.parametrize("phrase", ["table ha", "big order sc", "ha"])
def test_phrase_prefix_index_equals_corpus_scan(spark, docs, idx, phrase):
    from dhr_spark.operators.phrase import phrase_prefix_match

    s = Searcher(spark, idx)
    fast = _as_map(s.search_phrase_prefix(phrase).collect())
    slow = _as_map(
        phrase_prefix_match(docs, phrase, id_col="docid").collect()
    )
    assert fast == slow and fast
    # resident-cache and distributed-dictionary twins must agree
    s._tid_cache = None
    assert _as_map(s.search_phrase_prefix(phrase).collect()) == fast


def test_phrase_prefix_expansion_cap_is_term_asc(spark):
    """max_expansions keeps the LEXICOGRAPHICALLY SMALLEST completions
    (Lucene TermsEnum order), and completions landing on the same start
    collapse to one match (MultiPhraseQuery position enumeration)."""
    from dhr_spark.operators.phrase import phrase_prefix_match

    docs = spark.createDataFrame(
        [
            (0, "run fast zebra"),   # completion 'fast'
            (1, "run faze zebra"),   # completion 'faze'
            (2, "run fb zebra"),     # completion 'fb'
        ],
        "doc_id long, text string",
    )
    def as_map(rows):
        return {r["doc_id"]: (r["n_matches"], r["first_pos"]) for r in rows}

    full = as_map(
        phrase_prefix_match(docs, "run f", id_col="doc_id").collect()
    )
    assert set(full) == {0, 1, 2}
    capped = as_map(
        phrase_prefix_match(
            docs, "run f", max_expansions=2, id_col="doc_id"
        ).collect()
    )
    assert set(capped) == {0, 1}  # 'fast', 'faze' sort before 'fb'
    assert capped[0] == (1, 0)


def test_phrase_prefix_no_completion_and_oov_fixed(spark, docs, idx):
    from dhr_spark.operators.phrase import phrase_prefix_match

    s = Searcher(spark, idx)
    assert s.search_phrase_prefix("table zzyzx").count() == 0
    assert (
        phrase_prefix_match(docs, "table zzyzx", id_col="docid").count() == 0
    )
    assert s.search_phrase_prefix("zzyzx ta").count() == 0
    with pytest.raises(ValueError, match="no indexable"):
        s.search_phrase_prefix("!!!")


def test_phrase_prefix_needs_positions(spark, docs, tmp_path):
    d = str(tmp_path / "noposp")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple", chunk_bits=6, block_size=16
    )
    with pytest.raises(ValueError, match="positional"):
        Searcher(spark, d).search_phrase_prefix("table ha")


def test_phrase_prefix_respects_lucene_gaps(spark, tmp_path):
    """Under the lucene chain a stopword consumes a position: 'new york*'
    must match 'new yorker' but NOT 'new the yorker' (the completion sits
    at increment 2, not 1)."""
    docs = spark.createDataFrame(
        [(0, "new yorker bagel"), (1, "new the yorker bagel")],
        "docid long, text string",
    )
    d = str(tmp_path / "gapidx")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="lucene", chunk_bits=6, block_size=16,
        positional=True,
    )
    s = Searcher(spark, d)
    got = _as_map(s.search_phrase_prefix("new york").collect())
    assert got == {0: (1, 0)}
