"""Interval queries (operators/intervals.py + Searcher.search_intervals).

Pins: (1) the minimal-interval algebra against an exhaustive brute-force
enumerator (hypothesis over random token streams and random trees — the
greedy ordered chain and the k-pointer unordered sweep must produce EXACTLY
the minimal set the full combo enumeration produces), (2) ES/Lucene hand
examples incl. max_gaps and every filter relation, (3) the corpus-scan
DataFrame operator against direct per-doc evaluation, (4) index-backed ==
corpus-scan identity on real testdata, (5) OOV / stopword / guard behavior.
"""

from __future__ import annotations

from itertools import product

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dhr_spark.index.builder import build_index_from_docs
from dhr_spark.operators import intervals as IV
from dhr_spark.operators.intervals import (
    all_of,
    any_of,
    contained_by,
    containing,
    eval_intervals,
    interval_match,
    leaf_terms,
    match,
    not_containing,
    not_overlapping,
    overlapping,
)
from dhr_spark.operators.wand import Searcher

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- brute force


def _brute_minimal(cands):
    """Full pairwise-containment minimality over deduped (s, e) pairs."""
    cset = sorted({(s, e) for s, e, *_ in cands})
    return [
        (s, e)
        for s, e in cset
        if not any(
            (s2 >= s and e2 <= e and (s2, e2) != (s, e)) for s2, e2 in cset
        )
    ]


def brute(source, posmap):
    """Exhaustive reference: children's minimal sets -> ALL combos ->
    dedupe -> pairwise minimality. max_gaps is not modeled here (tested
    separately on hand cases where the covered width is unambiguous)."""
    op = source["op"]
    if op in ("match", "all_of"):
        if op == "match":
            kids = [
                [(p, p) for p in posmap.get(t, ())] for t in source["terms"]
            ]
        else:
            kids = [brute(c, posmap) for c in source["sources"]]
        if len(kids) == 1:
            return sorted(set(kids[0]))
        if any(not k for k in kids):
            return []
        out = []
        for combo in product(*kids):
            if source["ordered"]:
                ok = all(
                    combo[i][0] > combo[i - 1][1] for i in range(1, len(combo))
                )
                if not ok:
                    continue
                out.append((combo[0][0], combo[-1][1]))
            else:
                out.append(
                    (min(c[0] for c in combo), max(c[1] for c in combo))
                )
        return _brute_minimal(out)
    if op == "any_of":
        merged = []
        for c in source["sources"]:
            merged.extend(brute(c, posmap))
        return _brute_minimal(merged)
    if op == "filter":
        src = brute(source["source"], posmap)
        flt = brute(source["filter"], posmap)
        kind = source["kind"]
        neg = kind.startswith("not_")
        rel = IV._REL[kind[4:] if neg else kind]
        return [s for s in src if any(rel(s, f) for f in flt) != neg]
    raise AssertionError(op)


def _se(ivs):
    return [(s, e) for s, e, *_ in ivs]


# --------------------------------------------------------------- hand cases


def _pm(text):
    toks = text.split()
    pm = {}
    for i, t in enumerate(toks):
        pm.setdefault(t, []).append(i)
    return pm


def test_ordered_match_basics():
    pm = _pm("my favorite food is cold porridge")
    assert _se(eval_intervals(match("my favorite food", max_gaps=0), pm)) == [
        (0, 2)
    ]
    # gap budget: "favorite porridge" has 3 gaps between the two terms
    assert eval_intervals(match("favorite porridge", max_gaps=2), pm) == []
    assert _se(eval_intervals(match("favorite porridge", max_gaps=3), pm)) == [
        (1, 5)
    ]
    # unordered matches either direction
    assert _se(
        eval_intervals(match("porridge favorite", ordered=False, max_gaps=3), pm)
    ) == [(1, 5)]
    assert (
        eval_intervals(match("porridge favorite", ordered=True), pm) == []
    )


def test_minimality_drops_containing_intervals():
    pm = _pm("a b a")
    # ordered "a b": combos (0,1); (2,?) has no b after -> one interval
    assert _se(eval_intervals(match("a b"), pm)) == [(0, 1)]
    # unordered "a b": windows (0,1) and (1,2) are both minimal
    assert _se(eval_intervals(match("a b", ordered=False), pm)) == [
        (0, 1),
        (1, 2),
    ]
    # "a a" ordered: only (0,2); minimal
    assert _se(eval_intervals(match("a a"), pm)) == [(0, 2)]


def test_any_of_minimalizes_across_sources():
    pm = _pm("a b c")
    src = any_of([match("a c"), match("b")])
    # (0,2) contains (1,1) -> only (1,1) survives
    assert _se(eval_intervals(src, pm)) == [(1, 1)]


def test_all_of_nested_and_gaps():
    pm = _pm("the big red fox jumped over the lazy dog")
    src = all_of([match("big fox", max_gaps=1), match("lazy")], ordered=True)
    assert _se(eval_intervals(src, pm)) == [(1, 7)]
    # gap budget across sub-sources: covered = 3+1, width 7 -> gaps 3
    assert (
        eval_intervals(
            all_of([match("big fox", max_gaps=1), match("lazy")],
                   ordered=True, max_gaps=2),
            pm,
        )
        == []
    )
    assert _se(
        eval_intervals(
            all_of([match("big fox", max_gaps=1), match("lazy")],
                   ordered=True, max_gaps=3),
            pm,
        )
    ) == [(1, 7)]


def test_filter_relations():
    pm = _pm("a b c a c")
    ac = match("a c", max_gaps=-1)  # ordered a..c: minimal (0,2),(3,4)
    assert _se(eval_intervals(ac, pm)) == [(0, 2), (3, 4)]
    assert _se(eval_intervals(containing(ac, match("b")), pm)) == [(0, 2)]
    assert _se(eval_intervals(not_containing(ac, match("b")), pm)) == [(3, 4)]
    assert _se(eval_intervals(contained_by(match("b"), ac), pm)) == [(1, 1)]
    assert _se(eval_intervals(overlapping(ac, match("b")), pm)) == [(0, 2)]
    assert _se(eval_intervals(not_overlapping(ac, match("b")), pm)) == [
        (3, 4)
    ]
    # empty filter: not_* keeps everything, positive keeps nothing
    assert _se(eval_intervals(not_containing(ac, match("zz")), pm)) == [
        (0, 2),
        (3, 4),
    ]
    assert eval_intervals(containing(ac, match("zz")), pm) == []


def test_constructor_guards():
    with pytest.raises(ValueError, match="no indexable"):
        match("!!!")
    with pytest.raises(ValueError, match="at least one"):
        all_of([])
    with pytest.raises(ValueError, match="at least one"):
        any_of([])
    assert leaf_terms(
        all_of([match("a b"), any_of([match("b c"), match("a")])])
    ) == ["a", "b", "c"]


# --------------------------------------------------------------- hypothesis

_tokens = st.lists(
    st.sampled_from(["a", "b", "c"]), min_size=0, max_size=24
)


def _trees(max_depth=2):
    leaf = st.builds(
        match,
        st.sampled_from(["a", "b", "a b", "b c", "a b c", "c a"]),
        ordered=st.booleans(),
    )
    if max_depth == 0:
        return leaf
    sub = _trees(max_depth - 1)
    return st.one_of(
        leaf,
        st.builds(
            all_of,
            st.lists(sub, min_size=2, max_size=3),
            ordered=st.booleans(),
        ),
        st.builds(any_of, st.lists(sub, min_size=1, max_size=3)),
        st.builds(
            lambda s, f, k: IV._filter(k, s, f),
            sub,
            sub,
            st.sampled_from(
                ["containing", "not_containing", "contained_by",
                 "not_contained_by", "overlapping", "not_overlapping"]
            ),
        ),
    )


@given(_tokens, _trees())
@settings(max_examples=400, deadline=None)
def test_algebra_matches_bruteforce(toks, tree):
    pm = {}
    for i, t in enumerate(toks):
        pm.setdefault(t, []).append(i)
    assert _se(eval_intervals(tree, pm)) == brute(tree, pm)


# ---------------------------------------------------------- Spark operators


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.col("doc_id").alias("docid"), "text")
    )


@pytest.fixture(scope="module")
def idx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ividx") / "idx")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple", chunk_bits=6, block_size=16,
        positional=True,
    )
    return d


def _as_map(rows):
    return {
        r["docid"]: (r["n_matches"], r["first_start"], r["first_end"])
        for r in rows
    }


TREES = [
    match("table hash", ordered=False, max_gaps=6),
    match("big order scan", ordered=True, max_gaps=10),
    all_of([match("table"), match("hash scan", max_gaps=4)], ordered=False,
           max_gaps=12),
    any_of([match("table hash", max_gaps=2), match("order scan", max_gaps=2)]),
    not_containing(match("table scan", ordered=False, max_gaps=8),
                   match("hash")),
]


@pytest.mark.parametrize("tree", TREES)
def test_corpus_operator_matches_local_eval(spark, docs, tree):
    got = _as_map(interval_match(docs, tree, id_col="docid").collect())
    want = {}
    for r in docs.collect():
        pm = {}
        for i, t in enumerate(
            __import__("re").findall(r"[a-z0-9]+", r["text"].lower())
        ):
            pm.setdefault(t, []).append(i)
        ivs = eval_intervals(tree, pm)
        if ivs:
            want[r["docid"]] = (len(ivs), ivs[0][0], ivs[0][1])
    assert got == want and got  # non-trivial on this corpus


@pytest.mark.parametrize("tree", TREES)
def test_index_equals_corpus_scan(spark, docs, idx, tree):
    s = Searcher(spark, idx)
    fast = _as_map(s.search_intervals(tree).collect())
    slow = _as_map(interval_match(docs, tree, id_col="docid").collect())
    assert fast == slow and fast


def test_index_guards(spark, docs, idx, tmp_path):
    s = Searcher(spark, idx)
    # all-OOV tree -> empty, no crash
    assert s.search_intervals(match("zzyzx qqxj", ordered=False)).count() == 0
    # partially-OOV all_of -> empty (missing child can never match)
    assert (
        s.search_intervals(all_of([match("table"), match("zzyzx")])).count()
        == 0
    )
    # partially-OOV any_of -> the live arm still matches
    live = s.search_intervals(any_of([match("table"), match("zzyzx")]))
    assert live.count() == s.search_intervals(match("table")).count() > 0
    d = str(tmp_path / "nopos")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple", chunk_bits=6, block_size=16
    )
    with pytest.raises(ValueError, match="positional"):
        Searcher(spark, d).search_intervals(match("table hash"))


# ----------------------------------------------- multiterm leaves + batch


def test_prefix_wildcard_leaf_local_eval():
    from dhr_spark.operators.intervals import prefix, wildcard

    pm = {
        "scan": [1, 7],
        ("prefix", "sca"): [1, 7],
        ("wildcard", "h?sh"): [3],
    }
    src = all_of([prefix("sca"), wildcard("h?sh")], ordered=False)
    ivs = eval_intervals(src, pm)
    assert _se(ivs) == [(1, 3), (3, 7)]
    with pytest.raises(ValueError, match="a-z0-9"):
        prefix("bad prefix!")
    with pytest.raises(ValueError, match="literal"):
        wildcard("***")


def test_corpus_prefix_wildcard_operator(spark, docs):
    from dhr_spark.operators.intervals import prefix, wildcard

    # every doc matched by prefix("tab") must contain a token starting tab
    tree = match_tree = all_of(
        [prefix("tab"), match("hash")], ordered=False, max_gaps=10
    )
    got = interval_match(docs, tree, id_col="docid")
    rows = got.join(docs, "docid").collect()
    assert rows
    import re as _re

    for r in rows:
        toks = _re.findall(r"[a-z0-9]+", r["text"].lower())
        assert any(t.startswith("tab") for t in toks)
        assert "hash" in toks
    wtree = match("scan table", ordered=False, max_gaps=8)
    wtree = all_of([wildcard("sc?n"), match("table")], ordered=False,
                   max_gaps=8)
    wgot = _as_map(interval_match(docs, wtree, id_col="docid").collect())
    # "sc?n" on this corpus only completes to "scan": identical to the
    # term-leaf tree
    tgot = _as_map(
        interval_match(
            docs,
            all_of([match("scan"), match("table")], ordered=False,
                   max_gaps=8),
            id_col="docid",
        ).collect()
    )
    assert wgot == tgot and wgot


def test_index_prefix_wildcard_equals_corpus(spark, docs, idx):
    from dhr_spark.operators.intervals import prefix, wildcard

    s = Searcher(spark, idx)
    for tree in [
        all_of([prefix("tab"), match("hash")], ordered=False, max_gaps=10),
        all_of([wildcard("sc?n"), match("table")], ordered=False,
               max_gaps=8),
        any_of([prefix("zzzz"), match("table hash", max_gaps=2)]),
    ]:
        fast = _as_map(s.search_intervals(tree).collect())
        slow = _as_map(interval_match(docs, tree, id_col="docid").collect())
        assert fast == slow and fast


def test_index_batch_matches_singles(spark, idx):
    s = Searcher(spark, idx)
    trees = [
        ("q1", match("table hash", ordered=False, max_gaps=6)),
        ("q2", match("big order scan", ordered=True, max_gaps=10)),
        ("q3", match("zzyzx")),  # OOV -> contributes no rows
    ]
    batch = s.search_intervals_batch(trees)
    got = {
        (r["qid"], r["docid"]): (r["n_matches"], r["first_start"],
                                 r["first_end"])
        for r in batch.collect()
    }
    want = {}
    for qid, tree in trees:
        for d, v in _as_map(s.search_intervals(tree).collect()).items():
            want[(qid, d)] = v
    assert got == want and got
    assert not any(q == "q3" for q, _ in got)


def test_expansion_cap_refuses(spark, idx):
    from dhr_spark.operators.intervals import prefix

    s = Searcher(spark, idx)
    with pytest.raises(ValueError, match="expands to more than"):
        # single-char prefix over the whole dictionary blows any tiny cap
        s.search_intervals(prefix("s"), max_expansions=2)
