"""C4 line cleaning + Gopher quality flags (operators/curation.py).

Hand-computed expectations on crafted multi-line documents — the
sf-corpus entry oracles (curation_c4/gopher/pipeline) pin cross-engine
exactness, but the synthetic corpus has no terminal punctuation, so the
interesting rule branches (kept lines, bullets, ellipses, blocklists,
threshold boundaries) are pinned here."""

from __future__ import annotations

import pytest

from dhr_spark.operators.curation import (
    c4_line_stats,
    curation_pipeline,
    gopher_quality_flags,
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def _doc(spark, text, doc_id=1):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def test_c4_keeps_only_qualifying_lines(spark):
    text = (
        "This line has enough words and ends well.\n"
        "too short.\n"                                   # < 5 words
        "This line has no terminal punctuation at all\n"
        "  Trailing spaces still count as terminal here.   \n"
        "This line mentions JavaScript so it is dropped.\n"
        "Ends with a question mark and enough words?\n"
    )
    r = _one(c4_line_stats(_doc(spark, text)))
    assert r["n_lines"] == 6
    assert r["n_kept_lines"] == 3  # lines 1, 4 (trimmed), 6
    assert r["n_sentences"] == 3   # two '.', one '?'
    assert r["c4_keep"] is True


def test_c4_page_blocklist(spark):
    good = "One proper sentence with enough words here.\n" * 3
    assert _one(c4_line_stats(_doc(spark, good)))["c4_keep"] is True
    for poison, col in [
        (good + "Lorem Ipsum dolor.", "has_lorem"),
        (good + "var x = {",          "has_brace"),
    ]:
        r = _one(c4_line_stats(_doc(spark, poison)))
        assert r[col] is True and r["c4_keep"] is False


def test_c4_min_sentences(spark):
    # two kept lines, two sentences -> below the 3-sentence floor
    text = ("A complete sentence with enough words.\n"
            "Another complete sentence with enough words.")
    r = _one(c4_line_stats(_doc(spark, text)))
    assert r["n_sentences"] == 2 and r["c4_keep"] is False


def test_c4_extra_blocklist(spark):
    good = "One proper sentence with enough words here.\n" * 3
    r = _one(c4_line_stats(
        _doc(spark, good + " Enable COOKIES please."),
        extra_page_blocklist=("enable cookies",),
    ))
    assert r["c4_keep"] is False


GOOD_WORDS = ("alpha beta gamma delta epsilon zeta theta iota kappa mu "
              "the be to of and that have with " )  # 18 words, all alpha


def test_gopher_passes_well_shaped_doc(spark):
    text = (GOOD_WORDS * 3).strip()  # 54 words in [50, 100k]
    r = _one(gopher_quality_flags(_doc(spark, text)))
    assert r["n_words"] == 54
    assert r["n_stop_distinct"] == 8
    assert r["gopher_keep"] is True


@pytest.mark.parametrize(
    "mutate,flag",
    [
        (lambda t: "word " * 49, "f_word_count"),            # 49 < 50
        (lambda t: "aa " * 60, "f_mean_word_len"),           # mean 2 < 3
        (lambda t: t + " " + "#" * 5, None),                 # see below
        (lambda t: t.replace("alpha", "####"), "f_symbol_ratio"),
        (lambda t: "\n".join("- " + ln for ln in [t] * 3), "f_bullet_lines"),
        (lambda t: "\n".join(ln + "..." for ln in [t] * 2), "f_ellipsis_lines"),
        (lambda t: t + " " + "123 " * 20, "f_alpha_words"),
        (lambda t: t.replace("the ", "xx ").replace("be ", "xx ")
                    .replace("to ", "xx ").replace("of ", "xx ")
                    .replace("and ", "xx ").replace("that ", "xx ")
                    .replace("have ", "xx "), "f_stop_words"),
    ],
)
def test_gopher_individual_rules_trip(spark, mutate, flag):
    base = (GOOD_WORDS * 3).strip()
    text = mutate(base)
    r = _one(gopher_quality_flags(_doc(spark, text)))
    if flag is None:  # 5 '#' over 55 words: 10*5 <= 55 still passes
        assert r["f_symbol_ratio"] is True
        return
    assert r[flag] is False, (flag, r)
    assert r["gopher_keep"] is False


def test_gopher_symbol_counts(spark):
    r = _one(gopher_quality_flags(_doc(spark, "a ... b … c # d ....")))
    # '...' x1 in the first ellipsis, '…' x1, '#' x1, '....' counts one
    # non-overlapping '...' (leftmost) -> 4 symbols total
    assert r["n_symbols"] == 4


def test_pipeline_composition(spark):
    good = ("A complete sentence with enough good words here.\n" * 3
            + (GOOD_WORDS * 3).strip() + ".")
    rows = spark.createDataFrame(
        [(1, good), (2, good), (3, "junk")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in curation_pipeline(rows).collect()}
    assert got[1]["keep"] is True and got[1]["is_exact_dup"] is False
    # doc 2 is an exact dup of 1: same rule flags, dup-dropped
    assert got[2]["c4_keep"] is True and got[2]["gopher_keep"] is True
    assert got[2]["is_exact_dup"] is True and got[2]["keep"] is False
    assert got[3]["keep"] is False
    assert all(r["split"] in ("train", "holdout") for r in got.values())


def test_pipeline_split_matches_hash_split(spark):
    from dhr_spark.operators.textstats import hash_split

    rows = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    pipe = {r["doc_id"]: r["split"]
            for r in curation_pipeline(rows, holdout_pct=10).collect()}
    ref = {r["doc_id"]: r["bucket"]
           for r in hash_split(rows).collect()}
    for did, split in pipe.items():
        assert (split == "holdout") == (ref[did] < 10)
