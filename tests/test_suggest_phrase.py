"""Bigram artifact (index/shingles.py) + phrase suggester
(Searcher.suggest_phrase — ES suggest.phrase / "did you mean").

Contracts: index-derived bigrams equal a corpus-scan recount (simple
chain) and honor lucene position gaps; readers refuse a stale table;
stupid-backoff scores are hand-verified exact rationals through the
float(num)/float(den) contract; the verbatim input is never suggested."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_transcripts
from dhr_spark.index.builder import build_index, build_index_from_docs
from dhr_spark.index.shingles import (
    bigram_counts_scan,
    build_bigram_index,
    read_bigrams,
)
from dhr_spark.operators.wand import Searcher

CB, BS = 6, 16


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "docid long, text string"
    )


@pytest.fixture()
def lm_idx(spark, tmp_path):
    """Tiny corpus with hand-countable bigram mass."""
    docs = _docs(spark, ["hash join table", "hash join index",
                         "merge join table"])
    d = str(tmp_path / "lm")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple", chunk_bits=CB,
        block_size=BS, positional=True,
    )
    build_bigram_index(spark, d)
    return d, docs


def test_bigrams_equal_corpus_scan(spark, lm_idx):
    d, docs = lm_idx
    td = spark.read.parquet(f"{d}/term_dict").select("term", "term_id")
    got = {
        (r["a"], r["b"]): r["n"]
        for r in read_bigrams(spark, d, Searcher(spark, d).manifest)
        .join(td.select(F.col("term_id").alias("t1"),
                        F.col("term").alias("a")), "t1")
        .join(td.select(F.col("term_id").alias("t2"),
                        F.col("term").alias("b")), "t2")
        .collect()
    }
    want = {
        (r["t1"], r["t2"]): r["n"]
        for r in bigram_counts_scan(docs).collect()
    }
    assert got == want
    assert want[("hash", "join")] == 2 and want[("join", "table")] == 2


def test_bigrams_honor_lucene_gaps(spark, tmp_path):
    """A stopword consumes a position: 'data the table' contributes NO
    (data, table) bigram under the lucene chain."""
    docs = _docs(spark, ["data the table", "data table twice data table"])
    d = str(tmp_path / "gap")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="lucene", chunk_bits=CB,
        block_size=BS, positional=True,
    )
    build_bigram_index(spark, d)
    s = Searcher(spark, d)
    td = spark.read.parquet(f"{d}/term_dict").select("term", "term_id")
    ids = {r["term"]: int(r["term_id"]) for r in td.collect()}
    got = {
        (int(r["t1"]), int(r["t2"])): int(r["n"])
        for r in read_bigrams(spark, d, s.manifest).collect()
    }
    assert got.get((ids["data"], ids["tabl"])) == 2  # doc 1 only (stemmed)


def test_bigrams_staleness_guard(spark, tmp_path):
    from dhr_spark.index.incremental import append_to_index

    tr = synth_transcripts(spark, 6, seed=7)
    d = str(tmp_path / "stale")
    build_index(spark, tr, d, chunk_bits=7, block_size=BS, positional=True)
    man = build_bigram_index(spark, d)
    assert man["bigrams"]["n_docs"] == man["n_docs"]
    # fresh rebuild is a no-op (same committed record)
    assert build_bigram_index(spark, d)["bigrams"] == man["bigrams"]
    extra = synth_transcripts(spark, 3, seed=8).withColumn(
        "conv_id", F.concat(F.lit("x"), F.col("conv_id"))
    )
    append_to_index(spark, extra, d)
    s = Searcher(spark, d)
    with pytest.raises(ValueError, match="stale"):
        read_bigrams(spark, d, s.manifest)
    with pytest.raises(ValueError, match="stale"):
        s.suggest_phrase(["hash join"])
    build_bigram_index(spark, d)
    read_bigrams(spark, d, Searcher(spark, d).manifest)  # fresh again


def test_suggest_phrase_hand_scores(spark, lm_idx):
    d, _ = lm_idx
    s = Searcher(spark, d)
    # corpus: T=9; ctf hash=2 join=3 table=2 index=1 merge=1
    # bigrams (hash,join)=2 (join,table)=2 (join,index)=1 (merge,join)=1
    got = s.suggest_phrase(["hash joi table"]).collect()
    assert got[0]["suggestion"] == "hash join table"
    assert got[0]["rank"] == 1
    # 2/9 * 2/2 * 2/3 = 8/54, through the float(num)/float(den) contract
    assert got[0]["score"] == float(8) / float(54)
    # backoff transition: (index, table) bigram absent
    got2 = s.suggest_phrase(["index tble"]).collect()
    assert got2[0]["suggestion"] == "index table"
    assert got2[0]["score"] == float(1 * 2 * 2) / float(9 * 5 * 9)


def test_suggest_phrase_ranking_and_input_exclusion(spark, tmp_path):
    docs = _docs(spark, ["big cat", "big car", "big cat"])
    d = str(tmp_path / "rank")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple", chunk_bits=CB,
        block_size=BS, positional=True,
    )
    build_bigram_index(spark, d)
    s = Searcher(spark, d)
    got = s.suggest_phrase(["big caq"], max_per_term=3).collect()
    # T=6, ctf big=3 cat=2 car=1; bg (big,cat)=2 (big,car)=1
    assert [(r["suggestion"], r["rank"]) for r in got] == [
        ("big cat", 1), ("big car", 2),
    ]
    assert got[0]["score"] == float(3 * 2) / float(6 * 3)
    # the verbatim input is a correction target, never an echo
    got2 = s.suggest_phrase(["big cat"], max_per_term=3).collect()
    assert all(r["suggestion"] != "big cat" for r in got2)
    assert [r["suggestion"] for r in got2] == ["big car"]


def test_suggest_phrase_kgram_identity(spark, lm_idx):
    """With a k-gram table committed the suggester's candidate scan takes
    the gram cut (_fuzzy_candidate_rows); results stay bit-identical to
    the plain |V| levenshtein join. Inputs cover both branches: 'tble'
    yields a usable gram bound, 'joi' is vacuous (3 grams - 3*1 edits < 1)
    and falls back to the dictionary scan."""
    from dhr_spark.index.kgram import build_kgram_index

    d, _ = lm_idx
    texts = ["hash joi table", "index tble", "merge joi tble"]
    plain = Searcher(spark, d).suggest_phrase(texts, max_per_term=3).collect()
    build_kgram_index(spark, d)
    s = Searcher(spark, d)
    assert s.manifest.get("kgram")
    accel = s.suggest_phrase(texts, max_per_term=3).collect()
    assert sorted(map(tuple, accel)) == sorted(map(tuple, plain))
    assert plain  # non-vacuous comparison


def test_suggest_phrase_guards(spark, lm_idx, tmp_path):
    d, _ = lm_idx
    s = Searcher(spark, d)
    # uncorrectable slot -> no suggestions for that input, others fine
    got = s.suggest_phrase(["zzzzqqqq table", "hash joi table"])
    assert {r["input"] for r in got.collect()} == {"hash joi table"}
    # empty/unanalyzable inputs are skipped
    assert s.suggest_phrase(["!!!"]).count() == 0
    with pytest.raises(ValueError, match="up to 6 terms"):
        s.suggest_phrase(["a b c d e f g"])
    with pytest.raises(ValueError, match="max_per_term"):
        s.suggest_phrase(["hash join"], max_per_term=0)
    # no bigram artifact -> actionable error
    d2 = str(tmp_path / "nobg")
    build_index_from_docs(
        spark, _docs(spark, ["hash join"]), d2, analyzer_mode="simple",
        chunk_bits=CB, block_size=BS, positional=True,
    )
    with pytest.raises(ValueError, match="bigram"):
        Searcher(spark, d2).suggest_phrase(["hash joi"])


def test_bigram_refresh_is_incremental_and_exact(spark, tmp_path):
    """After a turn-level append the refresh folds ONLY the new docs (a
    new bg_batch partition; old partitions untouched) and the summed
    relation equals a from-scratch rebuild; a delete forces the rebuild
    path (tombstone change invalidates per-doc mass)."""
    import os as _os

    from dhr_spark.index.builder import load_manifest
    from dhr_spark.index.incremental import append_to_index

    tr = synth_transcripts(spark, 8, seed=21)
    d = str(tmp_path / "inc")
    build_index(spark, tr, d, chunk_bits=7, block_size=BS, positional=True)
    build_bigram_index(spark, d)
    extra = synth_transcripts(spark, 4, seed=22).withColumn(
        "conv_id", F.concat(F.lit("n"), F.col("conv_id"))
    )
    append_to_index(spark, extra, d)
    man = build_bigram_index(spark, d)
    assert man["bigrams"]["batches"] == 2  # delta fold, not a rebuild
    batches = {
        p for p in _os.listdir(_os.path.join(d, "bigrams"))
        if p.startswith("bg_batch=")
    }
    assert batches == {"bg_batch=0", "bg_batch=1"}
    folded = {
        (r["t1"], r["t2"]): r["n"]
        for r in read_bigrams(spark, d, load_manifest(d)).collect()
    }
    # from-scratch reference over the union corpus
    ref_dir = str(tmp_path / "ref")
    build_index(
        spark, tr.unionByName(extra), ref_dir, chunk_bits=7,
        block_size=BS, positional=True,
    )
    build_bigram_index(spark, ref_dir)
    ref_td = spark.read.parquet(
        f"{ref_dir}/{load_manifest(ref_dir).get('term_dict_dir', 'term_dict')}"
    ).select("term", F.col("term_id").alias("ref_id"))
    inc_td = spark.read.parquet(
        f"{d}/{load_manifest(d).get('term_dict_dir', 'term_dict')}"
    ).select("term", "term_id")
    remap = {
        int(r["term_id"]): int(r["ref_id"])
        for r in inc_td.join(ref_td, "term").collect()
    }
    ref = {
        (r["t1"], r["t2"]): r["n"]
        for r in read_bigrams(spark, ref_dir, load_manifest(ref_dir))
        .collect()
    }
    assert {
        (remap[a], remap[b]): n for (a, b), n in folded.items()
    } == ref
    # a delete invalidates per-doc mass -> next refresh REBUILDS (batch 0)
    from dhr_spark.index.delete import delete_docs

    delete_docs(spark, d, docids=[0], exact_stats=False)
    man2 = build_bigram_index(spark, d)
    assert man2["bigrams"]["batches"] == 1
    read_bigrams(spark, d, load_manifest(d))  # fresh again
