"""Physical index merge (index/merge.py) — Lucene addIndexes analogue.

merge(A, B) must be score-identical to one index built over A ∪ B for every
similarity and artifact: postings blobs are copied opaquely (never decoded),
only the term-id columns are rewritten, and all corpus statistics are
exactly additive. Also covers tombstone carry-over, post-merge appends, and
the validation contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.builder import build_index_from_docs
from dhr_spark.index.merge import merge_indexes
from dhr_spark.operators.docids import doc_map, with_docids
from dhr_spark.operators.wand import Searcher

CHUNK_BITS, BLOCK = 5, 8
CHUNK_DOCS = 1 << CHUNK_BITS
CUT = 2 * CHUNK_DOCS  # A gets chunks {0,1}, B everything above


def _build(spark, docs, d, **kw):
    return build_index_from_docs(
        spark,
        docs,
        d,
        chunk_bits=CHUNK_BITS,
        block_size=BLOCK,
        doc_map_df=doc_map(docs, ("role",)),
        forward_index=True,
        positional=True,
        stored=True,
        docvalues=("role",),
        **kw,
    )


@pytest.fixture(scope="module")
def corpus(spark):
    docs = with_docids(synth_transcripts(spark, 12, seed=7)).cache()
    n = docs.count()
    assert n > CUT + CHUNK_DOCS // 2, f"corpus too small ({n} turns)"
    return docs


@pytest.fixture(scope="module")
def env(spark, corpus, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    a = corpus.filter(F.col("docid") < CUT)
    b = corpus.filter(F.col("docid") >= CUT)
    da, db, full = (str(root / x) for x in ("a", "b", "full"))
    _build(spark, a, da)
    _build(spark, b, db)
    _build(spark, corpus, full)
    man = merge_indexes(spark, da, db)
    return dict(da=da, db=db, full=full, man=man)


@pytest.fixture(scope="module")
def queries(spark):
    return synth_queries(spark, n_queries=10)


def _res(df):
    return {(r["qid"], r["docid"]): round(r["score"], 6) for r in df.collect()}


def test_merged_equals_union_bm25(spark, env, queries):
    merged = _res(Searcher(spark, env["da"]).search(queries, k=1_000_000))
    full = _res(Searcher(spark, env["full"]).search(queries, k=1_000_000))
    assert merged == full and len(full) > 0


def test_merged_equals_union_qld(spark, env, queries):
    merged = _res(Searcher(spark, env["da"]).search_qld(queries, k=1_000_000))
    full = _res(Searcher(spark, env["full"]).search_qld(queries, k=1_000_000))
    assert merged == full and len(full) > 0


def test_merged_phrase_and_stored(spark, env, corpus):
    s_m = Searcher(spark, env["da"])
    s_f = Searcher(spark, env["full"])
    # a phrase guaranteed present: the first two analyzer-surviving tokens
    # of some doc — try head bigrams until the full index matches one
    texts = [r["text"] for r in corpus.orderBy("docid").limit(20).collect()]
    hit_full = None
    phrase = None
    for t in texts:
        words = t.split()
        if len(words) < 2:
            continue
        cand = " ".join(words[:2])
        got = s_f.search_phrase(cand).collect()
        if got:
            phrase, hit_full = cand, got
            break
    assert phrase is not None, "no matching bigram found in fixture corpus"
    m = {(r["docid"], r["n_matches"]) for r in s_m.search_phrase(phrase).collect()}
    f = {(r["docid"], r["n_matches"]) for r in hit_full}
    assert m == f and len(f) > 0
    # stored fields survive the merge for chunks from BOTH sides
    res = s_m.search(synth_queries(spark, n_queries=4), k=5)
    fetched = s_m.fetch_stored(res)
    truth = {r["docid"]: r["text"] for r in corpus.collect()}
    rows = fetched.select("docid", "text").distinct().collect()
    assert rows and all(truth[r["docid"]] == r["text"] for r in rows)


def test_merged_dictionary_and_stats(spark, env):
    man = env["man"]
    dm = spark.read.parquet(
        os.path.join(env["da"], man["term_dict_dir"])
    )
    df_full = spark.read.parquet(
        os.path.join(
            env["full"],
            Searcher(spark, env["full"]).manifest["term_dict_dir"],
        )
    )
    merged_stats = {
        r["term"]: (r["df"], r["ctf"]) for r in dm.collect()
    }
    full_stats = {
        r["term"]: (r["df"], r["ctf"]) for r in df_full.collect()
    }
    assert merged_stats == full_stats
    fman = Searcher(spark, env["full"]).manifest
    assert man["n_docs"] == fman["n_docs"]
    assert man["total_dl"] == fman["total_dl"]
    assert man["n_terms"] == fman["n_terms"]
    assert abs(man["avgdl"] - fman["avgdl"]) < 1e-12
    # term ids stay dense and unique after the remap
    assert dm.select("term_id").distinct().count() == man["n_terms"]
    assert dm.agg(F.max("term_id")).collect()[0][0] == man["n_terms"] - 1


def test_validation_contract(spark, corpus, env, tmp_path):
    # chunk sets overlap: B's chunks are already in the merged A
    with pytest.raises(ValueError, match="overlap"):
        merge_indexes(spark, env["da"], env["db"])
    # layout mismatch
    other = str(tmp_path / "cb6")
    build_index_from_docs(
        spark,
        corpus.filter(F.col("docid") >= CUT),
        other,
        chunk_bits=6,
        block_size=BLOCK,
    )
    with pytest.raises(ValueError, match="chunk_bits"):
        merge_indexes(spark, env["da"], other)
    # artifact mismatch (fresh dst without forward/positions/stored)
    bare = str(tmp_path / "bare")
    build_index_from_docs(
        spark,
        corpus.filter(F.col("docid") < CUT),
        bare,
        chunk_bits=CHUNK_BITS,
        block_size=BLOCK,
    )
    with pytest.raises(ValueError, match="forward_index"):
        merge_indexes(spark, bare, env["db"])


def test_merge_carries_exact_stats_deletes(spark, corpus, queries, tmp_path):
    from dhr_spark.index.delete import delete_docs

    a = corpus.filter(F.col("docid") < CUT)
    b = corpus.filter(F.col("docid") >= CUT)
    hi = corpus.agg(F.max("docid")).collect()[0][0]
    victims = [CUT + 1, int(hi)]
    da, db, full = (str(tmp_path / x) for x in ("a", "b", "full"))
    _build(spark, a, da)
    _build(spark, b, db)
    _build(spark, corpus, full)
    delete_docs(spark, db, docids=victims, exact_stats=True)
    delete_docs(spark, full, docids=victims, exact_stats=True)
    man = merge_indexes(spark, da, db)
    assert man["tombstones"] == len(victims)
    merged = _res(Searcher(spark, da).search(queries, k=1_000_000))
    fullr = _res(Searcher(spark, full).search(queries, k=1_000_000))
    assert merged == fullr and len(fullr) > 0
    assert not any(d in victims for (_, d) in merged)


def test_append_after_merge(spark, corpus, env, queries, tmp_path):
    from dhr_spark.index.incremental import append_docs_to_index

    man = env["man"]
    floor = -(-int(man["next_docid"]) // CHUNK_DOCS) * CHUNK_DOCS
    extra = (
        with_docids(synth_transcripts(spark, 3, seed=99))
        .withColumn("docid", F.col("docid") + F.lit(floor))
    )
    append_docs_to_index(spark, extra, env["da"])
    merged = _res(Searcher(spark, env["da"]).search(queries, k=1_000_000))
    refdir = str(tmp_path / "ref")
    _build(spark, corpus.unionByName(extra), refdir)
    ref = _res(Searcher(spark, refdir).search(queries, k=1_000_000))
    assert merged == ref and len(ref) > 0
