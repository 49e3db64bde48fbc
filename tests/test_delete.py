"""Explicit deletion (index/delete.py) — IndexWriter.deleteDocuments analogue.

Contracts pinned here:
  * exact-stats delete == fresh build over the corpus minus the deleted docs,
    score-for-score (the Lucene-better-than-Lucene mode);
  * mask-only delete never surfaces deleted docs on ANY result surface while
    leaving df/avgdl untouched (literal Lucene docFreq semantics);
  * idempotence: re-deleting the same set is a manifest no-op;
  * compaction purges delete tombstones without moving scores;
  * orphan tombstone partitions from a crashed op are invisible to readers
    and re-derived (overwritten) by the retry (builder.read_tombstones).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.builder import build_index, load_manifest
from dhr_spark.index.delete import delete_docs
from dhr_spark.operators.wand import Searcher

CHUNK_BITS = 6
BLOCK = 8


@pytest.fixture(scope="module")
def turns(spark):
    return synth_transcripts(spark, 40).cache()


@pytest.fixture(scope="module")
def queries(spark):
    return synth_queries(spark, 10).cache()


def _build(spark, src, d, **kw):
    kw.setdefault("chunk_bits", CHUNK_BITS)
    kw.setdefault("block_size", BLOCK)
    return build_index(spark, src, d, **kw)


def _victims(spark, d, n=7):
    dm = spark.read.parquet(f"{d}/doc_map")
    return [
        int(r["docid"])
        for r in dm.orderBy("docid").limit(n).collect()
    ]


def _ranked(spark, d, queries):
    res = Searcher(spark, d).search(queries, k=1_000_000)
    dm = spark.read.parquet(f"{d}/doc_map").select(
        "docid", "conv_id", "turn_idx"
    )
    return {
        (r["qid"], r["conv_id"], r["turn_idx"]): round(r["score"], 4)
        for r in res.join(dm, "docid").collect()
    }


def test_exact_delete_matches_rebuild(spark, turns, queries, tmp_path_factory):
    deld = str(tmp_path_factory.mktemp("del") / "d")
    full = str(tmp_path_factory.mktemp("del") / "f")
    _build(spark, turns, deld, forward_index=True)
    victims = _victims(spark, deld)
    man = delete_docs(spark, deld, docids=victims)
    assert man["tombstones"] == len(victims)
    assert man["last_delete"]["exact_stats"] is True

    dm = spark.read.parquet(f"{deld}/doc_map")
    dead_keys = dm.filter(F.col("docid").isin(victims)).select(
        "conv_id", "turn_idx"
    )
    kept = turns.join(dead_keys, ["conv_id", "turn_idx"], "left_anti")
    _build(spark, kept, full, forward_index=True)

    assert _ranked(spark, deld, queries) == _ranked(spark, full, queries)
    # manifest stats match the rebuild exactly
    ma, mb = load_manifest(deld), load_manifest(full)
    assert ma["n_docs"] == mb["n_docs"]
    assert ma["total_dl"] == mb["total_dl"]
    assert abs(ma["avgdl"] - mb["avgdl"]) < 1e-9


def test_delete_by_match_and_masked_surfaces(
    spark, turns, queries, tmp_path_factory
):
    d = str(tmp_path_factory.mktemp("del") / "m")
    docs_dm = synth_transcripts(spark, 25)
    _build(spark, docs_dm, d, forward_index=True, positional=True)
    dm = spark.read.parquet(f"{d}/doc_map")
    convs = [
        r["conv_id"]
        for r in dm.select("conv_id").distinct().orderBy("conv_id").limit(3).collect()
    ]
    dead = set(
        int(r["docid"])
        for r in dm.filter(F.col("conv_id").isin(convs)).collect()
    )
    delete_docs(spark, d, match=("conv_id", convs))
    s = Searcher(spark, d)
    hits = {int(r["docid"]) for r in s.search(queries, k=1_000_000).collect()}
    assert not (hits & dead)
    counted = {r["qid"]: r["n"] for r in s.count(queries).collect()}
    live_hits = (
        s.search(queries, k=1_000_000).groupBy("qid").count().collect()
    )
    assert counted == {r["qid"]: r["count"] for r in live_hits}
    ph = s.search_phrase("spark merge", slop=2)
    assert not {int(r["docid"]) for r in ph.collect()} & dead


def test_mask_only_keeps_stats(spark, turns, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("del") / "mo")
    _build(spark, turns, d)  # no forward index
    man0 = load_manifest(d)
    victims = _victims(spark, d, n=5)

    with pytest.raises(ValueError, match="forward index"):
        delete_docs(spark, d, docids=victims)  # exact needs forward

    man = delete_docs(spark, d, docids=victims, exact_stats=False)
    assert man["stale_stats"] is True
    assert man["n_docs"] == man0["n_docs"]  # Lucene docFreq drift
    assert man["avgdl"] == man0["avgdl"]
    assert man["term_dict_dir"] == man0.get("term_dict_dir", "term_dict")
    qs = synth_queries(spark, 6)
    hits = {
        int(r["docid"])
        for r in Searcher(spark, d).search(qs, k=1_000_000).collect()
    }
    assert not (hits & set(victims))


def test_delete_idempotent_and_unknown_ids(spark, turns, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("del") / "i")
    _build(spark, turns, d, forward_index=True)
    victims = _victims(spark, d, n=4)
    man1 = delete_docs(spark, d, docids=victims + [10_000_000])
    assert man1["tombstones"] == 4  # unknown id ignored
    man2 = delete_docs(spark, d, docids=victims)  # already dead -> no-op
    assert man2["tombstones"] == 4
    assert man2["appends"] == man1["appends"]
    assert load_manifest(d)["n_docs"] == man1["n_docs"]


def test_delete_argument_errors(spark, turns, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("del") / "e")
    _build(spark, turns, d, forward_index=True)
    with pytest.raises(ValueError, match="exactly one"):
        delete_docs(spark, d)
    with pytest.raises(ValueError, match="exactly one"):
        delete_docs(spark, d, docids=[1], match=("conv_id", ["c0"]))
    with pytest.raises(ValueError, match="no column"):
        delete_docs(spark, d, match=("nope", ["x"]))
    dm = spark.read.parquet(f"{d}/doc_map")
    every = [int(r["docid"]) for r in dm.select("docid").collect()]
    with pytest.raises(ValueError, match="every live document"):
        delete_docs(spark, d, docids=every)


def test_delete_then_compact_identity(spark, turns, queries, tmp_path_factory):
    from dhr_spark.index.compact import compact_index

    d = str(tmp_path_factory.mktemp("del") / "c")
    _build(spark, turns, d, forward_index=True)
    victims = _victims(spark, d, n=9)
    delete_docs(spark, d, docids=victims)
    before = _ranked(spark, d, queries)
    man = compact_index(
        spark, d, fill_threshold=1.1, min_chunks=1, max_chunks=64
    )
    assert man["tombstones"] == 0  # merge clears deletes
    assert _ranked(spark, d, queries) == before


def test_orphan_tombstone_partition_ignored(spark, turns, queries, tmp_path_factory):
    """A crashed delete leaves a tomb_batch partition with no manifest
    commit: readers must not mask those docids (their stats were never
    subtracted) and the retry must overwrite the orphan byte-for-byte."""
    d = str(tmp_path_factory.mktemp("del") / "o")
    _build(spark, turns, d, forward_index=True)
    ids = _victims(spark, d, n=4)
    victims, other = ids[:3], ids[3]
    # a committed delete first, so readers actually consult the tomb dir
    man1 = delete_docs(spark, d, docids=[other])
    orphan_batch = int(man1["appends"]) + 1
    # simulate the crash: tombstone partition written, no manifest commit
    spark.createDataFrame(
        [(int(v), orphan_batch) for v in victims],
        "docid long, tomb_batch int",
    ).write.mode("append").partitionBy("tomb_batch").parquet(
        os.path.join(d, "tombstones")
    )
    # the orphan docids must still be live (only `other` is dead)
    hits = {
        int(r["docid"])
        for r in Searcher(spark, d).search(queries, k=1_000_000).collect()
    }
    assert other not in hits
    assert set(victims) & hits, "orphan tombstones wrongly masked"
    # retry the crashed delete: must re-derive all 3, not skip them
    man2 = delete_docs(spark, d, docids=victims)
    assert man2["tombstones"] == man1["tombstones"] + 3
    hits2 = {
        int(r["docid"])
        for r in Searcher(spark, d).search(queries, k=1_000_000).collect()
    }
    assert not (set(victims) & hits2)


def test_delete_on_index_without_doc_map(spark, tmp_path):
    """Generic-corpus indexes (no doc_map_df at build) still support
    docid deletes — validation falls back to the forward index or, absent
    that, a doclens explode; match= deletion raises a clear error instead
    of silently matching nothing."""
    from dhr_spark.index.builder import build_index_from_docs

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i}") for i in range(20)],
        "docid long, text string",
    )
    d = str(tmp_path / "nodm")
    build_index_from_docs(
        spark, docs, d, analyzer_mode="simple",
        chunk_bits=CHUNK_BITS, block_size=BLOCK,
    )
    assert not os.path.isdir(os.path.join(d, "doc_map"))
    q = spark.createDataFrame([("q", "doc3")], "qid string, text string")
    assert {r["docid"] for r in Searcher(spark, d).search(q, k=5).collect()} == {3}
    man = delete_docs(spark, d, docids=[3, 9999], exact_stats=False)
    # the bogus id 9999 was dropped by the doclens validation
    assert man["tombstones"] == 1
    assert Searcher(spark, d).search(q, k=5).count() == 0
    with pytest.raises(ValueError, match="no doc_map"):
        delete_docs(spark, d, match=("role", ["tool"]), exact_stats=False)
