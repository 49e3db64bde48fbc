"""Chunk compaction (index/compact.py): score-identity vs pre-compaction
AND vs a from-scratch rebuild, chunk-count shrinkage, sidecar (positions /
forward / doc_map) consistency, tombstone clearing on conversation-level
indexes, crash-and-retry idempotence, and GC hygiene."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.builder import build_index, load_manifest
from dhr_spark.index.compact import compact_index, gc_index
from dhr_spark.index.incremental import append_to_index
from dhr_spark.operators.wand import Searcher, search_wand

CHUNK_BITS, BLOCK = 7, 16


def _batch(spark, n, seed, prefix):
    return synth_transcripts(spark, n, seed=seed).withColumn(
        "conv_id", F.concat(F.lit(prefix), F.col("conv_id"))
    )


def _results(spark, idx, queries, k=100_000):
    """{(qid, conv_id, turn_idx): round4 score} — docid-independent view."""
    res = search_wand(spark, idx, queries, k=k)
    dm = spark.read.parquet(os.path.join(idx, "doc_map"))
    out = res.join(dm, "docid").select(
        "qid", "conv_id", "turn_idx", F.round("score", 4).alias("s")
    )
    return {(r["qid"], r["conv_id"], r["turn_idx"]): r["s"] for r in out.collect()}


@pytest.fixture(scope="module")
def appended_index(spark, tmp_path_factory):
    """Base build + three small appends (each lands in its own underfull
    chunk tail) with positions + forward sidecars — the shape compaction
    exists for."""
    idx = str(tmp_path_factory.mktemp("cmp") / "idx")
    base = _batch(spark, 30, 42, "a-")
    build_index(
        spark, base, idx, chunk_bits=CHUNK_BITS, block_size=BLOCK,
        positional=True, forward_index=True,
    )
    for n, seed, pfx in ((6, 91, "b-"), (5, 77, "c-"), (4, 55, "d-")):
        append_to_index(spark, _batch(spark, n, seed, pfx), idx)
    return idx


@pytest.fixture(scope="module")
def queries(spark):
    return synth_queries(spark, n_queries=12)


def test_compaction_identity_and_shrink(spark, appended_index, queries, tmp_path_factory):
    idx = appended_index
    man0 = load_manifest(idx)
    before = _results(spark, idx, queries)

    man1 = compact_index(spark, idx, fill_threshold=0.9)

    assert man1["compactions"] == 1
    assert len(man1["chunks"]) < len(man0["chunks"])
    assert "pending_gc" not in man1  # default gc=True finished
    # stats are untouched — compaction moves postings, never rescores
    for k in ("n_docs", "total_dl", "avgdl", "n_terms"):
        assert man1[k] == man0[k]
    assert _results(spark, idx, queries) == before

    # and identical to a from-scratch rebuild over the union corpus
    full = str(tmp_path_factory.mktemp("cmpfull") / "idx")
    union = (
        _batch(spark, 30, 42, "a-")
        .unionByName(_batch(spark, 6, 91, "b-"))
        .unionByName(_batch(spark, 5, 77, "c-"))
        .unionByName(_batch(spark, 4, 55, "d-"))
    )
    build_index(spark, union, full, chunk_bits=CHUNK_BITS, block_size=BLOCK)
    assert _results(spark, full, queries) == before


def test_compaction_sidecars_follow(spark, appended_index, queries):
    """Phrase (positions) and RM3 (forward) answers survive the remap."""
    idx = appended_index  # already compacted by the previous test
    man = load_manifest(idx)
    assert man.get("compactions", 0) >= 1
    s = Searcher(spark, idx)

    # positions: every (docid, term_id) row's docid resolves in doc_map
    dm = spark.read.parquet(os.path.join(idx, "doc_map")).select("docid")
    pos = spark.read.parquet(os.path.join(idx, "positions")).select("docid")
    assert pos.join(dm, "docid", "left_anti").count() == 0
    fwd = spark.read.parquet(os.path.join(idx, "forward")).select("docid")
    assert fwd.join(dm, "docid", "left_anti").count() == 0

    # doc_map GC removed every stale row: one row per live doc
    n_map = spark.read.parquet(os.path.join(idx, "doc_map")).count()
    assert n_map == man["n_docs"]

    # a phrase query runs end-to-end on the compacted positions artifact
    # ("data query": two head vocabulary words — reliably present)
    hits = s.search_phrase("data query")
    assert hits.join(dm, hits["docid"] == dm["docid"], "left_anti").count() == 0


def test_compaction_noop_when_dense(spark, tmp_path, queries):
    idx = str(tmp_path / "idx")
    build_index(
        spark, _batch(spark, 30, 42, "a-"), idx,
        chunk_bits=CHUNK_BITS, block_size=BLOCK,
    )
    man0 = load_manifest(idx)
    # base builds pack densely: only the boundary tail chunk is underfull,
    # and a single candidate is below min_chunks
    man1 = compact_index(spark, idx, fill_threshold=0.5)
    assert man1.get("compactions", 0) == man0.get("compactions", 0) == 0
    assert man1["chunks"].keys() == man0["chunks"].keys()


def test_compaction_crash_retry(spark, tmp_path, queries):
    """Crash after all data writes but before the manifest commit: the old
    manifest still serves identically; the retried compaction converges."""
    idx = str(tmp_path / "idx")
    build_index(spark, _batch(spark, 20, 42, "a-"), idx,
                chunk_bits=CHUNK_BITS, block_size=BLOCK)
    for n, seed, pfx in ((5, 91, "b-"), (4, 77, "c-")):
        append_to_index(spark, _batch(spark, n, seed, pfx), idx)
    ref = _results(spark, idx, queries)
    man_before = json.load(open(os.path.join(idx, "manifest.json")))

    compact_index(spark, idx, fill_threshold=0.9, gc=False)
    # rewind the manifest = crash before commit; stale + new chunks coexist
    with open(os.path.join(idx, "manifest.json"), "w") as f:
        json.dump(man_before, f)
    assert _results(spark, idx, queries) == ref  # old manifest unaffected

    man = compact_index(spark, idx, fill_threshold=0.9)  # retry, with GC
    assert man["compactions"] == 1 and "pending_gc" not in man
    assert _results(spark, idx, queries) == ref
    dm = spark.read.parquet(os.path.join(idx, "doc_map"))
    assert dm.count() == dm.select("docid").distinct().count()


def test_compaction_gc_deferred_then_healed(spark, tmp_path, queries):
    idx = str(tmp_path / "idx")
    build_index(spark, _batch(spark, 20, 42, "a-"), idx,
                chunk_bits=CHUNK_BITS, block_size=BLOCK)
    append_to_index(spark, _batch(spark, 5, 91, "b-"), idx)
    append_to_index(spark, _batch(spark, 4, 77, "c-"), idx)
    ref = _results(spark, idx, queries)

    man = compact_index(spark, idx, fill_threshold=0.9, gc=False)
    assert man["pending_gc"]["chunks"]
    # committed manifest already serves the compacted layout, pre-GC
    assert _results(spark, idx, queries) == ref

    man2 = gc_index(spark, idx)
    assert "pending_gc" not in man2
    # dropped chunk partition dirs are gone
    for c in man["pending_gc"]["chunks"]:
        assert not os.path.isdir(os.path.join(idx, "segments", f"chunk={c}"))
    assert _results(spark, idx, queries) == ref
    assert gc_index(spark, idx) == man2  # idempotent no-op


def test_append_after_compaction(spark, tmp_path, queries):
    """The compacted index keeps its O(batch) append contract."""
    idx = str(tmp_path / "idx")
    build_index(spark, _batch(spark, 20, 42, "a-"), idx,
                chunk_bits=CHUNK_BITS, block_size=BLOCK)
    append_to_index(spark, _batch(spark, 5, 91, "b-"), idx)
    compact_index(spark, idx, fill_threshold=0.9)
    append_to_index(spark, _batch(spark, 4, 77, "c-"), idx)

    full = str(tmp_path / "full")
    union = (
        _batch(spark, 20, 42, "a-")
        .unionByName(_batch(spark, 5, 91, "b-"))
        .unionByName(_batch(spark, 4, 77, "c-"))
    )
    build_index(spark, union, full, chunk_bits=CHUNK_BITS, block_size=BLOCK)
    assert _results(spark, idx, queries) == _results(spark, full, queries)


def test_conv_compaction_clears_tombstones(spark, tmp_path, queries):
    """Conversation-granularity: compaction drops tombstoned docs from the
    rewritten chunks and shrinks the tombstone set — Lucene's 'merge clears
    deletes' — while the per-conv ranking stays identical."""
    from dhr_spark.index.conv import append_conversations, build_conv_index

    base = _batch(spark, 25, 42, "a-")
    # extend 5 existing conversations (forces tombstones) + 3 new convs
    convs = [r["conv_id"] for r in
             base.select("conv_id").distinct().limit(5).collect()]
    ext = base.filter(F.col("conv_id").isin(convs)).groupBy("conv_id").agg(
        F.max("turn_idx").alias("mx")
    ).select(
        "conv_id", (F.col("mx") + 1).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("fresh extension about spark merge "),
                 F.col("conv_id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    batch = ext.unionByName(_batch(spark, 3, 77, "n-"))
    union = base.unionByName(batch)

    idx = str(tmp_path / "idx")
    build_conv_index(spark, base, idx, chunk_bits=6, block_size=8)
    append_conversations(spark, batch, union, idx)
    man0 = load_manifest(idx)
    assert man0["tombstones"] > 0

    def ranked(d):
        res = Searcher(spark, d).search(queries, k=10)
        dm = spark.read.parquet(f"{d}/doc_map").select("docid", "conv_id")
        return {
            (r["qid"], r["conv_id"]): (r["rank"], round(r["score"], 4))
            for r in res.join(dm, "docid").collect()
        }

    ref = ranked(idx)
    man1 = compact_index(spark, idx, fill_threshold=0.95)
    assert man1["compactions"] == 1
    assert man1["tombstones"] < man0["tombstones"]
    assert man1["last_compaction"]["tombstones_cleared"] > 0
    assert ranked(idx) == ref

    # live stats survive exactly (they were exact before; compaction must
    # not move them)
    for k in ("n_docs", "total_dl", "n_terms"):
        assert man1[k] == man0[k]

    # a FURTHER conversation append on the compacted index still matches a
    # full rebuild — versioned tombstone dir + doc_map hygiene hold
    convs2 = [r["conv_id"] for r in
              union.select("conv_id").distinct().limit(3).collect()]
    ext2 = union.filter(F.col("conv_id").isin(convs2)).groupBy("conv_id").agg(
        F.max("turn_idx").alias("mx")
    ).select(
        "conv_id", (F.col("mx") + 1).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("second wave extension "), F.col("conv_id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    union2 = union.unionByName(ext2)
    append_conversations(spark, ext2, union2, idx)

    full = str(tmp_path / "full")
    build_conv_index(spark, union2, full, chunk_bits=6, block_size=8)
    assert ranked(idx) == ranked(full)


def test_refresh_loop_with_auto_compaction(spark, tmp_path, queries):
    """Streaming refresh loop with compact_fill: repeated small folds stay
    score-identical to a full rebuild AND the chunk tail stays bounded."""
    from dhr_spark.streaming.ingest import refresh_index, stage_batch

    stg = str(tmp_path / "stg")
    idx = str(tmp_path / "idx")
    batches = [
        _batch(spark, 20, 42, "a-"),
        _batch(spark, 4, 91, "b-"),
        _batch(spark, 3, 77, "c-"),
        _batch(spark, 3, 55, "d-"),
    ]
    stage_batch(batches[0], 0, stg)
    refresh_index(spark, stg, idx, chunk_bits=CHUNK_BITS, block_size=BLOCK)
    for i, b in enumerate(batches[1:], start=1):
        stage_batch(b, i, stg)
        man = refresh_index(
            spark, stg, idx, chunk_bits=CHUNK_BITS, block_size=BLOCK,
            compact_fill=0.9,
        )
    assert man["compactions"] >= 1
    # the merged tail: at most one underfull chunk tail survives each merge
    # wave, instead of one per append
    full = str(tmp_path / "full")
    union = batches[0]
    for b in batches[1:]:
        union = union.unionByName(b)
    build_index(spark, union, full, chunk_bits=CHUNK_BITS, block_size=BLOCK)
    assert _results(spark, idx, queries) == _results(spark, full, queries)
    assert len(man["chunks"]) <= len(load_manifest(full)["chunks"]) + 2


def test_compaction_sidecar_numbering_consistency(spark, tmp_path):
    """Regression: the doclens overwrite used to invalidate the cached
    remap numbering by path (its lineage reads doclens/), and Spark
    silently recomputed it with a fresh range-partitioner sample — so
    positions/forward/stored/doc_map, written after that point, carried a
    DIFFERENT old->new docid mapping than segments/doclens (measured ~90%
    of docids renumbered: stored text detached from doc_map keys, and
    docid collisions appeared in both). Reproduces deterministically at
    this shape (auto chunk geometry, one large append, stored + docvalues
    sidecars); fixed by checkpoint-backing with_global_ids and re-reading
    the committed remap parquet for every artifact rewrite."""
    tr = synth_transcripts(spark, 400).cache()
    tr.count()
    cid = F.abs(F.hash("conv_id"))
    idx = str(tmp_path / "idx")
    build_index(
        spark, tr.filter(cid % 16 < 13), idx,
        forward_index=True, stored=True, docvalues=["role", "ts"],
    )
    append_to_index(spark, tr.filter(cid % 16 >= 13), idx)
    man = compact_index(spark, idx, fill_threshold=0.97)
    assert man.get("compactions", 0) >= 1

    dm = spark.read.parquet(os.path.join(idx, "doc_map"))
    st = spark.read.parquet(os.path.join(idx, "stored"))
    # one row per live doc, no docid collisions in either sidecar
    assert dm.count() == man["n_docs"]
    assert dm.groupBy("docid").count().filter("count > 1").count() == 0
    assert st.groupBy("docid").count().filter("count > 1").count() == 0
    # every docid's stored text is the corpus text of its doc_map key.
    # Docs whose text analyzes to ZERO tokens (stopword-only) are counted
    # in n_docs/doc_map but have no postings/doclens/stored rows — the
    # only legal doc_map rows without a stored twin.
    joined = dm.join(st, "docid").join(
        tr.select(
            "conv_id", "turn_idx", F.col("text").alias("corpus_text")
        ),
        ["conv_id", "turn_idx"],
    )
    assert joined.count() == st.count()
    assert joined.filter(F.col("text") != F.col("corpus_text")).count() == 0
    from dhr_spark.functions.analyzer import analyze_lucene

    ghosts = (
        dm.join(st, "docid", "left_anti")
        .join(tr, ["conv_id", "turn_idx"])
        .select("text")
        .collect()
    )
    assert all(not analyze_lucene(r["text"]) for r in ghosts)
    # forward sidecar agrees with the postings on per-doc lengths
    from dhr_spark.index.compact import decode_doclens

    dl = decode_doclens(
        spark.read.parquet(os.path.join(idx, "doclens")).filter(
            F.col("chunk").isin([int(c) for c in man["chunks"]])
        )
    )
    fwd_dl = (
        spark.read.parquet(os.path.join(idx, "forward"))
        .groupBy("docid").agg(F.sum("tf").alias("fdl"))
    )
    bad = (
        dl.join(fwd_dl, "docid")
        .filter(F.col("dl") != F.col("fdl")).count()
    )
    assert bad == 0
    # analyzed-empty docs must ride the remap (fresh docids, dl=0 slots):
    # stranding them on dropped chunks would break the checker's
    # doclens-header-vs-doc_map count invariant
    from dhr_spark.index.check import check_index

    chk = check_index(spark, idx)
    assert chk["ok"], chk["problems"]
    tr.unpersist()
