"""Index build + block-max WAND fast path: rank-identity vs the DataFrame
slow path (SURVEY.md M4/M5), manifest metrics, and kill-and-resume.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.builder import build_index, load_manifest
from dhr_spark.operators.docids import with_docids
from dhr_spark.operators.postings import postings_flat
from dhr_spark.operators.stats import corpus_stats, term_dictionary, term_stats
from dhr_spark.operators.termfreq import (
    doc_lengths,
    query_term_freqs,
    term_freqs,
    with_tokens,
)
from dhr_spark.operators.topk import search_slow_path
from dhr_spark.operators.wand import search_wand

N_CONVS = 40
CHUNK_BITS = 6  # 64 docs/chunk -> several chunks at this scale
BLOCK = 8  # small blocks -> pruning paths exercised


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("index") / "idx")
    tr = synth_transcripts(spark, N_CONVS)
    manifest = build_index(
        spark, tr, idx, chunk_bits=CHUNK_BITS, block_size=BLOCK,
        docid_strategy="window",
    )
    queries = synth_queries(spark, 20).cache()
    return dict(idx=idx, manifest=manifest, tr=tr, queries=queries)


def _slow_topk(spark, tr, queries, k):
    docs = with_docids(tr, "window")
    tok = with_tokens(docs, mode="lucene")
    tfs, dls = term_freqs(tok), doc_lengths(tok)
    cs = corpus_stats(dls).collect()[0]
    tdict = term_dictionary(term_stats(tfs, cs["n_docs"]))
    postings = postings_flat(tfs, dls, tdict, cs["avgdl"])
    qtok = with_tokens(queries, mode="lucene")
    qtfs = query_term_freqs(qtok.select("qid", "tokens")).join(
        tdict.select("term", "term_id"), "term"
    )
    return search_slow_path(qtfs, postings, k=k)


def _as_map(rows):
    m = {}
    for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
        m.setdefault(r["qid"], []).append((r["docid"], r["rank"], r["score"]))
    return m


def test_manifest_metrics(built):
    m = built["manifest"]
    assert m["n_docs"] > 0 and m["n_terms"] > 0 and m["avgdl"] > 0
    assert len(m["chunks"]) >= 2
    for c in m["chunks"].values():
        assert c["postings"] > 0 and c["bytes"] > 0 and c["skew_ratio"] >= 1.0


@pytest.fixture(scope="module")
def slow50(spark, built):
    """Slow-path top-50 computed once; smaller k is a prefix slice."""
    return _as_map(_slow_topk(spark, built["tr"], built["queries"], 50).collect())


@pytest.mark.parametrize("k", [5, 50])
def test_wand_matches_slow_path(spark, built, slow50, k):
    slow = {qid: rows[:k] for qid, rows in slow50.items()}
    fast = _as_map(search_wand(spark, built["idx"], built["queries"], k=k).collect())
    assert set(slow) == set(fast)
    for qid in slow:
        assert [x[0] for x in slow[qid]] == [x[0] for x in fast[qid]], qid
        for (d1, r1, s1), (d2, r2, s2) in zip(slow[qid], fast[qid]):
            assert r1 == r2 and abs(s1 - s2) <= 1e-6


def test_prune_equals_noprune(spark, built):
    a = _as_map(search_wand(spark, built["idx"], built["queries"], k=10,
                            prune=True).collect())
    b = _as_map(search_wand(spark, built["idx"], built["queries"], k=10,
                            prune=False).collect())
    assert a == b


def test_resume_produces_identical_index(spark, built, tmp_path):
    """Kill-and-resume: build half the chunks, write manifest, resume; the
    final segment set must equal a clean full build's."""
    import json
    import os

    tr = built["tr"]
    full_dir = str(tmp_path / "full")
    part_dir = str(tmp_path / "part")
    build_index(spark, tr, full_dir, chunk_bits=CHUNK_BITS, block_size=BLOCK,
                docid_strategy="window")

    # simulate a killed build: run a full build, then delete half the chunk
    # partitions and drop them from the manifest
    build_index(spark, tr, part_dir, chunk_bits=CHUNK_BITS, block_size=BLOCK,
                docid_strategy="window")
    man = load_manifest(part_dir)
    chunks = sorted(man["chunks"], key=int)
    lost = chunks[len(chunks) // 2 :]
    for c in lost:
        for sub in ("segments", "doclens"):
            p = os.path.join(part_dir, sub, f"chunk={c}")
            if os.path.exists(p):
                import shutil

                shutil.rmtree(p)
    man["chunks"] = {c: v for c, v in man["chunks"].items() if c not in lost}
    with open(os.path.join(part_dir, "manifest.json"), "w") as f:
        json.dump(man, f)

    m2 = build_index(spark, tr, part_dir, chunk_bits=CHUNK_BITS, block_size=BLOCK,
                     docid_strategy="window", resume=True)
    assert sorted(m2["resumed_from"], key=int) == sorted(man["chunks"], key=int)

    cols = ["chunk", "term_id", "n", "block_max_tf", "block_min_dl"]
    a = spark.read.parquet(f"{full_dir}/segments").select(cols)
    b = spark.read.parquet(f"{part_dir}/segments").select(cols)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # and the resumed index answers queries identically
    fa = _as_map(search_wand(spark, full_dir, built["queries"], k=10).collect())
    fb = _as_map(search_wand(spark, part_dir, built["queries"], k=10).collect())
    assert fa == fb


def test_build_empty_corpus_raises(spark, tmp_path):
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
    )
    from dhr_spark.index.builder import build_index

    with pytest.raises(ValueError, match="empty corpus"):
        build_index(spark, empty, str(tmp_path / "idx"), chunk_bits=7,
                    block_size=16)


def test_build_zero_term_corpus_raises(spark, tmp_path):
    """All-stopword/empty texts analyze to zero terms — the build must
    refuse with a clear message, not crash in docid/dictionary plumbing."""
    stop_only = spark.createDataFrame(
        [("c1", 0, "user", "the and of to", None, None),
         ("c1", 1, "asst", "", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    from dhr_spark.index.builder import build_index

    with pytest.raises(ValueError, match="zero index terms"):
        build_index(spark, stop_only, str(tmp_path / "idx"), chunk_bits=7,
                    block_size=16)


def test_with_global_ids_empty_input(spark):
    from pyspark.sql import functions as F

    from dhr_spark.operators.docids import with_global_ids

    empty = spark.createDataFrame([], "conv_id string, turn_idx int")
    out = with_global_ids(empty, [F.col("conv_id"), F.col("turn_idx")], "docid")
    assert out.count() == 0
    assert dict(out.dtypes)["docid"] == "bigint"


def test_resume_with_positional_does_not_duplicate_positions(spark, built, tmp_path):
    """ADVICE r2 (medium): resuming a positional build must write positions
    only for the NOT-yet-committed chunks; an unfiltered append would
    duplicate every (docid, term) positions row of the done chunks and
    multiply phrase/proximity results."""
    import json
    import os
    import shutil

    tr = built["tr"]
    part_dir = str(tmp_path / "part")
    build_index(spark, tr, part_dir, chunk_bits=CHUNK_BITS, block_size=BLOCK,
                docid_strategy="window", positional=True)
    clean = (
        spark.read.parquet(f"{part_dir}/positions")
        .groupBy().agg(F.count("*").alias("n"),
                       F.sum(F.size("positions")).alias("npos"))
        .collect()[0]
    )

    # simulate a crash that lost half the chunks (positions included)
    man = load_manifest(part_dir)
    chunks = sorted(man["chunks"], key=int)
    lost = chunks[len(chunks) // 2:]
    for c in lost:
        for sub in ("segments", "doclens", "positions"):
            p = os.path.join(part_dir, sub, f"chunk={c}")
            if os.path.exists(p):
                shutil.rmtree(p)
    man["chunks"] = {c: v for c, v in man["chunks"].items() if c not in lost}
    with open(os.path.join(part_dir, "manifest.json"), "w") as f:
        json.dump(man, f)

    build_index(spark, tr, part_dir, chunk_bits=CHUNK_BITS, block_size=BLOCK,
                docid_strategy="window", resume=True, positional=True)
    resumed = (
        spark.read.parquet(f"{part_dir}/positions")
        .groupBy().agg(F.count("*").alias("n"),
                       F.sum(F.size("positions")).alias("npos"))
        .collect()[0]
    )
    assert (resumed["n"], resumed["npos"]) == (clean["n"], clean["npos"])
    # no (docid, term_id) appears twice
    dup = (
        spark.read.parquet(f"{part_dir}/positions")
        .groupBy("docid", "term_id").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0


def test_searcher_ignores_orphan_chunks(spark, built, tmp_path):
    """ADVICE r2: chunk partitions on disk but absent from the manifest
    lineage (a crashed append's leftovers) must not be scored."""
    import shutil

    idx2 = str(tmp_path / "orph")
    shutil.copytree(built["idx"], idx2)
    man = load_manifest(idx2)
    max_chunk = max(int(c) for c in man["chunks"])
    orphan = max_chunk + 5
    # forge an orphan by cloning the highest committed chunk's files
    for sub in ("segments", "doclens"):
        src = f"{idx2}/{sub}/chunk={max_chunk}"
        shutil.copytree(src, f"{idx2}/{sub}/chunk={orphan}")

    from dhr_spark.operators.wand import Searcher

    res = Searcher(spark, idx2).search(built["queries"], k=10)
    committed_docs = spark.read.parquet(f"{idx2}/segments").filter(
        F.col("chunk") <= max_chunk
    )
    # every returned docid must belong to a committed chunk
    bad = res.filter(
        F.shiftright(F.col("docid"), CHUNK_BITS) > max_chunk
    ).count()
    assert bad == 0 and res.count() > 0
    # and the result equals the pre-orphan index's answer exactly
    a = _as_map(search_wand(spark, built["idx"], built["queries"], k=10).collect())
    b = _as_map(res.collect())
    assert a == b


def test_bm25_parameter_override(spark, built):
    """Query-time k1/b override (stats-free layout: no reindex): the
    overridden Searcher must match the slow path recomputed under the same
    parameters, and differ from the manifest-parameter ranking's scores."""
    from dhr_spark.operators.wand import Searcher

    k1o, bo = 1.2, 0.75
    s = Searcher(spark, built["idx"], k1=k1o, b=bo)
    fast = _as_map(s.search(built["queries"], k=20).collect())

    docs = with_docids(built["tr"], "window")
    tok = with_tokens(docs, mode="lucene")
    tfs, dls = term_freqs(tok), doc_lengths(tok)
    cs = corpus_stats(dls).collect()[0]
    tdict = term_dictionary(term_stats(tfs, cs["n_docs"]))
    postings = postings_flat(tfs, dls, tdict, cs["avgdl"], k1=k1o, b=bo)
    qtok = with_tokens(built["queries"], mode="lucene")
    qtfs = query_term_freqs(qtok.select("qid", "tokens")).join(
        tdict.select("term", "term_id"), "term"
    )
    slow = _as_map(search_slow_path(qtfs, postings, k=20).collect())

    assert set(fast) == set(slow)
    for qid in slow:
        assert [x[0] for x in slow[qid]] == [x[0] for x in fast[qid]], qid
        for (d1, r1, s1), (d2, r2, s2) in zip(slow[qid], fast[qid]):
            assert r1 == r2 and abs(s1 - s2) <= 1e-6

    default = _as_map(
        Searcher(spark, built["idx"]).search(built["queries"], k=20).collect()
    )
    qid = next(iter(fast))
    assert fast[qid] != default[qid]  # the override actually changed scores

    import pytest as _pytest

    with _pytest.raises(ValueError, match="admissible"):
        Searcher(spark, built["idx"], k1=0.0)
    with _pytest.raises(ValueError, match="admissible"):
        Searcher(spark, built["idx"], b=1.5)


def test_auto_chunk_bits_sizing():
    from dhr_spark.index.builder import auto_chunk_bits

    # 9.3M docs / 32 cores -> 128 target chunks -> 2^17-doc chunks
    assert auto_chunk_bits(9_329_082, 32) == 17
    # small corpora clamp at the 10-bit floor
    assert auto_chunk_bits(1_300, 8) == 10
    assert auto_chunk_bits(0, 8) == 10
    # huge docid spaces clamp at 22 bits (4M docs/chunk)
    assert auto_chunk_bits(10**12, 8) == 22
    # more cores -> more, smaller chunks
    assert auto_chunk_bits(10**8, 512) > 0
    assert auto_chunk_bits(10**8, 512) < auto_chunk_bits(10**8, 8)


def test_auto_chunk_bits_build_and_resume_guard(spark, tmp_path):
    """chunk_bits='auto' resolves from the docid space; resume with a
    DIFFERENT explicit chunk_bits refuses (the skip-list and partition
    layouts key on it); resume with 'auto' adopts the prior's."""
    import pytest as _pytest

    from dhr_spark.data.synthetic import synth_queries, synth_transcripts
    from dhr_spark.index.builder import build_index, load_manifest
    from dhr_spark.operators.wand import search_wand

    d = str(tmp_path / "auto_idx")
    tr = synth_transcripts(spark, 30)
    man = build_index(spark, tr, d, chunk_bits="auto", block_size=16,
                      docid_strategy="window")
    assert man["chunk_bits"] == 10  # tiny corpus -> floor
    assert search_wand(spark, d, synth_queries(spark, 4), k=5).count() > 0

    with _pytest.raises(ValueError, match="prior build"):
        build_index(spark, tr, d, chunk_bits=12, block_size=16,
                    docid_strategy="window", resume=True)
    man2 = build_index(spark, tr, d, chunk_bits="auto", block_size=16,
                       docid_strategy="window", resume=True)
    assert man2["chunk_bits"] == 10
    assert load_manifest(d)["n_docs"] == man["n_docs"]


def test_search_batch_matches_search(spark, built):
    # the fully distributed big-batch path (no driver query dict) must be
    # rank- and score-identical to the collected-kernel path
    from dhr_spark.operators.wand import Searcher

    s = Searcher(spark, built["idx"])
    fast = s.search(built["queries"], k=10)
    dist = s.search_batch(built["queries"], k=10)
    lhs = {(r["qid"], r["docid"], r["rank"], round(r["score"], 6))
           for r in fast.collect()}
    rhs = {(r["qid"], r["docid"], r["rank"], round(r["score"], 6))
           for r in dist.collect()}
    assert lhs == rhs and lhs


def test_search_batch_oov_and_k1b_override(spark, built):
    from dhr_spark.operators.wand import Searcher

    # OOV-only query: no rows, no crash; k1/b overrides flow through
    q = spark.createDataFrame(
        [("qo", "zzyzx qqqqq")], "qid string, text string"
    )
    s = Searcher(spark, built["idx"])
    assert s.search_batch(q, k=5).count() == 0
    so = Searcher(spark, built["idx"], k1=1.2, b=0.75)
    lhs = {(r["qid"], r["docid"], r["rank"], round(r["score"], 6))
           for r in so.search(built["queries"], k=10).collect()}
    rhs = {(r["qid"], r["docid"], r["rank"], round(r["score"], 6))
           for r in so.search_batch(built["queries"], k=10).collect()}
    assert lhs == rhs
