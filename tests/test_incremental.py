"""Incremental index refresh: append == rebuild (score-identical at the
(conv_id, turn_idx) level), idempotent under crash-and-retry, and guarded
against misuse."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.builder import build_index, load_manifest
from dhr_spark.index.incremental import append_to_index
from dhr_spark.operators.wand import search_wand

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
def corpora(spark):
    base = _batch(spark, 30, 42, "a-")
    b1 = _batch(spark, 12, 91, "b-")
    b2 = _batch(spark, 9, 77, "c-")
    return base, b1, b2


@pytest.fixture(scope="module")
def queries(spark):
    return synth_queries(spark, n_queries=12)


def test_append_matches_full_rebuild(spark, tmp_path_factory, corpora, queries):
    base, b1, b2 = corpora
    inc = str(tmp_path_factory.mktemp("inc") / "idx")
    full = str(tmp_path_factory.mktemp("full") / "idx")

    build_index(spark, base, inc, chunk_bits=CHUNK_BITS, block_size=BLOCK)
    m1 = append_to_index(spark, b1, inc)
    m2 = append_to_index(spark, b2, inc)
    assert m2["appends"] == 2 and m2["n_docs"] > m1["n_docs"]

    build_index(
        spark, base.unionByName(b1).unionByName(b2), full,
        chunk_bits=CHUNK_BITS, block_size=BLOCK,
    )
    mf = load_manifest(full)
    # global stats agree exactly (totals-based avgdl == avg over union)
    assert m2["n_docs"] == mf["n_docs"]
    assert m2["total_dl"] == mf["total_dl"]
    assert abs(m2["avgdl"] - mf["avgdl"]) < 1e-9
    assert m2["n_terms"] == mf["n_terms"]

    # identical scores for every (query, turn) — idf/avgdl drift fully
    # absorbed by query-side stats; docid layout is allowed to differ
    assert _results(spark, inc, queries) == _results(spark, full, queries)


def test_append_retry_after_simulated_crash(spark, tmp_path, corpora, queries):
    base, b1, _ = corpora
    idx = str(tmp_path / "idx")
    build_index(spark, base, idx, chunk_bits=CHUNK_BITS, block_size=BLOCK)
    man_before = json.load(open(os.path.join(idx, "manifest.json")))

    append_to_index(spark, b1, idx)
    ref = _results(spark, idx, queries)

    # crash simulation: all data writes landed but the manifest commit was
    # lost — rewind the manifest and retry the same append
    with open(os.path.join(idx, "manifest.json"), "w") as f:
        json.dump(man_before, f)
    append_to_index(spark, b1, idx)

    assert _results(spark, idx, queries) == ref
    dm = spark.read.parquet(os.path.join(idx, "doc_map"))
    assert dm.count() == dm.select("docid").distinct().count()  # no dup rows


def test_append_guards(spark, tmp_path, corpora):
    base, b1, _ = corpora
    with pytest.raises(FileNotFoundError):
        append_to_index(spark, b1, str(tmp_path / "nope"))

    idx = str(tmp_path / "idx")
    build_index(spark, base, idx, chunk_bits=CHUNK_BITS, block_size=BLOCK)
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
    )
    with pytest.raises(ValueError, match="empty"):
        append_to_index(spark, empty, idx)

    man_path = os.path.join(idx, "manifest.json")
    man = json.load(open(man_path))
    man["version"] = 1
    with open(man_path, "w") as f:
        json.dump(man, f)
    with pytest.raises(ValueError, match="version"):
        append_to_index(spark, b1, idx)


def test_append_allocates_fresh_chunks(spark, tmp_path, corpora):
    base, b1, _ = corpora
    idx = str(tmp_path / "idx")
    build_index(spark, base, idx, chunk_bits=CHUNK_BITS, block_size=BLOCK)
    before = set(load_manifest(idx)["chunks"])
    m = append_to_index(spark, b1, idx)
    new = set(m["chunks"]) - before
    assert new and min(int(c) for c in new) > max(int(c) for c in before)
    # committed segment rows never rewritten: old chunks' lineage unchanged
    after = load_manifest(idx)["chunks"]
    man0 = {c: after[c] for c in before}
    assert all(man0[c]["postings"] > 0 for c in before)


def test_append_onto_window_built_index_schema_consistent(spark, tmp_path):
    """docid must be int64 under BOTH docid strategies: an int64 append onto
    an int32-built artifact leaves mixed parquet file schemas that fail at
    read time (observed on the positions artifact)."""
    from dhr_spark.data.synthetic import synth_queries, synth_transcripts
    from dhr_spark.index.builder import build_index
    from dhr_spark.index.incremental import append_to_index
    from dhr_spark.operators.wand import Searcher

    d = str(tmp_path / "idx")
    build_index(spark, synth_transcripts(spark, 20), d, chunk_bits=6,
                block_size=8, docid_strategy="window", positional=True,
                forward_index=True)
    batch = synth_transcripts(spark, 4, seed=5).withColumn(
        "conv_id", F.concat(F.lit("w-"), F.col("conv_id"))
    )
    append_to_index(spark, batch, d)
    # every artifact readable and docid is int64 everywhere
    for sub in ("segments", "doclens", "positions", "forward", "doc_map"):
        df = spark.read.parquet(f"{d}/{sub}")
        df.count()
        if "docid" in df.columns:
            assert dict(df.dtypes)["docid"] == "bigint", sub
    s = Searcher(spark, d)
    assert s.search(synth_queries(spark, 5), k=5).count() > 0
