"""Index aliases + rollover (index/alias.py — ES alias/ILM analogue) and
reindex-from-stored-fields (index/reindex.py — ES _reindex analogue).

Contracts: searching an alias equals a single union-corpus index at every
point of the rollover lifecycle; a rolled member inherits the write
member's exact layout; reindex of a post-delete index equals the source's
exact-stats scoring with docids preserved and tombstones compacted away;
docvalue-update generations bake into the reindexed doc_map."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.alias import (
    append_to_alias,
    create_alias,
    load_alias,
    open_alias,
)
from dhr_spark.index.builder import build_index, load_manifest
from dhr_spark.index.reindex import reindex
from dhr_spark.operators.wand import Searcher

CB, BS = 7, 16


def _batch(spark, n, seed, prefix):
    return synth_transcripts(spark, n, seed=seed).withColumn(
        "conv_id", F.concat(F.lit(prefix), F.col("conv_id"))
    )


def _by_turn_fed(spark, res, dirs):
    maps = None
    for i, d in enumerate(dirs):
        dm = spark.read.parquet(os.path.join(d, "doc_map")).withColumn(
            "index_id", F.lit(i)
        )
        maps = dm if maps is None else maps.unionByName(dm)
    return {
        (r["qid"], r["conv_id"], r["turn_idx"]): round(r["score"], 6)
        for r in res.join(maps, ["index_id", "docid"]).collect()
    }


def _by_turn(spark, res, d):
    dm = spark.read.parquet(os.path.join(d, "doc_map"))
    return {
        (r["qid"], r["conv_id"], r["turn_idx"]): round(r["score"], 6)
        for r in res.join(dm, "docid").collect()
    }


def test_alias_rollover_lifecycle_and_identity(spark, tmp_path):
    a = _batch(spark, 12, 42, "a-")
    b = _batch(spark, 8, 91, "b-")
    c = _batch(spark, 5, 77, "c-")
    first = str(tmp_path / "gen0")
    build_index(
        spark, a, first, chunk_bits=CB, block_size=BS, forward_index=True
    )
    adir = str(tmp_path / "alias")
    rec = create_alias(adir, [first])
    assert rec["write"] == os.path.abspath(first)

    # write member already holds >= 10 docs -> batch b rolls a new member
    rec = append_to_alias(spark, b, adir, max_docs=10)
    assert rec["rolled"] and len(rec["members"]) == 2
    newman = load_manifest(rec["write"])
    oldman = load_manifest(first)
    for k in ("analyzer_mode", "chunk_bits", "block_size", "k1", "b",
              "forward_index", "positional", "stored", "docvalues"):
        assert newman.get(k) == oldman.get(k), k
    # batch c fits under a huge threshold -> plain append into the new
    # write member, member list unchanged
    rec = append_to_alias(spark, c, adir, max_docs=1_000_000)
    assert not rec["rolled"] and len(rec["members"]) == 2
    assert load_manifest(rec["write"])["appends"] == 1

    # the alias searches exactly like one index over the union corpus
    q = synth_queries(spark, 10)
    union = a.unionByName(b).unionByName(c)
    full = str(tmp_path / "full")
    build_index(spark, union, full, chunk_bits=CB, block_size=BS)
    ms = open_alias(spark, adir)
    fed = _by_turn_fed(
        spark, ms.search(q, k=100_000), load_alias(adir)["members"]
    )
    single = _by_turn(
        spark, Searcher(spark, full).search(q, k=100_000, prune=False), full
    )
    assert fed == single and fed


def test_alias_guards(spark, tmp_path):
    with pytest.raises(ValueError, match="at least one member"):
        create_alias(str(tmp_path / "x"), [])
    with pytest.raises(FileNotFoundError, match="no manifest"):
        create_alias(str(tmp_path / "x"), [str(tmp_path / "ghost")])
    d = str(tmp_path / "idx")
    build_index(
        spark, _batch(spark, 4, 1, "g-"), d, chunk_bits=CB, block_size=BS
    )
    with pytest.raises(ValueError, match="not among the members"):
        create_alias(str(tmp_path / "x"), [d], write=str(tmp_path / "o"))
    with pytest.raises(FileNotFoundError, match="no alias.json"):
        load_alias(str(tmp_path / "nope"))
    adir = str(tmp_path / "al")
    create_alias(adir, [d])
    with pytest.raises(ValueError, match="max_docs"):
        append_to_alias(spark, _batch(spark, 2, 2, "h-"), adir, max_docs=0)


def test_reindex_after_delete_matches_exact_stats(spark, tmp_path):
    """Reindex compacts tombstones away; because the source's exact-stats
    delete already removed the docs from df/avgdl, the reindexed index
    scores every live doc IDENTICALLY (docids preserved)."""
    from dhr_spark.index.delete import delete_docs

    src = str(tmp_path / "src")
    tr = synth_transcripts(spark, 15, seed=3)
    build_index(
        spark, tr, src, chunk_bits=CB, block_size=BS,
        stored=True, forward_index=True, docvalues=["role", "ts"],
    )
    delete_docs(spark, src, docids=[0, 1, 5], exact_stats=True)
    dst = str(tmp_path / "dst")
    man = reindex(spark, src, dst)
    # exact-stats delete already dropped src's n_docs to the live count;
    # reindex keeps that count but carries ZERO tombstones
    assert man["n_docs"] == load_manifest(src)["n_docs"]
    assert int(load_manifest(src).get("tombstones", 0)) == 3
    assert int(man.get("tombstones", 0)) == 0
    q = synth_queries(spark, 8)
    a = {
        (r["qid"], r["docid"]): round(r["score"], 6)
        for r in Searcher(spark, src).search(q, k=100_000).collect()
    }
    b = {
        (r["qid"], r["docid"]): round(r["score"], 6)
        for r in Searcher(spark, dst).search(q, k=100_000).collect()
    }
    assert a == b and a
    # artifact flags and docvalue columns carried over
    assert man["stored"] and man["forward_index"]
    dm = spark.read.parquet(os.path.join(dst, "doc_map"))
    assert {"role", "ts"} <= set(dm.columns)
    # integrity of the rebuilt index
    from dhr_spark.index.check import check_index

    rep = check_index(spark, dst, decode=True)
    assert rep["ok"], rep["problems"]


def test_reindex_bakes_in_dv_updates(spark, tmp_path):
    from dhr_spark.index.dvupdate import update_docvalues

    src = str(tmp_path / "srcdv")
    build_index(
        spark, synth_transcripts(spark, 6, seed=9), src,
        chunk_bits=CB, block_size=BS, stored=True, docvalues=["ts"],
    )
    upd = spark.createDataFrame([(0, 123456789)], "docid long, ts long")
    update_docvalues(spark, src, upd)
    dst = str(tmp_path / "dstdv")
    man = reindex(spark, src, dst)
    assert not man.get("dv_gens")
    row = (
        spark.read.parquet(os.path.join(dst, "doc_map"))
        .filter(F.col("docid") == 0)
        .select(F.col("ts").cast("long").alias("t"))
        .collect()[0]
    )
    assert row["t"] == 123456789


def test_reindex_analyzer_override_and_transform(spark, tmp_path):
    src = str(tmp_path / "srca")
    build_index(
        spark, synth_transcripts(spark, 6, seed=4), src,
        chunk_bits=CB, block_size=BS, stored=True,
    )
    # analyzer change: the simple chain keeps stopwords/unstemmed forms,
    # so the dictionary must grow
    dst = str(tmp_path / "dsta")
    man = reindex(spark, src, dst, analyzer_mode="simple")
    assert man["analyzer_mode"] == "simple"
    assert man["n_terms"] > load_manifest(src)["n_terms"]
    # transform hook: every live doc gains a marker term
    dst2 = str(tmp_path / "dstt")
    reindex(
        spark, src, dst2,
        transform=lambda df: df.withColumn(
            "text", F.concat(F.col("text"), F.lit(" zzzmarker"))
        ),
    )
    s = Searcher(spark, dst2)
    got = s.search(
        spark.createDataFrame([("q", "zzzmarker")], "qid string, text string"),
        k=100_000,
    )
    assert got.count() == load_manifest(dst2)["n_docs"]


def test_reindex_guards(spark, tmp_path):
    src = str(tmp_path / "srcg")
    build_index(
        spark, synth_transcripts(spark, 4, seed=5), src,
        chunk_bits=CB, block_size=BS,
    )
    with pytest.raises(ValueError, match="stored"):
        reindex(spark, src, str(tmp_path / "d1"))
    src2 = str(tmp_path / "srcg2")
    build_index(
        spark, synth_transcripts(spark, 4, seed=5), src2,
        chunk_bits=CB, block_size=BS, stored=True,
    )
    with pytest.raises(ValueError, match="unknown reindex overrides"):
        reindex(spark, src2, str(tmp_path / "d2"), granularity="x")
    with pytest.raises(ValueError, match="docid, text"):
        reindex(
            spark, src2, str(tmp_path / "d3"),
            transform=lambda df: df.drop("text"),
        )
    with pytest.raises(FileNotFoundError, match="no manifest"):
        reindex(spark, str(tmp_path / "ghost"), str(tmp_path / "d4"))
