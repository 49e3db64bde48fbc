"""Index integrity verification (index/check.py — Lucene CheckIndex
analogue): a clean build passes; targeted corruptions are detected and
named; orphan chunk partitions (crash debris readers already prune) are
reported separately, never as corruption."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_transcripts
from dhr_spark.index.builder import build_index
from dhr_spark.index.check import check_index
from dhr_spark.index.incremental import append_to_index

CB, BS = 6, 16


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, synth_transcripts(spark, 25, seed=11), d,
                chunk_bits=CB, block_size=BS, forward_index=True)
    return d


def test_clean_index_passes(spark, idx):
    rep = check_index(spark, idx, decode=True)
    assert rep["ok"], rep["problems"]
    assert not rep["problems"] and not rep["orphans"]
    assert rep["stats"]["n_docs_doclens"] == rep["stats"]["n_docs_doc_map"]
    assert rep["stats"]["postings"] > 0
    assert rep["stats"]["decoded_chunk"] is not None


def test_clean_index_passes_after_append_and_delete(spark, idx):
    from dhr_spark.index.delete import delete_docs

    extra = synth_transcripts(spark, 6, seed=12).withColumn(
        "conv_id", F.concat(F.lit("x"), F.col("conv_id"))
    )
    append_to_index(spark, extra, idx)
    delete_docs(spark, idx, docids=[0, 1], exact_stats=False)
    rep = check_index(spark, idx, decode=True)
    assert rep["ok"], rep["problems"]
    assert rep["stats"]["tombstones"] == 2


def test_missing_committed_chunk_detected(spark, idx):
    victim = sorted(os.listdir(os.path.join(idx, "segments")))
    victim = [v for v in victim if v.startswith("chunk=")][0]
    shutil.rmtree(os.path.join(idx, "segments", victim))
    rep = check_index(spark, idx)
    assert not rep["ok"]
    assert any("missing committed chunks" in p for p in rep["problems"])


def test_flagged_artifact_missing_detected(spark, idx):
    shutil.rmtree(os.path.join(idx, "forward"))
    rep = check_index(spark, idx)
    assert not rep["ok"]
    assert any("forward" in p for p in rep["problems"])


def test_tampered_manifest_counts_detected(spark, idx):
    mpath = os.path.join(idx, "manifest.json")
    man = json.load(open(mpath))
    c0 = sorted(man["chunks"])[0]
    man["chunks"][c0]["postings"] += 7
    man["n_terms"] += 1
    json.dump(man, open(mpath, "w"))
    rep = check_index(spark, idx)
    assert not rep["ok"]
    assert any("postings" in p for p in rep["problems"])
    assert any("dictionary has" in p for p in rep["problems"])


def test_orphan_chunk_reported_not_corruption(spark, idx):
    # fabricate crash debris: copy a committed chunk partition to a chunk
    # id past the manifest lineage
    seg = os.path.join(idx, "segments")
    src = [v for v in os.listdir(seg) if v.startswith("chunk=")][0]
    shutil.copytree(os.path.join(seg, src), os.path.join(seg, "chunk=97"))
    rep = check_index(spark, idx)
    assert rep["ok"], rep["problems"]
    assert rep["orphans"].get("segments") == [97]


def test_sorted_invariant_violation_detected(spark, tmp_path):
    # build sorted, then swap the doc_map's field values of two docs —
    # the layout no longer matches the recorded index_sort
    d = str(tmp_path / "sidx")
    build_index(spark, synth_transcripts(spark, 25, seed=13), d,
                chunk_bits=CB, block_size=BS, index_sort=("ts", False))
    assert check_index(spark, d)["ok"]
    dm_dir = os.path.join(d, "doc_map")
    dm = spark.read.parquet(dm_dir)
    lo = dm.agg(F.min("ts"), F.max("ts")).collect()[0]
    fixed = dm.withColumn(
        "ts", F.when(F.col("docid") == 0, F.lit(lo[0])).otherwise(F.col("ts"))
    )
    fixed.write.mode("overwrite").parquet(dm_dir + "_new")
    shutil.rmtree(dm_dir)
    os.rename(dm_dir + "_new", dm_dir)
    rep = check_index(spark, d)
    assert not rep["ok"]
    assert any("index_sort contract violated" in p for p in rep["problems"])
