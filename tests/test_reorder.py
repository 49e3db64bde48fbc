"""MinHash-clustered docid reordering (index/reorder.py).

Contracts: the clustering key is deterministic pure column math with a
sentinel for unshingleable texts; a clustered build returns IDENTICAL
search results through doc_map keys; on a topic-interleaved corpus the
clustered index is strictly smaller (the whole point); appends keep
working (per-chunk sort invariant is the index_sort machinery's)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.index.builder import build_index, load_manifest
from dhr_spark.index.reorder import (
    CKEY_SENTINEL,
    build_clustered_index,
    with_cluster_key,
)
from dhr_spark.operators.wand import Searcher

CB, BS = 11, 16
N_TOPICS, PER_TOPIC = 200, 6


def _topic_corpus(spark):
    """Topic-interleaved transcripts: doc i belongs to topic i % N_TOPICS,
    so corpus order gives every topic term docid gaps of ~N_TOPICS (2-byte
    varints) while clustered order packs them to gap 1."""
    rows = []
    for i in range(N_TOPICS * PER_TOPIC):
        t = i % N_TOPICS
        text = f"alpha{t} bravo{t} charlie{t} delta{t} echo{t} foxtrot{t}"
        rows.append((f"c{i:05d}", 0, "user", text, None, None))
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_cluster_key_deterministic_and_sentinel(spark):
    df = spark.createDataFrame(
        [("a", 0, "one two three four"), ("b", 0, "one two three four"),
         ("c", 0, "totally different words here"), ("d", 0, "too short")],
        "conv_id string, turn_idx int, text string",
    )
    keys = {r["conv_id"]: r["ckey"] for r in with_cluster_key(df).collect()}
    assert keys["a"] == keys["b"]  # identical text -> identical key
    assert keys["a"] != keys["c"]
    assert keys["d"] == CKEY_SENTINEL  # 2 tokens < shingle_n=3
    again = {r["conv_id"]: r["ckey"] for r in with_cluster_key(df).collect()}
    assert keys == again


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("reorder")
    tr = _topic_corpus(spark)
    plain = str(root / "plain")
    clus = str(root / "clustered")
    build_index(spark, tr, plain, chunk_bits=CB, block_size=BS,
                docid_strategy="window")
    build_clustered_index(spark, tr, clus, chunk_bits=CB, block_size=BS,
                          docid_strategy="window")
    return tr, plain, clus


def test_clustered_index_is_smaller(spark, pair):
    _, plain, clus = pair
    pb = sum(c["bytes"] for c in load_manifest(plain)["chunks"].values())
    cb = sum(c["bytes"] for c in load_manifest(clus)["chunks"].values())
    # every topic term's gaps drop from ~200 (2-byte varint) to 1: the
    # docid stream should shrink decisively, not marginally
    assert cb < pb * 0.8, (cb, pb)
    pp = sum(c["postings"] for c in load_manifest(plain)["chunks"].values())
    cp = sum(c["postings"] for c in load_manifest(clus)["chunks"].values())
    assert pp == cp  # same postings, smaller bytes


def test_clustered_search_identity(spark, pair):
    _, plain, clus = pair
    qs = spark.createDataFrame(
        [("q1", "alpha7 bravo7"), ("q2", "charlie42 delta42 echo42"),
         ("q3", "foxtrot199")],
        "qid string, text string",
    )

    def keyed(idx):
        s = Searcher(spark, idx)
        dm = spark.read.parquet(f"{idx}/doc_map").select(
            "docid", "conv_id", "turn_idx"
        )
        return {
            (r["qid"], r["conv_id"], r["turn_idx"], round(r["score"], 4))
            for r in s.search(qs, k=20).join(dm, "docid").collect()
        }

    a, b = keyed(plain), keyed(clus)
    assert a == b and a


def test_clustered_append_identity(spark, pair, tmp_path):
    from dhr_spark.index.incremental import append_to_index

    tr, _, clus_src = pair
    import shutil

    clus = str(tmp_path / "clus_app")
    shutil.copytree(clus_src, clus)
    extra = spark.createDataFrame(
        [(f"x{i:03d}", 0, "user",
          f"alpha{i % 5} bravo{i % 5} charlie{i % 5} golf{i}", None, None)
         for i in range(40)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    # NO explicit ckey column: the clustered manifest makes the append
    # re-derive the canonical key with the committed shingle geometry
    append_to_index(spark, extra, clus)
    # rebuilt-from-scratch union reference
    ref = str(tmp_path / "ref")
    build_clustered_index(
        spark, tr.unionByName(extra), ref, chunk_bits=CB, block_size=BS,
        docid_strategy="window",
    )
    qs = spark.createDataFrame(
        [("q1", "alpha3 bravo3"), ("q2", "golf7")], "qid string, text string"
    )

    def keyed(idx):
        dm = spark.read.parquet(f"{idx}/doc_map").select(
            "docid", "conv_id", "turn_idx"
        )
        return {
            (r["qid"], r["conv_id"], r["turn_idx"], round(r["score"], 4))
            for r in Searcher(spark, idx).search(qs, k=50)
            .join(dm, "docid").collect()
        }

    assert keyed(clus) == keyed(ref) and keyed(clus)


def test_guards(spark):
    tr = _topic_corpus(spark).limit(5)
    with pytest.raises(ValueError, match="index_sort"):
        build_clustered_index(
            spark, tr, "/tmp/never", index_sort=("role", True)
        )
