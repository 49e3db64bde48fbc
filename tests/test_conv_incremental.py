"""Conversation-granularity incremental refresh: appending turns that EXTEND
existing conversations must produce, after tombstoning, exactly the ranking a
full rebuild over the updated transcripts gives — score-identical per
conv_id — and tombstoned docids must never appear in any result surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.conv import append_conversations, build_conv_index
from dhr_spark.operators.wand import Searcher

CHUNK_BITS = 6
BLOCK = 8


def _turns(spark, n_convs, seed=1):
    return synth_transcripts(spark, n_convs, seed=seed)


@pytest.fixture(scope="module")
def corpora(spark):
    base = _turns(spark, 30).cache()
    # batch: new turns for 6 EXISTING conversations + 4 brand-new convs
    existing = base.filter(F.col("conv_id").isin(
        [r["conv_id"] for r in base.select("conv_id").distinct().limit(6).collect()]
    ))
    extension = existing.groupBy("conv_id").agg(
        F.max("turn_idx").alias("mx")
    ).select(
        "conv_id",
        (F.col("mx") + 1).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("fresh extension text about spark merge "),
                 F.col("conv_id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    new_convs = _turns(spark, 4, seed=77).withColumn(
        "conv_id", F.concat(F.lit("nc-"), F.col("conv_id"))
    )
    batch = extension.unionByName(new_convs).cache()
    union = base.unionByName(batch).cache()
    return dict(base=base, batch=batch, union=union)


@pytest.fixture(scope="module")
def queries(spark):
    return synth_queries(spark, 12).cache()


def _ranked_by_conv(spark, idx, queries, k=10):
    res = Searcher(spark, idx).search(queries, k=k)
    dm = spark.read.parquet(f"{idx}/doc_map").select("docid", "conv_id")
    return {
        (r["qid"], r["conv_id"]): (r["rank"], round(r["score"], 4))
        for r in res.join(dm, "docid").collect()
    }


def test_conv_append_matches_full_rebuild(spark, corpora, queries, tmp_path_factory):
    inc_dir = str(tmp_path_factory.mktemp("conv") / "inc")
    full_dir = str(tmp_path_factory.mktemp("conv") / "full")
    build_conv_index(spark, corpora["base"], inc_dir,
                     chunk_bits=CHUNK_BITS, block_size=BLOCK)
    man = append_conversations(spark, corpora["batch"], corpora["union"], inc_dir)
    build_conv_index(spark, corpora["union"], full_dir,
                     chunk_bits=CHUNK_BITS, block_size=BLOCK)
    man_full = Searcher(spark, full_dir).manifest

    # exact-stats contract: live n_docs / avgdl / total_dl match the rebuild
    assert man["n_docs"] == man_full["n_docs"]
    assert man["total_dl"] == man_full["total_dl"]
    assert abs(man["avgdl"] - man_full["avgdl"]) < 1e-9
    assert man["tombstones"] == 6  # exactly the extended conversations

    got = _ranked_by_conv(spark, inc_dir, queries)
    want = _ranked_by_conv(spark, full_dir, queries)
    assert got == want and got


def test_conv_append_tombstones_never_surface(spark, corpora, queries,
                                              tmp_path_factory):
    d = str(tmp_path_factory.mktemp("conv") / "idx")
    build_conv_index(spark, corpora["base"], d, chunk_bits=CHUNK_BITS,
                     block_size=BLOCK, positional=True)
    append_conversations(spark, corpora["batch"], corpora["union"], d)
    s = Searcher(spark, d)
    tombs = {int(r["docid"])
             for r in spark.read.parquet(f"{d}/tombstones").collect()}
    assert tombs
    hits = {int(r["docid"]) for r in s.search(queries, k=50).collect()}
    assert not (hits & tombs)
    ph = s.search_phrase("spark")
    assert not ({int(r["docid"]) for r in ph.collect()} & tombs)


def test_conv_append_guards(spark, corpora, tmp_path):
    from dhr_spark.index.builder import build_index

    d = str(tmp_path / "turnidx")
    build_index(spark, corpora["base"], d, chunk_bits=CHUNK_BITS,
                block_size=BLOCK, docid_strategy="window")
    with pytest.raises(ValueError, match="granularity"):
        append_conversations(spark, corpora["batch"], corpora["union"], d)


def test_conv_double_append_stays_consistent(spark, corpora, queries,
                                             tmp_path_factory):
    """Two successive appends touching overlapping conversations: the second
    must tombstone the FIRST append's re-emits, and ranking still equals a
    rebuild over the final transcripts."""
    inc_dir = str(tmp_path_factory.mktemp("conv") / "inc2")
    full_dir = str(tmp_path_factory.mktemp("conv") / "full2")
    build_conv_index(spark, corpora["base"], inc_dir,
                     chunk_bits=CHUNK_BITS, block_size=BLOCK)
    append_conversations(spark, corpora["batch"], corpora["union"], inc_dir)
    batch2 = corpora["batch"].withColumn(
        "turn_idx", F.col("turn_idx") + 100
    ).withColumn("text", F.concat(F.lit("second wave "), F.col("text")))
    union2 = corpora["union"].unionByName(batch2).cache()
    man = append_conversations(spark, batch2, union2, inc_dir)
    build_conv_index(spark, union2, full_dir, chunk_bits=CHUNK_BITS,
                     block_size=BLOCK)
    assert _ranked_by_conv(spark, inc_dir, queries) == _ranked_by_conv(
        spark, full_dir, queries
    )
    # 6 extended + 4 new convs re-emitted twice -> first re-emits tombstoned
    assert man["tombstones"] == 6 + 10


def test_turn_append_refuses_conv_index(spark, corpora, tmp_path):
    from dhr_spark.index.incremental import append_to_index

    d = str(tmp_path / "cidx")
    build_conv_index(spark, corpora["base"], d, chunk_bits=CHUNK_BITS,
                     block_size=BLOCK)
    with pytest.raises(ValueError, match="conversation-granularity"):
        append_to_index(spark, corpora["batch"], d)
