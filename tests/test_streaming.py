"""Streaming ingestion: exactly-once staging, compaction to a queryable
index, and the native windowed aggregation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.streaming.ingest import (
    _staging_state,
    _write_staging_state,
    compact_to_index,
    ingest_stream,
    stage_batch,
    stream_transcripts,
    streaming_turn_counts,
)


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    input_dir = str(base / "in")
    staging = str(base / "staging")
    idx = str(base / "idx")
    tr = synth_transcripts(spark, 30)
    tr.filter(F.col("conv_id") < "conv-000015").write.parquet(
        input_dir + "/part1"
    )
    return dict(input_dir=input_dir, staging=staging, idx=idx, tr=tr)


def test_ingest_drain_and_append(spark, dirs):
    q = ingest_stream(spark, dirs["input_dir"] + "/part1", dirs["staging"])
    q.awaitTermination(120)
    staged1 = spark.read.parquet(os.path.join(dirs["staging"], "turns"))
    n1 = staged1.count()
    assert n1 == dirs["tr"].filter(F.col("conv_id") < "conv-000015").count()

    # second drain of the same source: no duplicates (checkpoint + HWM)
    q2 = ingest_stream(spark, dirs["input_dir"] + "/part1", dirs["staging"])
    q2.awaitTermination(120)
    assert spark.read.parquet(os.path.join(dirs["staging"], "turns")).count() == n1


def test_compact_and_query(spark, dirs):
    man = compact_to_index(
        spark, dirs["staging"], dirs["idx"], chunk_bits=7, block_size=16
    )
    assert man["n_docs"] > 0
    from dhr_spark.operators.wand import search_wand

    res = search_wand(spark, dirs["idx"], synth_queries(spark, 5), k=5)
    assert res.count() > 0
    assert res.groupBy("qid").agg(F.max("rank")).agg(F.max("max(rank)")) \
        .collect()[0][0] <= 5


def test_replay_after_crash_between_write_and_manifest(spark, tmp_path):
    """The exactly-once hole VERDICT r01 flagged: a crash AFTER the batch
    data lands but BEFORE the manifest high-water mark is updated must not
    duplicate rows when the batch replays. The partitioned dynamic-overwrite
    write makes the replay clobber the partial partition."""
    staging = str(tmp_path / "staging")
    tr = synth_transcripts(spark, 10)
    n_batch = tr.count()

    assert stage_batch(tr, 0, staging) == n_batch
    # simulate the crash: data for batch 0 is committed, manifest is not
    state = _staging_state(staging)
    state["last_batch_id"] = -1
    state["n_turns"] = 0
    _write_staging_state(staging, state)

    # replay of the same batch (recovery path) — must overwrite, not append
    assert stage_batch(tr, 0, staging) == n_batch
    staged = spark.read.parquet(os.path.join(staging, "turns"))
    assert staged.count() == n_batch
    assert staged.select("conv_id", "turn_idx").distinct().count() == n_batch
    assert _staging_state(staging) == {"last_batch_id": 0, "n_turns": n_batch}

    # post-commit replay is still a no-op
    assert stage_batch(tr, 0, staging) == 0
    assert spark.read.parquet(os.path.join(staging, "turns")).count() == n_batch


def test_stage_empty_first_batch(spark, tmp_path):
    """An all-empty first micro-batch writes no files and not even the
    dataset root; stage_batch must record it without crashing."""
    staging = str(tmp_path / "staging")
    empty = synth_transcripts(spark, 5).limit(0)
    assert stage_batch(empty, 0, staging) == 0
    assert _staging_state(staging) == {"last_batch_id": 0, "n_turns": 0}
    tr = synth_transcripts(spark, 5)
    assert stage_batch(tr, 1, staging) == tr.count()


def test_compact_resume_on_grown_staging_raises(spark, tmp_path):
    """resume=True is only valid for the SAME staged snapshot: once new
    batches land, the frozen term dictionary / stats no longer match and
    the builder must refuse rather than silently corrupt the index."""
    staging = str(tmp_path / "staging")
    idx = str(tmp_path / "idx")
    tr = synth_transcripts(spark, 12)
    half = tr.filter(F.col("conv_id") < "conv-000006")
    stage_batch(half, 0, staging)
    compact_to_index(spark, staging, idx, chunk_bits=7, block_size=16)

    # same snapshot: resume re-run is fine (no-op for completed chunks)
    compact_to_index(spark, staging, idx, chunk_bits=7, block_size=16,
                     resume=True)

    # staging grows -> resume must refuse
    stage_batch(tr.filter(F.col("conv_id") >= "conv-000006"), 1, staging)
    with pytest.raises(ValueError, match="SAME corpus"):
        compact_to_index(spark, staging, idx, chunk_bits=7, block_size=16,
                         resume=True)

    # the sanctioned path: full rebuild over the grown staging area
    man = compact_to_index(spark, staging, idx, chunk_bits=7, block_size=16)
    assert man["n_docs"] == tr.count()


def test_streaming_windowed_agg(spark, dirs):
    stream = stream_transcripts(spark, dirs["input_dir"] + "/part1")
    out = streaming_turn_counts(stream, window_minutes=10)
    q = (
        out.writeStream.format("memory")
        .queryName("turn_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; with a bounded input
    # the final windows stay open, so assert on schema + non-negative counts
    rows = spark.sql("SELECT * FROM turn_counts").collect()
    assert {f.name for f in spark.table("turn_counts").schema.fields} == {
        "window_start", "role", "n_turns", "approx_convs"
    }
    for r in rows:
        assert r["n_turns"] > 0


def test_incremental_refresh_matches_full_compaction(spark, tmp_path):
    from dhr_spark.index.builder import load_manifest
    from dhr_spark.operators.wand import search_wand
    from dhr_spark.streaming.ingest import refresh_index

    tr = synth_transcripts(spark, 24)
    staging = str(tmp_path / "staging")
    inc_idx = str(tmp_path / "inc")
    full_idx = str(tmp_path / "full")
    half = tr.filter(F.col("conv_id") < "conv-000012")
    rest = tr.subtract(half)

    stage_batch(half, 0, staging)
    m0 = refresh_index(spark, staging, inc_idx, chunk_bits=7, block_size=16)
    assert m0["compacted_through_batch"] == 0  # initial build

    stage_batch(rest, 1, staging)
    m1 = refresh_index(spark, staging, inc_idx, chunk_bits=7, block_size=16)
    assert m1["compacted_through_batch"] == 1 and m1["appends"] == 1

    # no new batches -> no-op, watermark unchanged
    m2 = refresh_index(spark, staging, inc_idx, chunk_bits=7, block_size=16)
    assert m2["compacted_through_batch"] == 1 and m2["appends"] == 1

    # equivalence with the full-rebuild compactor
    compact_to_index(spark, staging, full_idx, chunk_bits=7, block_size=16)
    queries = synth_queries(spark, 10)

    def res(idx):
        dm = spark.read.parquet(os.path.join(idx, "doc_map"))
        out = search_wand(spark, idx, queries, k=100_000).join(dm, "docid")
        return {
            (r["qid"], r["conv_id"], r["turn_idx"]): round(r["score"], 4)
            for r in out.collect()
        }

    assert res(inc_idx) == res(full_idx)
    assert load_manifest(inc_idx)["n_docs"] == load_manifest(full_idx)["n_docs"]


def test_refresh_empty_staging_raises(spark, tmp_path):
    from dhr_spark.streaming.ingest import refresh_index

    with pytest.raises(ValueError, match="nothing staged"):
        refresh_index(spark, str(tmp_path / "empty"), str(tmp_path / "idx"))


def test_conv_refresh_matches_conv_rebuild(spark, tmp_path):
    """Conversation-granularity streaming compaction: batch 1 EXTENDS half
    the staged conversations; the incremental conv index (re-emit +
    tombstones) must rank identically to a fresh conv build over the full
    staged corpus."""
    from dhr_spark.index.conv import build_conv_index
    from dhr_spark.operators.wand import Searcher
    from dhr_spark.streaming.ingest import refresh_index_conversations

    tr = synth_transcripts(spark, 20)
    staging = str(tmp_path / "staging")
    inc_idx = str(tmp_path / "cinc")
    full_idx = str(tmp_path / "cfull")

    stage_batch(tr, 0, staging)
    m0 = refresh_index_conversations(spark, staging, inc_idx, chunk_bits=6,
                                     block_size=8)
    assert m0["compacted_through_batch"] == 0 and m0["granularity"] == "conversation"

    ext = tr.filter(F.col("conv_id") < "conv-000010").groupBy("conv_id").agg(
        F.max("turn_idx").alias("mx")
    ).select(
        "conv_id", (F.col("mx") + 1).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("streamed extension about index merge "),
                 F.col("conv_id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    stage_batch(ext, 1, staging)
    m1 = refresh_index_conversations(spark, staging, inc_idx, chunk_bits=6,
                                     block_size=8)
    assert m1["compacted_through_batch"] == 1 and m1["tombstones"] == 10

    # no-op when nothing new staged
    m2 = refresh_index_conversations(spark, staging, inc_idx, chunk_bits=6,
                                     block_size=8)
    assert m2["appends"] == m1["appends"]

    build_conv_index(spark, tr.unionByName(ext), full_idx, chunk_bits=6,
                     block_size=8)
    queries = synth_queries(spark, 8)

    def res(idx):
        dm = spark.read.parquet(os.path.join(idx, "doc_map")).select(
            "docid", "conv_id"
        )
        out = Searcher(spark, idx).search(queries, k=50).join(dm, "docid")
        return {
            (r["qid"], r["conv_id"]): round(r["score"], 4)
            for r in out.collect()
        }

    assert res(inc_idx) == res(full_idx)
