"""Structured Streaming ingestion for the transcripts pipeline.

The reference is strictly batch (SURVEY.md §2.8); this module is the
Spark-native extension a live transcript firehose needs. Design follows how
real lexical engines (Lucene/ES) handle streams — because BM25 is a GLOBAL
function (idf, avgdl move with every insert), exact scoring cannot be
incrementally maintained per event. So:

  1. ``ingest_stream``  — readStream -> foreachBatch appends arriving turns
     to a chunk-aligned parquet STAGING area, exactly-once (batch_id high-
     water mark in the staging manifest makes replays idempotent).
  2. ``compact_to_index`` — batch job folding staged turns into the index:
     a full rebuild refreshes global stats + block maxes (the "segment
     optimize" step); with ``resume=True`` it builds only chunks not yet in
     the index manifest (stats frozen from the existing manifest — the
     standard refresh-lag tradeoff, documented, NOT silent).
  3. ``streaming_turn_counts`` — a native streaming windowed aggregation
     (watermark + tumbling window) for monitoring the firehose itself.

Scale shape: foreachBatch writes are append-only parquet partitioned by
ingest batch; no shuffle in the hot path. Compaction is the existing
resumable build (one wide shuffle).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

_STAGING_MANIFEST = "staging_manifest.json"


def _staging_state(staging_dir: str) -> dict:
    p = os.path.join(staging_dir, _STAGING_MANIFEST)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"last_batch_id": -1, "n_turns": 0}


def _write_staging_state(staging_dir: str, state: dict) -> None:
    os.makedirs(staging_dir, exist_ok=True)
    tmp = os.path.join(staging_dir, _STAGING_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, os.path.join(staging_dir, _STAGING_MANIFEST))


def stream_transcripts(
    spark: SparkSession, input_dir: str, schema: str = TRANSCRIPTS_SCHEMA
) -> DataFrame:
    """File-source stream of transcript turns (swap for Kafka/Iceberg CDC in
    production — the downstream plan is source-agnostic)."""
    return spark.readStream.schema(schema).parquet(input_dir)


def ingest_stream(
    spark: SparkSession,
    input_dir: str,
    staging_dir: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """readStream -> exactly-once append into the staging area.

    Returns the StreamingQuery; with ``available_now`` it drains existing
    files and stops (the test/cron mode). Batch replays after checkpoint
    recovery are dropped via the last_batch_id high-water mark."""
    stream = stream_transcripts(spark, input_dir)
    data_dir = os.path.join(staging_dir, "turns")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        state = _staging_state(staging_dir)
        if batch_id <= state["last_batch_id"]:
            return  # replay after recovery: already committed
        n = batch_df.count()
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(data_dir)
        )
        state["last_batch_id"] = batch_id
        state["n_turns"] += n
        _write_staging_state(staging_dir, state)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(staging_dir, "_checkpoint"),
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_to_index(
    spark: SparkSession,
    staging_dir: str,
    index_dir: str,
    analyzer_mode: str = "lucene",
    chunk_bits: int = 17,
    block_size: int = 128,
    resume: bool = False,
) -> dict:
    """Fold the staged turns into the inverted index.

    Default = full rebuild: recomputes global stats (idf/avgdl) and block
    maxes over everything staged so far — exact BM25, the periodic
    "optimize". ``resume=True`` only builds docid-chunks missing from the
    manifest (cheap incremental refresh; global stats stay frozen at their
    last full-rebuild values, so scores for new docs use slightly stale
    idf/avgdl until the next full rebuild — the standard refresh-lag
    contract, NOT rank-exact across the refresh boundary)."""
    from dhr_spark.index.builder import build_index

    turns = spark.read.parquet(os.path.join(staging_dir, "turns")).drop("_batch_id")
    return build_index(
        spark, turns, index_dir,
        analyzer_mode=analyzer_mode, chunk_bits=chunk_bits,
        block_size=block_size, resume=resume,
    )


def streaming_turn_counts(
    stream: DataFrame, window_minutes: int = 10, watermark_minutes: int = 30
) -> DataFrame:
    """Streaming windowed aggregation: turns + distinct-ish convs per role
    per tumbling window, tolerating ``watermark_minutes`` of lateness.
    approx_count_distinct because exact distinct is unbounded state on an
    infinite stream."""
    return (
        stream.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(F.window("ts", f"{window_minutes} minutes").alias("w"), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
        )
        .select(F.col("w.start").alias("window_start"), "role", "n_turns",
                "approx_convs")
    )
