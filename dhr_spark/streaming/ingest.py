"""Structured Streaming ingestion for the transcripts pipeline.

The reference is strictly batch (SURVEY.md §2.8); this module is the
Spark-native extension a live transcript firehose needs. Design follows how
real lexical engines (Lucene/ES) handle streams — because BM25 is a GLOBAL
function (idf, avgdl move with every insert), exact scoring cannot be
incrementally maintained per event. So:

  1. ``ingest_stream``  — readStream -> foreachBatch lands arriving turns
     in a batch-partitioned parquet STAGING area, exactly-once: each batch
     writes its OWN ``_batch_id=`` partition with dynamic partition
     overwrite, so a replay after a crash at ANY point (mid-write, between
     write and manifest) clobbers the partial partition instead of
     appending duplicates. The manifest's high-water mark is a cache, not
     the correctness mechanism.
  2. ``compact_to_index`` — full rebuild over everything staged (the
     periodic defragmentation path). ``resume=True`` is ONLY for re-running
     an interrupted compaction of the SAME staged snapshot; the builder
     verifies the corpus matches the prior manifest and raises otherwise.
  3. ``refresh_index`` — INCREMENTAL compaction: appends only unseen staged
     batches via index/incremental.py. Sound despite BM25 being a global
     function because v2 segments are stats-free (raw tf + per-block
     (max_tf, min_dl) bounds; idf/avgdl applied query-side), so committed
     postings survive stats drift; the batch watermark rides the append's
     atomic manifest commit.
  4. ``streaming_turn_counts`` — a native streaming windowed aggregation
     (watermark + tumbling window) for monitoring the firehose itself.

Scale shape: foreachBatch writes are per-partition parquet commits; no
shuffle in the hot path. Compaction is the existing resumable build (one
wide shuffle).
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


def stage_batch(batch_df: DataFrame, batch_id: int, staging_dir: str) -> int:
    """Idempotently commit one micro-batch to the staging area.

    The write itself is idempotent — the batch lands in its own
    ``_batch_id=`` partition via dynamic partition overwrite — so a replay
    after a crash anywhere between the data write and the manifest update
    overwrites the partial partition instead of appending duplicates (the
    exactly-once hole of the append-then-manifest design). The committed
    row count is read back from the written partition (partition-pruned
    scan), so ``batch_df`` is evaluated once. Returns rows committed,
    0 if the batch was already recorded."""
    state = _staging_state(staging_dir)
    if batch_id <= state["last_batch_id"]:
        return 0  # replay after recovery: already committed
    data_dir = os.path.join(staging_dir, "turns")
    (
        batch_df.withColumn("_batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(data_dir)
    )
    # count the batch's own partition directory: an all-empty batch writes
    # no partition (dynamic overwrite leaves only _SUCCESS at the root, so
    # a whole-dataset read would fail schema inference on the first batch)
    part_dir = os.path.join(data_dir, f"_batch_id={batch_id}")
    n = (
        batch_df.sparkSession.read.parquet(part_dir).count()
        if os.path.isdir(part_dir)
        else 0
    )
    state["last_batch_id"] = batch_id
    state["n_turns"] += n
    _write_staging_state(staging_dir, state)
    return n


def ingest_stream(
    spark: SparkSession,
    input_dir: str,
    staging_dir: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """readStream -> exactly-once commit into the staging area (see
    stage_batch for the idempotence contract).

    Returns the StreamingQuery; with ``available_now`` it drains existing
    files and stops (the test/cron mode)."""
    stream = stream_transcripts(spark, input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        stage_batch(batch_df, batch_id, staging_dir)

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

    ALWAYS a full rebuild over everything staged: BM25 is a global function
    (idf, avgdl, and therefore block maxes move with every insert), so
    appending chunks built under new stats to segments built under old ones
    would mis-score terms (term-id drift) and break block-max WAND
    admissibility. ``resume=True`` is ONLY for re-running an interrupted
    compaction of the SAME staged snapshot — the builder asserts the corpus
    matches the prior manifest (n_docs/avgdl/term count) and raises if the
    staging area has grown since."""
    from dhr_spark.index.builder import build_index

    turns = spark.read.parquet(os.path.join(staging_dir, "turns")).drop("_batch_id")
    return build_index(
        spark, turns, index_dir,
        analyzer_mode=analyzer_mode, chunk_bits=chunk_bits,
        block_size=block_size, resume=resume,
    )


def refresh_index(
    spark: SparkSession,
    staging_dir: str,
    index_dir: str,
    analyzer_mode: str = "lucene",
    chunk_bits: int = 17,
    block_size: int = 128,
    compact_fill: float | None = None,
) -> dict:
    """INCREMENTAL compaction: fold only the staged batches the index has
    not seen yet (``_batch_id`` > the manifest's compaction watermark) into
    the index via ``index.incremental.append_to_index`` — no rebuild.

    Soundness rests on the v2 stats-free segment layout (block bounds are
    (max_tf, min_dl), idf/avgdl applied query-side), so committed postings
    stay valid as stats drift; see index/incremental.py. The watermark rides
    the append's ATOMIC manifest commit: a crash mid-append leaves the old
    watermark, and the retry re-appends the same batches idempotently
    (dynamic partition overwrite + versioned term dictionary).

    First call (no index yet) performs the initial full build. Returns the
    manifest; no-ops (returns it unchanged) when nothing new is staged.

    ``compact_fill``: when set, run a chunk compaction (index/compact.py)
    after folding — the Lucene background-merge policy for long-running
    refresh loops, bounding the underfull-chunk tail that per-batch appends
    accumulate. Score-identical; skipped automatically when fewer than two
    chunks fall below the fill ratio.
    """
    from dhr_spark.index.builder import load_manifest
    from dhr_spark.index.incremental import append_to_index

    staged_hwm = _staging_state(staging_dir)["last_batch_id"]
    man = load_manifest(index_dir)
    seen = int(man.get("compacted_through_batch", -1)) if man else -1
    if staged_hwm <= seen:
        if man is None:
            raise ValueError(f"nothing staged in {staging_dir} to build from")
        return man
    turns = (
        spark.read.parquet(os.path.join(staging_dir, "turns"))
        .filter(F.col("_batch_id") > seen)  # partition-pruned scan
        .drop("_batch_id")
    )
    mark = {"compacted_through_batch": int(staged_hwm)}
    if man is None:
        from dhr_spark.operators.docids import with_docids, doc_map
        from dhr_spark.index.builder import build_index_from_docs

        docs = with_docids(turns)
        try:
            return build_index_from_docs(
                spark, docs, index_dir, analyzer_mode=analyzer_mode,
                chunk_bits=chunk_bits, block_size=block_size,
                doc_map_df=doc_map(docs), extra_manifest=mark,
            )
        finally:
            cached = getattr(docs, "_dhr_persisted", None)
            if cached is not None:
                cached.unpersist()
    man2 = append_to_index(spark, turns, index_dir, extra_manifest=mark)
    if compact_fill:
        from dhr_spark.index.compact import compact_index

        man2 = compact_index(spark, index_dir, fill_threshold=compact_fill)
    return man2


def refresh_index_conversations(
    spark: SparkSession,
    staging_dir: str,
    index_dir: str,
    analyzer_mode: str = "lucene",
    chunk_bits: int = 17,
    block_size: int = 128,
) -> dict:
    """Conversation-granularity incremental compaction: fold only the staged
    batches the index has not seen yet into a CONV-level index via
    ``index.conv.append_conversations``.

    New turns CHANGE existing conversation documents, so the append needs
    the affected conversations' full text — it comes from the staging store
    itself (all committed batches; the append's affected-conv semi-join
    prunes the scan). The watermark rides the append's atomic manifest
    commit exactly as the turn-level path. First call performs the initial
    ``build_conv_index``; no-ops when nothing new is staged."""
    from dhr_spark.index.builder import load_manifest
    from dhr_spark.index.conv import append_conversations, build_conv_index

    staged_hwm = _staging_state(staging_dir)["last_batch_id"]
    man = load_manifest(index_dir)
    seen = int(man.get("compacted_through_batch", -1)) if man else -1
    if staged_hwm <= seen:
        if man is None:
            raise ValueError(f"nothing staged in {staging_dir} to build from")
        return man
    all_turns = spark.read.parquet(os.path.join(staging_dir, "turns")).drop(
        "_batch_id"
    )
    mark = {"compacted_through_batch": int(staged_hwm)}
    if man is None:
        return build_conv_index(
            spark, all_turns, index_dir, analyzer_mode=analyzer_mode,
            chunk_bits=chunk_bits, block_size=block_size, extra_manifest=mark,
        )
    new_turns = (
        spark.read.parquet(os.path.join(staging_dir, "turns"))
        .filter(F.col("_batch_id") > seen)  # partition-pruned scan
        .drop("_batch_id")
    )
    return append_conversations(
        spark, new_turns, all_turns, index_dir, extra_manifest=mark
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
