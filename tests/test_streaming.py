"""Streaming ingestion: exactly-once staging, compaction to a queryable
index, and the native windowed aggregation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.streaming.ingest import (
    compact_to_index,
    ingest_stream,
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
