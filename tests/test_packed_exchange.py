"""Packed segment exchange (index/segments.py map-side combine): the
varint-packed partial runs shipped through the build shuffle must merge and
encode into BYTE-IDENTICAL segment rows vs the raw-row exchange, for every
codec — the packed path is a pure transport optimization (~5 B/posting vs a
28 B row on the memory-bus-bound build stage)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_transcripts
from dhr_spark.index.segments import build_segments
from dhr_spark.operators.termfreq import with_tokens


@pytest.fixture(scope="module")
def postings(spark):
    tr = synth_transcripts(spark, 60)
    tok = with_tokens(
        tr.selectExpr("conv_id || '#' || turn_idx AS doc_key", "text"),
        mode="lucene",
    )
    tf = (
        tok.select(F.monotonically_increasing_id().alias("docid"), "tokens")
        .select("docid", F.explode("tokens").alias("term"))
        .groupBy("docid", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = tf.groupBy("docid").agg(F.sum("tf").alias("dl"))
    tid = tf.select("term").distinct().withColumn(
        "term_id", F.row_number().over(W.orderBy("term")).cast("long")
    )
    return (
        tf.join(dl, "docid").join(tid, "term")
        .select("term_id", "docid", "tf", "dl")
        .cache()
    )


def _canon(df):
    return {
        (r["chunk"], r["term_id"]): (
            r["n"], bytes(r["doc_gaps"]), bytes(r["tfs"]),
            tuple(r["block_max_tf"]), tuple(r["block_min_dl"]),
            tuple(r["block_first"]), tuple(r["block_doc_off"]),
            tuple(r["block_tf_off"]), r["bytes"],
        )
        for r in df.collect()
    }


@pytest.mark.parametrize("codec", ["varint", "for", "pfor"])
def test_packed_exchange_byte_identity(spark, postings, codec):
    packed = _canon(
        build_segments(postings, 7, 16, codec, packed_exchange=True)
    )
    raw = _canon(
        build_segments(postings, 7, 16, codec, packed_exchange=False)
    )
    assert packed == raw
    assert len(packed) > 100
