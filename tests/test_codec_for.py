"""FOR (Frame-of-Reference) bit-packed postings codec — Lucene ForUtil
analogue (codec.for_encode_stream / for_decode_stream).

Pins: (1) pure-codec roundtrip incl. random block selection (the skip-read
contract block-max WAND uses), (2) a FOR-built index answers every query
surface byte-identically to a varint index over the same corpus, (3) the
codec survives the index lifecycle — resume, incremental append, delete +
compaction — because every write path re-reads manifest["codec"], (4) a
physical merge refuses mixed codecs (blobs are copied opaquely there), and
(5) the FOR layout is strictly smaller than varint on gap-heavy postings.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.builder import build_index, load_manifest
from dhr_spark.index.codec import (
    bit_lengths,
    for_decode_stream,
    for_encode_stream,
)
from dhr_spark.index.incremental import append_to_index
from dhr_spark.operators.wand import Searcher

CHUNK_BITS, BLOCK = 7, 16


# ---------------------------------------------------------------- codec unit


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=400))
@settings(max_examples=150, deadline=None)
def test_bit_lengths_exact(vals):
    arr = np.array(vals, dtype=np.uint64)
    got = bit_lengths(arr)
    want = np.array([int(v).bit_length() for v in vals], dtype=np.int64)
    assert np.array_equal(got, want)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40),
        min_size=1,
        max_size=400,
        unique=True,
    ),
    st.sampled_from([4, 16, 128]),
)
@settings(max_examples=100, deadline=None)
def test_for_roundtrip_docid_stream(docids, bs):
    d = np.array(sorted(docids), dtype=np.int64)
    n = d.size
    nb = -(-n // bs)
    lens = np.full(nb, bs, dtype=np.int64)
    lens[-1] = n - bs * (nb - 1)
    bstarts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    gaps = np.diff(d, prepend=0)
    gaps[bstarts] = 0
    buf, offs = for_encode_stream(
        gaps.astype(np.uint64), lens, firsts=d[bstarts]
    )
    out, _ = for_decode_stream(buf, offs, lens, np.arange(nb), restarts=True)
    assert np.array_equal(out, d)
    # random block subset decodes to exactly those blocks' docids
    rng = np.random.RandomState(n)
    sel = np.sort(rng.choice(nb, rng.randint(1, nb + 1), replace=False))
    part, sl = for_decode_stream(buf, offs, lens, sel, restarts=True)
    want = np.concatenate([d[bstarts[s] : bstarts[s] + lens[s]] for s in sel])
    assert np.array_equal(part, want) and np.array_equal(sl, lens[sel])


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**20), min_size=1, max_size=400
    ),
    st.sampled_from([4, 16, 128]),
)
@settings(max_examples=100, deadline=None)
def test_for_roundtrip_value_stream(vals, bs):
    v = np.array(vals, dtype=np.uint64)
    n = v.size
    nb = -(-n // bs)
    lens = np.full(nb, bs, dtype=np.int64)
    lens[-1] = n - bs * (nb - 1)
    buf, offs = for_encode_stream(v, lens)
    out, _ = for_decode_stream(buf, offs, lens, np.arange(nb), restarts=False)
    assert np.array_equal(out.astype(np.uint64), v)


def test_for_all_zero_block_has_empty_payload():
    buf, offs = for_encode_stream(
        np.zeros(5, np.uint64), np.array([5]), firsts=np.array([99])
    )
    # width byte (0) + 1 varint byte for first=99: no payload at all
    assert len(buf) == 2 and offs.tolist() == [0]
    out, _ = for_decode_stream(buf, offs, np.array([5]), np.array([0]), restarts=True)
    assert out.tolist() == [99] * 5


# ----------------------------------------------------------- index lifecycle


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_transcripts(spark, 80, seed=5)


@pytest.fixture(scope="module")
def queries(spark):
    return synth_queries(spark, n_queries=15)


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory, corpus):
    """(varint index dir, FOR index dir) over the same corpus."""
    dv = str(tmp_path_factory.mktemp("cv") / "idx")
    df = str(tmp_path_factory.mktemp("cf") / "idx")
    build_index(spark, corpus, dv, chunk_bits=CHUNK_BITS, block_size=BLOCK)
    build_index(
        spark, corpus, df, chunk_bits=CHUNK_BITS, block_size=BLOCK,
        codec="for",
    )
    return dv, df


def _frame(df):
    return sorted(tuple(r) for r in df.collect())


def test_manifest_records_codec_and_bytes_shrink(spark, pair):
    mv, mf = load_manifest(pair[0]), load_manifest(pair[1])
    assert mv["codec"] == "varint" and mf["codec"] == "for"
    bv = sum(c["bytes"] for c in mv["chunks"].values())
    bf = sum(c["bytes"] for c in mf["chunks"].values())
    assert bf < bv, f"FOR ({bf}) not smaller than varint ({bv})"
    # postings counts identical — only the byte stream changed
    assert {c: v["postings"] for c, v in mv["chunks"].items()} == {
        c: v["postings"] for c, v in mf["chunks"].items()
    }


def test_for_index_search_identity(spark, pair, queries):
    sv, sf = Searcher(spark, pair[0]), Searcher(spark, pair[1])
    rv = _frame(sv.search(queries, k=10).withColumn("score", F.round("score", 6)))
    rf = _frame(sf.search(queries, k=10).withColumn("score", F.round("score", 6)))
    assert rv == rf and len(rv) > 0


def test_for_index_count_boolean_postings_identity(spark, pair, queries):
    sv, sf = Searcher(spark, pair[0]), Searcher(spark, pair[1])
    assert _frame(sv.count(queries)) == _frame(sf.count(queries))
    # MUST/MUST_NOT路 through the presence kernels (Lucene classic syntax)
    boolq = spark.createDataFrame(
        [("b1", "+data -model the"), ("b2", "+the +data")],
        "qid string, text string",
    )
    assert _frame(
        sv.search_syntax(boolq, k=20).withColumn("score", F.round("score", 6))
    ) == _frame(
        sf.search_syntax(boolq, k=20).withColumn("score", F.round("score", 6))
    )
    terms = ["the", "data", "model"]
    assert _frame(sv.postings_list(terms)) == _frame(sf.postings_list(terms))


def test_append_inherits_for_codec_and_matches_rebuild(
    spark, tmp_path_factory, corpus, queries
):
    extra = synth_transcripts(spark, 25, seed=9).withColumn(
        "conv_id", F.concat(F.lit("x-"), F.col("conv_id"))
    )
    inc = str(tmp_path_factory.mktemp("finc") / "idx")
    full = str(tmp_path_factory.mktemp("ffull") / "idx")
    build_index(
        spark, corpus, inc, chunk_bits=CHUNK_BITS, block_size=BLOCK,
        codec="for",
    )
    m = append_to_index(spark, extra, inc)
    assert m["codec"] == "for"
    build_index(
        spark, corpus.unionByName(extra), full, chunk_bits=CHUNK_BITS,
        block_size=BLOCK, codec="for",
    )
    si, sf_ = Searcher(spark, inc), Searcher(spark, full)
    dmi = spark.read.parquet(os.path.join(inc, "doc_map"))
    dmf = spark.read.parquet(os.path.join(full, "doc_map"))

    def keyed(res, dm):
        return _frame(
            res.join(dm, "docid").select(
                "qid", "conv_id", "turn_idx", F.round("score", 4)
            )
        )

    assert keyed(si.search(queries, k=100_000), dmi) == keyed(
        sf_.search(queries, k=100_000), dmf
    )


def test_delete_compact_preserves_for_codec(
    spark, tmp_path_factory, corpus, queries
):
    from dhr_spark.index.compact import compact_index
    from dhr_spark.index.delete import delete_docs

    idx = str(tmp_path_factory.mktemp("fcomp") / "idx")
    build_index(
        spark, corpus, idx, chunk_bits=CHUNK_BITS, block_size=BLOCK,
        codec="for",
    )
    before = _frame(
        Searcher(spark, idx)
        .search(queries, k=10)
        .join(
            spark.read.parquet(os.path.join(idx, "doc_map")), "docid"
        )
        .select("qid", "conv_id", "turn_idx", F.round("score", 4))
    )
    # materialize the victim set before the delete/compact rewrite doc_map —
    # a lazy DataFrame would re-read files the compaction deleted
    victims = (
        spark.read.parquet(os.path.join(idx, "doc_map"))
        .orderBy("docid")
        .limit(6)
        .collect()
    )
    delete_docs(
        spark, idx, [int(r["docid"]) for r in victims], exact_stats=False
    )
    compact_index(spark, idx, fill_threshold=1.01, min_chunks=1)
    man = load_manifest(idx)
    assert man["codec"] == "for"
    after = _frame(
        Searcher(spark, idx)
        .search(queries, k=10)
        .join(spark.read.parquet(os.path.join(idx, "doc_map")), "docid")
        .select("qid", "conv_id", "turn_idx", F.round("score", 4))
    )
    gone = {(r["conv_id"], r["turn_idx"]) for r in victims}
    assert all((c, t) not in gone for (_, c, t, _) in after)
    # surviving docs score under post-delete stats on both sides of the
    # compaction; the compacted FOR index must still decode correctly
    assert len(after) > 0


def test_merge_refuses_codec_mismatch(spark, tmp_path_factory, corpus):
    from dhr_spark.index.merge import merge_indexes

    a = str(tmp_path_factory.mktemp("ma") / "idx")
    b = str(tmp_path_factory.mktemp("mb") / "idx")
    build_index(spark, corpus, a, chunk_bits=CHUNK_BITS, block_size=BLOCK)
    build_index(
        spark,
        synth_transcripts(spark, 10, seed=3).withColumn(
            "conv_id", F.concat(F.lit("z-"), F.col("conv_id"))
        ),
        b,
        chunk_bits=CHUNK_BITS,
        block_size=BLOCK,
        codec="for",
    )
    with pytest.raises(ValueError, match="codec"):
        merge_indexes(spark, a, b)


def test_resume_keeps_for_codec(spark, tmp_path_factory, corpus):
    idx = str(tmp_path_factory.mktemp("fres") / "idx")
    build_index(
        spark, corpus, idx, chunk_bits=CHUNK_BITS, block_size=BLOCK,
        codec="for",
    )
    # a resumed build passes codec="varint" by default — the prior manifest
    # must win or committed FOR chunks would be read as varints
    m = build_index(
        spark, corpus, idx, chunk_bits=CHUNK_BITS, block_size=BLOCK,
        resume=True,
    )
    assert m["codec"] == "for"
