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
def idx_dirs(spark, tmp_path_factory, corpus):
    """{codec: index dir} over the same corpus, one per codec."""
    out = {}
    for codec in ("varint", "for", "pfor"):
        d = str(tmp_path_factory.mktemp(f"c_{codec}") / "idx")
        build_index(
            spark, corpus, d, chunk_bits=CHUNK_BITS, block_size=BLOCK,
            codec=codec,
        )
        out[codec] = d
    return out


def _frame(df):
    return sorted(tuple(r) for r in df.collect())


PACKED = ["for", "pfor"]


@pytest.mark.parametrize("codec", PACKED)
def test_manifest_records_codec_and_bytes_shrink(spark, idx_dirs, codec):
    mv, mf = load_manifest(idx_dirs["varint"]), load_manifest(idx_dirs[codec])
    assert mv["codec"] == "varint" and mf["codec"] == codec
    bv = sum(c["bytes"] for c in mv["chunks"].values())
    bf = sum(c["bytes"] for c in mf["chunks"].values())
    assert bf < bv, f"{codec} ({bf}) not smaller than varint ({bv})"
    # postings counts identical — only the byte stream changed
    assert {c: v["postings"] for c, v in mv["chunks"].items()} == {
        c: v["postings"] for c, v in mf["chunks"].items()
    }


def test_pfor_never_larger_than_for(spark, idx_dirs):
    # per-block cost-exact width choice includes k=0 (plain FOR), so PFOR
    # can only pay the extra n_exc header byte per block
    mf = load_manifest(idx_dirs["for"])
    mp = load_manifest(idx_dirs["pfor"])
    bf = sum(c["bytes"] for c in mf["chunks"].values())
    bp = sum(c["bytes"] for c in mp["chunks"].values())
    assert bp <= bf, f"pfor ({bp}) larger than for ({bf})"


@pytest.mark.parametrize("codec", PACKED)
def test_packed_index_search_identity(spark, idx_dirs, queries, codec):
    sv = Searcher(spark, idx_dirs["varint"])
    sf = Searcher(spark, idx_dirs[codec])
    rv = _frame(sv.search(queries, k=10).withColumn("score", F.round("score", 6)))
    rf = _frame(sf.search(queries, k=10).withColumn("score", F.round("score", 6)))
    assert rv == rf and len(rv) > 0


@pytest.mark.parametrize("codec", PACKED)
def test_packed_index_count_boolean_postings_identity(
    spark, idx_dirs, queries, codec
):
    sv = Searcher(spark, idx_dirs["varint"])
    sf = Searcher(spark, idx_dirs[codec])
    assert _frame(sv.count(queries)) == _frame(sf.count(queries))
    # MUST/MUST_NOT go through the presence kernels (Lucene classic syntax)
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


@pytest.mark.parametrize("codec", PACKED)
def test_append_inherits_packed_codec_and_matches_rebuild(
    spark, tmp_path_factory, corpus, queries, codec
):
    extra = synth_transcripts(spark, 25, seed=9).withColumn(
        "conv_id", F.concat(F.lit("x-"), F.col("conv_id"))
    )
    inc = str(tmp_path_factory.mktemp("finc") / "idx")
    full = str(tmp_path_factory.mktemp("ffull") / "idx")
    build_index(
        spark, corpus, inc, chunk_bits=CHUNK_BITS, block_size=BLOCK,
        codec=codec,
    )
    m = append_to_index(spark, extra, inc)
    assert m["codec"] == codec
    build_index(
        spark, corpus.unionByName(extra), full, chunk_bits=CHUNK_BITS,
        block_size=BLOCK, codec=codec,
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


@pytest.mark.parametrize("codec", PACKED)
def test_delete_compact_preserves_packed_codec(
    spark, tmp_path_factory, corpus, queries, codec
):
    from dhr_spark.index.compact import compact_index
    from dhr_spark.index.delete import delete_docs

    idx = str(tmp_path_factory.mktemp("fcomp") / "idx")
    build_index(
        spark, corpus, idx, chunk_bits=CHUNK_BITS, block_size=BLOCK,
        codec=codec,
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
    assert man["codec"] == codec
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
    # for vs pfor also refuses — blobs are copied opaquely in a merge
    c = str(tmp_path_factory.mktemp("mc") / "idx")
    build_index(
        spark,
        synth_transcripts(spark, 10, seed=4).withColumn(
            "conv_id", F.concat(F.lit("w-"), F.col("conv_id"))
        ),
        c,
        chunk_bits=CHUNK_BITS,
        block_size=BLOCK,
        codec="pfor",
    )
    with pytest.raises(ValueError, match="codec"):
        merge_indexes(spark, b, c)


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


# ----------------------------------------------------------- PFOR unit tests


def _blocks(n, bs):
    nb = -(-n // bs)
    lens = np.full(nb, bs, dtype=np.int64)
    lens[-1] = n - bs * (nb - 1)
    return nb, lens, np.concatenate(([0], np.cumsum(lens)[:-1]))


@given(
    st.lists(
        st.integers(min_value=1, max_value=2**40),
        min_size=1,
        max_size=300,
    ),
    st.sampled_from([4, 16, 128, 256]),
    st.randoms(use_true_random=False),
)
@settings(max_examples=100, deadline=None)
def test_pfor_roundtrip_docid_stream(gaps, bs, rnd):
    from dhr_spark.index.codec import pfor_decode_stream, pfor_encode_stream

    d = np.cumsum(np.array(gaps, dtype=np.int64))
    n = d.size
    nb, lens, bstarts = _blocks(n, bs)
    g = np.diff(d, prepend=0)
    g[bstarts] = 0
    buf, offs = pfor_encode_stream(
        g.astype(np.uint64), lens, firsts=d[bstarts]
    )
    out, _ = pfor_decode_stream(buf, offs, lens, np.arange(nb), restarts=True)
    assert np.array_equal(out, d)
    # random block subset — the skip-read contract
    k = rnd.randint(1, nb)
    sel = np.array(sorted(rnd.sample(range(nb), k)), dtype=np.int64)
    part, sl = pfor_decode_stream(buf, offs, lens, sel, restarts=True)
    want = np.concatenate([d[bstarts[s]: bstarts[s] + lens[s]] for s in sel])
    assert np.array_equal(part, want) and np.array_equal(sl, lens[sel])


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62),
        min_size=1,
        max_size=300,
    ),
    st.sampled_from([16, 128]),
)
@settings(max_examples=100, deadline=None)
def test_pfor_roundtrip_value_stream_and_never_larger(vals, bs):
    from dhr_spark.index.codec import (
        for_encode_stream,
        pfor_decode_stream,
        pfor_encode_stream,
    )

    v = np.array(vals, dtype=np.uint64)
    nb, lens, _ = _blocks(v.size, bs)
    buf, offs = pfor_encode_stream(v, lens)
    out, _ = pfor_decode_stream(
        buf, offs, lens, np.arange(nb), restarts=False
    )
    assert np.array_equal(out.astype(np.uint64), v)
    # cost-exact width choice includes k=0 (plain FOR): PFOR pays at most
    # the extra per-block n_exc header byte
    fbuf, _ = for_encode_stream(v, lens)
    assert len(buf) <= len(fbuf) + nb


def test_pfor_patches_outliers_and_shrinks():
    from dhr_spark.index.codec import (
        for_encode_stream,
        pfor_decode_stream,
        pfor_encode_stream,
    )

    # 127 tiny gaps + one huge outlier: FOR pays 40 bits for every slot,
    # PFOR packs 3 bits and patches the outlier
    v = np.full(128, 5, dtype=np.uint64)
    v[77] = np.uint64(2**40 - 3)
    lens = np.array([128], dtype=np.int64)
    pbuf, poffs = pfor_encode_stream(v, lens)
    fbuf, _ = for_encode_stream(v, lens)
    assert len(pbuf) < len(fbuf) / 5
    out, _ = pfor_decode_stream(
        pbuf, poffs, lens, np.array([0]), restarts=False
    )
    assert np.array_equal(out.astype(np.uint64), v)


def test_pfor_block_cap():
    from dhr_spark.index.codec import pfor_encode_stream

    with pytest.raises(ValueError, match="256"):
        pfor_encode_stream(
            np.ones(300, dtype=np.uint64), np.array([300], dtype=np.int64)
        )
