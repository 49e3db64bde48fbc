"""Mixed-tier codecs (VERDICT r04 item 7): ``compact_index(codec=...)``
re-encodes the compacted cold chunks under a packed codec (PFOR — smallest
bytes, best bulk decode) while fresh append chunks stay on the varint
serving tier (cheapest per-call decode).  The per-chunk choice lives in the
manifest chunk entries; every decode path resolves it chunk-by-chunk via
``codec.index_codec``/``codec_of``, so WAND search, count, search_batch,
check_index and a LATER compaction all read mixed tiers transparently."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.builder import build_index, load_manifest
from dhr_spark.index.check import check_index
from dhr_spark.index.codec import codec_of, index_codec
from dhr_spark.index.compact import compact_index
from dhr_spark.index.incremental import append_to_index
from dhr_spark.operators.wand import Searcher, search_wand

CHUNK_BITS, BLOCK = 7, 16


def _batch(spark, n, seed, prefix):
    return synth_transcripts(spark, n, seed=seed).withColumn(
        "conv_id", F.concat(F.lit(prefix), F.col("conv_id"))
    )


def _results(spark, idx, queries, k=100_000):
    res = search_wand(spark, idx, queries, k=k)
    dm = spark.read.parquet(os.path.join(idx, "doc_map"))
    out = res.join(dm, "docid").select(
        "qid", "conv_id", "turn_idx", F.round("score", 4).alias("s")
    )
    return {(r["qid"], r["conv_id"], r["turn_idx"]): r["s"] for r in out.collect()}


@pytest.fixture(scope="module")
def tiered(spark, tmp_path_factory):
    """varint base + two underfull appends, compacted into a PFOR cold
    tier, then ONE MORE varint append on top — the steady-state mixed
    layout a rolling index converges to."""
    idx = str(tmp_path_factory.mktemp("tier") / "idx")
    build_index(
        spark, _batch(spark, 30, 42, "a-"), idx,
        chunk_bits=CHUNK_BITS, block_size=BLOCK,
    )
    for n, seed, pfx in ((6, 91, "b-"), (5, 77, "c-")):
        append_to_index(spark, _batch(spark, n, seed, pfx), idx)
    queries = synth_queries(spark, n_queries=10)
    before = _results(spark, idx, queries)
    man1 = compact_index(spark, idx, fill_threshold=0.9, codec="pfor")
    after_compact = _results(spark, idx, queries)
    # the codec switch is a pure relayout: identical (conv_id, turn_idx,
    # score) sets through the doc_map keys — checked HERE, before the next
    # append shifts the corpus stats (avgdl/idf) under every score
    assert after_compact == before
    append_to_index(spark, _batch(spark, 4, 55, "d-"), idx)
    return idx, queries, before, man1


def test_codec_of_resolution():
    assert codec_of("varint", 3) == "varint"
    assert codec_of({3: "pfor", -1: "varint"}, 3) == "pfor"
    assert codec_of({3: "pfor", -1: "varint"}, 9) == "varint"
    assert index_codec({"codec": "varint", "chunks": {}}) == "varint"
    man = {"codec": "varint", "chunks": {"5": {"codec": "pfor"}, "6": {}}}
    assert index_codec(man) == {5: "pfor", -1: "varint"}


def test_mixed_tier_manifest_and_search_identity(spark, tiered):
    idx, queries, before, man1 = tiered
    man = load_manifest(idx)
    # serving default stays varint; only the compacted chunks are marked
    assert man["codec"] == "varint"
    marked = {c: v["codec"] for c, v in man["chunks"].items() if "codec" in v}
    assert marked and set(marked.values()) == {"pfor"}
    assert len(marked) < len(man["chunks"])  # the post-compaction append is unmarked
    assert isinstance(index_codec(man), dict)


def test_mixed_tier_batch_count_and_check(spark, tiered):
    idx, queries, _, _ = tiered
    s = Searcher(spark, idx)
    # the bulk path decodes both tiers: search_batch == search exactly
    fast = {
        (r["qid"], r["docid"]): (r["rank"], round(r["score"], 6))
        for r in s.search(queries, k=50).collect()
    }
    slow = {
        (r["qid"], r["docid"]): (r["rank"], round(r["score"], 6))
        for r in s.search_batch(queries, k=50).collect()
    }
    assert fast == slow
    # presence/count kernels resolve per chunk too
    n_by_count = {r["qid"]: r["n"] for r in s.count(queries).collect()}
    n_by_search = {
        r["qid"]: r["n"]
        for r in s.search(queries, k=10**6, prune=False)
        .groupBy("qid").agg(F.count("*").alias("n")).collect()
    }
    assert n_by_count == n_by_search
    # integrity sweep decodes the probe chunk under its own codec
    rep = check_index(spark, idx, decode=True)
    assert rep["ok"], rep["problems"]


def test_second_compaction_reads_mixed_tiers(spark, tiered):
    idx, queries, _, _ = tiered
    before = _results(spark, idx, queries)
    # no codec arg: recompacts BOTH the pfor cold chunk and the varint
    # append back onto the serving default — markers must disappear
    man_before = load_manifest(idx)
    man2 = compact_index(spark, idx, fill_threshold=0.99, min_chunks=2)
    assert man2["compactions"] == man_before["compactions"] + 1
    # the rewritten chunks land back on the serving default (no marker);
    # index_codec degrades to the plain str once no override remains
    old_marked = {
        int(c) for c, v in man_before["chunks"].items() if "codec" in v
    }
    man = load_manifest(idx)
    new_marked = {int(c) for c, v in man["chunks"].items() if "codec" in v}
    assert not (new_marked - old_marked)
    if not new_marked:
        assert index_codec(man) == "varint"
    assert _results(spark, idx, queries) == before


def test_codec_guard():
    with pytest.raises(ValueError, match="unknown codec"):
        compact_index(None, "/nonexistent", codec="zstd")
