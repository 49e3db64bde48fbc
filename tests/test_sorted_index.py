"""Index-time sorting (Lucene IndexWriterConfig.setIndexSort) + the
early-terminating search_sorted fast path.

Exactness contract: the fast path (per-chunk first-k presence cut + a
candidate-only field join and window) must be bit-identical to the
exhaustive path on an unsorted index over the same corpus — across
appends, deletes, and direction mismatches (which must fall back)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dhr_spark.data.synthetic import synth_queries, synth_transcripts
from dhr_spark.index.builder import build_index, load_manifest
from dhr_spark.index.incremental import append_to_index
from dhr_spark.operators.wand import Searcher

CB, BS = 6, 16


def _keyed(spark, idx, q, k=12, ascending=False):
    """search_sorted results keyed by (conv, turn) so they compare across
    indexes whose docid spaces differ."""
    res = Searcher(spark, idx).search_sorted(q, by="ts", k=k,
                                             ascending=ascending)
    dm = spark.read.parquet(f"{idx}/doc_map")
    out = res.join(dm.select("docid", "conv_id", "turn_idx"), "docid")
    return sorted(
        (r.qid, r.conv_id, r.turn_idx, r.rank, str(r.ts))
        for r in out.collect()
    )


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("isort")
    tr = synth_transcripts(spark, 40, seed=3)
    s_idx, u_idx = str(root / "sorted"), str(root / "unsorted")
    man = build_index(spark, tr, s_idx, chunk_bits=CB, block_size=BS,
                      index_sort=("ts", False))
    build_index(spark, tr, u_idx, chunk_bits=CB, block_size=BS,
                docvalues=["ts"])
    assert man["index_sort"] == {"field": "ts", "ascending": False}
    assert "ts" in man["docvalues"]  # auto-declared
    return {"root": root, "tr": tr, "s": s_idx, "u": u_idx,
            "q": synth_queries(spark, 8)}


def test_fast_path_equals_exhaustive(spark, env):
    fast = _keyed(spark, env["s"], env["q"])
    slow = _keyed(spark, env["u"], env["q"])
    assert fast == slow and fast


def test_direction_mismatch_falls_back_exactly(spark, env):
    # ascending query on a descending-sorted index: exhaustive fallback
    fast = _keyed(spark, env["s"], env["q"], ascending=True)
    slow = _keyed(spark, env["u"], env["q"], ascending=True)
    assert fast == slow and fast


def test_kernel_emits_at_most_k_per_chunk(spark, env):
    # the early-termination cut itself: candidate rows <= n_chunks * k
    from dhr_spark.operators.wand import _presence_chunk

    s = Searcher(spark, env["s"])
    qinfo, all_terms = s._query_info(env["q"])
    qsets = {qid: tids for qid, (tids, _, _) in qinfo.items()}
    k = 3
    kern = _presence_chunk(qsets, BS, CB, limit=k)
    cand = (
        s._seg_for_terms(all_terms)
        .groupBy("chunk")
        .applyInPandas(kern, "qid string, docid long, n_hit long")
    )
    per = cand.withColumn(
        "chunk", F.shiftright("docid", CB)
    ).groupBy("qid", "chunk").count()
    assert per.agg(F.max("count")).collect()[0][0] <= k
    n_chunks = len(load_manifest(env["s"])["chunks"])
    full = s._matched_docs(env["q"]).count()
    assert cand.count() <= n_chunks * k * env["q"].count() < full


def test_append_preserves_fast_path_exactness(spark, env):
    s_idx = str(env["root"] / "sorted_app")
    build_index(spark, env["tr"], s_idx, chunk_bits=CB, block_size=BS,
                index_sort=("ts", False))
    extra = synth_transcripts(spark, 10, seed=99).withColumn(
        "conv_id", F.concat(F.lit("x"), F.col("conv_id"))
    )
    append_to_index(spark, extra, s_idx)
    u2 = str(env["root"] / "unsorted_union")
    build_index(spark, env["tr"].unionByName(extra), u2,
                chunk_bits=CB, block_size=BS, docvalues=["ts"])
    assert _keyed(spark, s_idx, env["q"]) == _keyed(spark, u2, env["q"])
    # the appended index keeps its sort metadata
    assert load_manifest(s_idx)["index_sort"]["field"] == "ts"


def test_append_missing_sort_field_raises(spark, env):
    s_idx = str(env["root"] / "sorted_guard")
    build_index(spark, env["tr"], s_idx, chunk_bits=CB, block_size=BS,
                index_sort=("ts", False))
    bad = synth_transcripts(spark, 3, seed=5).drop("ts").withColumn(
        "conv_id", F.concat(F.lit("y"), F.col("conv_id"))
    )
    with pytest.raises(ValueError, match="sort field"):
        append_to_index(spark, bad, s_idx)


def test_build_guards(spark, env):
    with pytest.raises(ValueError, match="not in transcript columns"):
        build_index(spark, env["tr"], str(env["root"] / "g1"),
                    chunk_bits=CB, block_size=BS, index_sort=("nope", True))
    with pytest.raises(ValueError, match="identity column"):
        build_index(spark, env["tr"], str(env["root"] / "g2"),
                    chunk_bits=CB, block_size=BS,
                    index_sort=("turn_idx", True))


def test_unsorted_generic_append_rejected(spark, env):
    # caller-assigned docids violating the per-chunk invariant must fail
    from dhr_spark.index.incremental import append_docs_to_index
    from dhr_spark.operators.docids import doc_map, with_docids

    s_idx = str(env["root"] / "sorted_generic")
    build_index(spark, env["tr"], s_idx, chunk_bits=CB, block_size=BS,
                index_sort=("ts", False))
    man = load_manifest(s_idx)
    chunk_docs = 1 << CB
    base = -(-int(man["next_docid"]) // chunk_docs) * chunk_docs
    extra = with_docids(
        synth_transcripts(spark, 6, seed=77).withColumn(
            "conv_id", F.concat(F.lit("z"), F.col("conv_id"))
        )
    ).withColumn("docid", F.col("docid") + F.lit(base))
    # corpus-order docids on a ts-desc index: within-chunk order broken
    with pytest.raises(ValueError, match="index_sort contract violated"):
        append_docs_to_index(spark, extra, s_idx)


def test_delete_respected_by_fast_path(spark, env):
    from dhr_spark.index.delete import delete_docs

    s_idx = str(env["root"] / "sorted_del")
    build_index(spark, env["tr"], s_idx, chunk_bits=CB,
                block_size=BS, index_sort=("ts", False))
    top = Searcher(spark, s_idx).search_sorted(env["q"], by="ts", k=5)
    victims = [r.docid for r in top.filter(F.col("rank") == 1).collect()]
    delete_docs(spark, s_idx, docids=victims, exact_stats=False)
    after = Searcher(spark, s_idx).search_sorted(env["q"], by="ts", k=5)
    alive = {r.docid for r in after.collect()}
    assert not (set(victims) & alive)

def test_update_sort_field_refused(spark, env):
    # the docid layout physically encodes the sort field's order — an
    # overlay would silently break the early-termination cut (Lucene
    # forbids updating the index-sort field for the same reason)
    from dhr_spark.index.dvupdate import update_docvalues

    upd = spark.createDataFrame([(0, "2020-01-01 00:00:00")],
                                "docid long, ts string")
    with pytest.raises(ValueError, match="index_sort key"):
        update_docvalues(spark, env["s"], upd)


def test_compaction_resorts_merged_chunks(spark, env):
    # merging chunks from different appends in plain docid order would
    # interleave their ts ranges; compaction must re-sort (Lucene merges
    # re-sort segments under an index sort)
    from dhr_spark.index.builder import _assert_index_sorted
    from dhr_spark.index.compact import compact_index

    s_idx = str(env["root"] / "sorted_compact")
    build_index(spark, env["tr"], s_idx, chunk_bits=CB, block_size=BS,
                index_sort=("ts", False))
    for seed, tag in ((21, "a"), (22, "b")):
        extra = synth_transcripts(spark, 6, seed=seed).withColumn(
            "conv_id", F.concat(F.lit(tag), F.col("conv_id"))
        )
        append_to_index(spark, extra, s_idx)
    before = _keyed(spark, s_idx, env["q"])
    man = compact_index(spark, s_idx, fill_threshold=1.01)
    assert int(man.get("compactions", 0)) >= 1
    # per-chunk invariant holds on the rewritten layout…
    dm = spark.read.parquet(f"{s_idx}/doc_map")
    live = dm.join(
        spark.read.parquet(f"{s_idx}/doclens").select("chunk").distinct()
        .select(F.col("chunk").cast("long").alias("c")),
        F.shiftright("docid", CB) == F.col("c"), "left_semi",
    )
    _assert_index_sorted(live, ("ts", False), CB)
    # …and the fast path still returns the exact same hits
    assert _keyed(spark, s_idx, env["q"]) == before


def test_cursor_page_walk_reconstructs_ranking(spark, env):
    # searchAfter for field-sorted hits: page1 + page2(after=page1's last
    # row) must equal the one-shot top-10, on BOTH the early-terminating
    # sorted path and the exhaustive path
    for idx in (env["s"], env["u"]):
        s = Searcher(spark, idx)
        full = sorted((r.qid, r.docid, r.rank)
                      for r in s.search_sorted(env["q"], by="ts", k=10)
                      .collect())
        p1 = s.search_sorted(env["q"], by="ts", k=5)
        cur = {r.qid: (r.ts, r.docid)
               for r in p1.filter(F.col("rank") == 5).collect()}
        q2 = env["q"].filter(F.col("qid").isin(list(cur)))
        p2 = s.search_sorted(q2, by="ts", k=5, after=cur)
        got = sorted(
            [(r.qid, r.docid, r.rank) for r in p1.collect()]
            + [(r.qid, r.docid, r.rank + 5) for r in p2.collect()]
        )
        assert got == full and got


def test_cursor_fast_equals_exhaustive(spark, env):
    # the kernel-pushed cursor (per-(qid, chunk) start docids) must return
    # the exact rows the exhaustive cursor filter does
    s, u = Searcher(spark, env["s"]), Searcher(spark, env["u"])
    p1 = s.search_sorted(env["q"], by="ts", k=3)
    cur = {r.qid: (r.ts, r.docid)
           for r in p1.filter(F.col("rank") == 3).collect()}
    q2 = env["q"].filter(F.col("qid").isin(list(cur)))

    def keyed(idx, res):
        dm = spark.read.parquet(f"{idx}/doc_map")
        out = res.join(dm.select("docid", "conv_id", "turn_idx"), "docid")
        return sorted((r.qid, r.conv_id, r.turn_idx, r.rank, str(r.ts))
                      for r in out.collect())

    fast = keyed(env["s"], s.search_sorted(q2, by="ts", k=4, after=cur))
    # same cursor VALUES are valid on the unsorted twin only after mapping
    # docids through (conv, turn); rebuild them from its own page 1
    p1u = u.search_sorted(env["q"], by="ts", k=3)
    cur_u = {r.qid: (r.ts, r.docid)
             for r in p1u.filter(F.col("rank") == 3).collect()}
    slow = keyed(env["u"], u.search_sorted(q2, by="ts", k=4, after=cur_u))
    assert fast == slow and fast


def test_cursor_past_end_is_empty(spark, env):
    s = Searcher(spark, env["s"])
    tail = s.search_sorted(env["q"], by="ts", k=10_000)
    # keep only each qid's final row
    import collections
    by_q = collections.defaultdict(list)
    for r in tail.collect():
        by_q[r.qid].append(r)
    cur = {q: (rows[-1].ts, rows[-1].docid)
           for q, rows in ((q, sorted(v, key=lambda r: r.rank))
                           for q, v in by_q.items())}
    assert s.search_sorted(env["q"].filter(F.col("qid").isin(list(cur))),
                           by="ts", k=5, after=cur).count() == 0
