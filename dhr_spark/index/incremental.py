"""Incremental index refresh: append new transcripts WITHOUT a rebuild.

A 10^12-turn index cannot be rebuilt per ingest batch. BM25 is a global
function — every insert moves idf (per-term df) and avgdl — which is why the
naive "append segments built under new stats" corrupts scoring. This module
makes appends sound by construction, exploiting two invariants of the v2
index layout:

  1. Segment rows are STATS-FREE: they store raw (gaps, tfs) and per-block
     (max_tf, min_dl). Query-time scoring applies the CURRENT idf/avgdl
     (term dictionary + manifest), and the block bound idf·f(max_tf, min_dl)
     is admissible under any stats (w monotone ↑tf ↓dl). Committed rows
     therefore never need re-encoding when the corpus grows.
  2. New docids start at the NEXT CHUNK BOUNDARY above the prior corpus
     (docid space is virtual — the skipped slots cost nothing), so an append
     only ever creates brand-new (chunk, term) groups and brand-new doclens
     chunks: pure parquet appends, no read-modify-write, and a crash before
     the manifest commit leaves orphan chunk files that the next run
     overwrites (the manifest is the atomic commit point, exactly like the
     resume path).

What an append updates:
  * term_dict — rewritten (small vs corpus): existing terms keep their ids
    with df += batch df; unseen terms get fresh ids after the old maximum;
    idf recomputed for ALL terms under the new n_docs.
  * doc_map / doclens / segments — appended (new chunks only).
  * manifest — n_docs, total_dl, avgdl (exact, from totals), n_terms,
    next_docid, appends counter, new chunk lineage.

Cost shape at scale: tokenize+TF of the BATCH only, one (chunk, term)
shuffle of the BATCH postings, a broadcast join against the updated term
dictionary, and one |V|-row dictionary rewrite. Nothing touches existing
postings.

Semantics: search results over base+batch are IDENTICAL (same scores) to a
full rebuild over the union corpus — docid assignment differs (appends pack
new docs after the boundary) but the (conv_id, turn_idx)-level ranking is
the same; verified in tests/test_incremental.py.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.functions.bm25 import idf_col
from dhr_spark.index.builder import _write_manifest, load_manifest
from dhr_spark.index.segments import build_doclens, build_segments
from dhr_spark.operators.docids import with_docids, with_global_ids
from dhr_spark.operators.termfreq import doc_term_freqs


def append_docs_to_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    extra_manifest: dict | None = None,
) -> dict:
    """Fold a batch of generic documents — (docid long, text string, plus
    every column the committed doc_map carries) — into an existing v2
    index, with CALLER-ASSIGNED docids.

    The transcript-shaped ``append_to_index`` allocates docids itself; this
    entry exists for layouts that allocate docids globally across several
    indexes (index/sharded.append_to_sharded routes one monotone docid
    space into per-range shards). The contract it enforces instead:

    * every batch docid must sit at-or-above the index's next chunk
      boundary (appends create only brand-new (chunk, term) groups — the
      same no-read-modify-write invariant as append_to_index), and
    * batch docids must be unique.

    Returns the updated manifest."""
    t0 = time.time()
    man = load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    if int(man.get("version", 1)) < 2:
        raise ValueError(
            "incremental append requires a version>=2 index (stats-free "
            "block bounds); rebuild once with the current builder"
        )
    chunk_docs = 1 << int(man["chunk_bits"])
    floor = -(-int(man["next_docid"]) // chunk_docs) * chunk_docs
    stats = docs.agg(
        F.min("docid").alias("lo"),
        F.count("*").alias("n"),
        F.count_distinct("docid").alias("nd"),
    ).collect()[0]
    if int(stats["n"]) == 0:
        raise ValueError("append batch is empty (0 documents)")
    if int(stats["n"]) != int(stats["nd"]):
        raise ValueError("append batch has duplicate docids")
    if int(stats["lo"]) < floor:
        raise ValueError(
            f"batch docid {int(stats['lo'])} is below the next chunk "
            f"boundary {floor} — appends may only create brand-new chunks"
        )
    base = (int(stats["lo"]) // chunk_docs) * chunk_docs
    iso = man.get("index_sort")
    if iso:
        # caller-assigned docids on a sorted index: verify the per-chunk
        # invariant over THIS batch (one lag-window pass, batch-sized) —
        # fail fast rather than let search_sorted mis-rank
        from dhr_spark.index.builder import _assert_index_sorted

        _assert_index_sorted(
            docs, (iso["field"], bool(iso.get("ascending"))),
            int(man["chunk_bits"]),
        )
    return _append_docs(spark, docs, index_dir, man, base, t0, extra_manifest)


def append_to_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    extra_manifest: dict | None = None,
) -> dict:
    """Fold a new batch of transcript turns into an existing v2 index.

    Returns the updated manifest. Raises if the index is missing or was
    built with a pre-v2 (stats-bound) layout. ``extra_manifest`` fields ride
    the atomic manifest commit (streaming compaction watermark).
    """
    t0 = time.time()
    man = load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    if int(man.get("version", 1)) < 2:
        raise ValueError(
            "incremental append requires a version>=2 index (stats-free "
            "block bounds); rebuild once with the current builder"
        )
    if man.get("granularity") == "conversation":
        raise ValueError(
            "this index is conversation-granularity: a turn-level append "
            "would register turns as new documents alongside the existing "
            "conversation docs; use index.conv.append_conversations"
        )
    chunk_bits = int(man["chunk_bits"])
    chunk_docs = 1 << chunk_bits
    # new docids start at the next chunk boundary: appends create only
    # brand-new (chunk, term) groups — no read-modify-write of committed rows
    base = -(-int(man["next_docid"]) // chunk_docs) * chunk_docs

    # keep a handle on the with_docids result itself: .withColumn returns a
    # NEW DataFrame without the _dhr_persisted attribute, and reading the
    # attribute off the derived frame would leak one cached copy of the
    # batch into executor storage per append (builder.py:98-103 hazard)
    order = None
    iso = man.get("index_sort")
    if iso:
        # a sorted index (builder.py index_sort) keeps its PER-CHUNK
        # invariant across appends: the batch's docids are assigned in the
        # index sort order, so the new chunks are internally sorted and
        # search_sorted's early-termination cut stays exact (the global
        # candidate merge re-ranks across chunks by field value)
        from dhr_spark.operators.docids import ORDER_COLS

        field = iso["field"]
        if field not in transcripts.columns:
            cl = man.get("clustered")
            if cl and field == "ckey":
                # clustered layout (index/reorder.py): the sort key is the
                # canonical text-derived MinHash key — re-derive it with the
                # committed shingle geometry (streaming refresh batches and
                # plain CLI appends never carry derived columns)
                from dhr_spark.index.reorder import with_cluster_key

                transcripts = with_cluster_key(
                    transcripts, int(cl["shingle_n"])
                )
            else:
                raise ValueError(
                    f"index is sorted by {field!r} — append batches must "
                    "carry the sort field"
                )
        f_ord = (
            F.col(field).asc() if iso.get("ascending") else F.col(field).desc()
        )
        order = [f_ord] + [F.col(c).asc() for c in ORDER_COLS]
    base_docs = with_docids(transcripts, order=order)
    docs = base_docs.withColumn("docid", F.col("docid") + F.lit(base))
    try:
        return _append_docs(spark, docs, index_dir, man, base, t0, extra_manifest)
    finally:
        cached = getattr(base_docs, "_dhr_persisted", None)
        if cached is not None:
            cached.unpersist()


def _append_docs(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    man: dict,
    base: int,
    t0: float,
    extra_manifest: dict | None = None,
) -> dict:
    if man.get("prune_per_term"):
        raise ValueError(
            "index was built with static pruning (prune_per_term="
            f"{man['prune_per_term']}) — the per-term cut is a corpus-global "
            "decision an append cannot extend consistently; rebuild with the "
            "new corpus to re-prune"
        )
    chunk_bits = int(man["chunk_bits"])
    fused = doc_term_freqs(docs, mode=man["analyzer_mode"]).cache()
    cs = fused.agg(
        F.count(F.when(F.col("first"), 1)).alias("n"),
        F.sum(F.when(F.col("first"), F.col("dl"))).alias("dl_sum"),
        F.max(F.when(F.col("first"), F.col("docid"))).alias("max_docid"),
    ).collect()[0]
    if int(cs["n"]) == 0:
        fused.unpersist()
        raise ValueError("append batch is empty (0 documents)")
    n_new, dl_new, max_docid = int(cs["n"]), int(cs["dl_sum"]), int(cs["max_docid"])
    n_docs = int(man["n_docs"]) + n_new
    total_dl = int(man["total_dl"]) + dl_new
    avgdl = total_dl / n_docs

    tfs = fused.filter(F.col("term").isNotNull())
    dls = fused.filter(F.col("first")).select("docid", "dl")

    # --- term dictionary merge: stable ids for known terms, fresh ids after
    # the old maximum for new ones (df_batch DESC, term ASC — deterministic)
    old_raw = spark.read.parquet(
        os.path.join(index_dir, man.get("term_dict_dir", "term_dict"))
    )
    # ctf is carried only when the prior dictionary has it (indexes built
    # before the column existed stay legacy — QLD raises a clear error there
    # rather than scoring from a half-populated column)
    has_ctf = "ctf" in old_raw.columns
    old_cols = ["term", "term_id", "df"] + (["ctf"] if has_ctf else [])
    old = old_raw.select(*old_cols)
    batch_df = tfs.groupBy("term").agg(
        F.count("*").alias("df_b"), F.sum("tf").cast("long").alias("ctf_b")
    )
    joined = old.join(batch_df, "term", "full_outer")
    known_cols = [
        F.col("term"),
        F.col("term_id"),
        (F.coalesce(F.col("df"), F.lit(0)) + F.coalesce(F.col("df_b"), F.lit(0)))
        .alias("df"),
    ]
    if has_ctf:
        known_cols.append(
            (
                F.coalesce(F.col("ctf"), F.lit(0))
                + F.coalesce(F.col("ctf_b"), F.lit(0))
            ).cast("long").alias("ctf")
        )
    known = joined.filter(F.col("term_id").isNotNull()).select(*known_cols)
    # fresh ids via the scalable two-phase scheme (no single-partition
    # global-sort window): a batch can introduce a large new-term tail
    fresh_base = with_global_ids(
        joined.filter(F.col("term_id").isNull()).select("term", "df_b", "ctf_b"),
        [F.col("df_b").desc(), F.col("term").asc()],
        "_new_id",
    )
    fresh_cols = [
        F.col("term"),
        (F.col("_new_id") + F.lit(int(man["n_terms"]))).cast("long").alias(
            "term_id"
        ),
        F.col("df_b").alias("df"),
    ]
    if has_ctf:
        fresh_cols.append(F.col("ctf_b").cast("long").alias("ctf"))
    fresh = fresh_base.select(*fresh_cols)
    tdict = (
        known.unionByName(fresh)
        .withColumn("idf", idf_col(F.col("df"), F.lit(n_docs)))
        .cache()
    )
    n_terms = tdict.count()
    fresh_cached = getattr(fresh_base, "_dhr_persisted", None)

    post = tfs.join(F.broadcast(tdict.select("term", "term_id")), "term").select(
        "term_id", "docid", "tf", "dl"
    )
    seg_path = os.path.join(index_dir, "segments")
    dl_path = os.path.join(index_dir, "doclens")
    new_chunk_lo = base >> chunk_bits
    append_no = int(man.get("appends", 0)) + 1
    # every write below is idempotent under crash-and-retry; the manifest
    # rewrite at the end is the single atomic commit point:
    #   * segments/doclens — dynamic partition overwrite of the BRAND-NEW
    #     chunk partitions (appends never touch committed chunks)
    #   * doc_map — dynamic overwrite of this append's seg_batch= partition
    #   * term dictionary — written to a VERSIONED directory referenced only
    #     by the new manifest; a crash leaves the old pointer valid
    dyn = {"partitionOverwriteMode": "dynamic"}

    # every artifact write below targets a disjoint path/partition and is
    # idempotent — submit them from driver threads so the small ones ride
    # the segment shuffle's stage tails (same overlap as the base build;
    # failures re-raise via .result(), the manifest rewrite stays the
    # single atomic commit point)
    def _w_positions():
        if not man.get("positional"):
            return
        from dhr_spark.index.builder import write_positions

        write_positions(
            docs, tdict, index_dir, man["analyzer_mode"], chunk_bits,
            mode="overwrite", dynamic=True,
        )

    def _w_forward():
        if not man.get("forward_index"):
            return
        (
            post.withColumn(
                "chunk", F.shiftright(F.col("docid"), chunk_bits).cast("int")
            )
            .repartition("chunk")
            .write.mode("overwrite")
            .options(**dyn)
            .partitionBy("chunk")
            .parquet(os.path.join(index_dir, "forward"))
        )

    def _w_stored():
        if not man.get("stored"):
            return
        (
            docs.select(
                F.shiftright(F.col("docid"), chunk_bits)
                .cast("int")
                .alias("chunk"),
                "docid",
                "text",
            )
            .repartition("chunk")
            .write.mode("overwrite")
            .options(**dyn)
            .partitionBy("chunk")
            .parquet(os.path.join(index_dir, "stored"))
        )

    def _w_segments():
        seg = build_segments(
            post, chunk_bits, int(man["block_size"]), man.get("codec", "varint")
        )
        seg.repartition("chunk").write.mode("overwrite").options(
            **dyn
        ).partitionBy("chunk").parquet(seg_path)

    def _w_doclens():
        build_doclens(dls, chunk_bits).write.mode("overwrite").options(
            **dyn
        ).partitionBy("chunk").parquet(dl_path)

    # doc_map append is schema-driven off the COMMITTED doc_map (transcript
    # indexes carry ORDER_COLS, generic-corpus indexes whatever doc_map_df
    # the build wrote) — the batch must supply those columns; validated
    # BEFORE any write so a bad batch fails fast. An index built without a
    # doc_map stays without one.
    dm_path = os.path.join(index_dir, "doc_map")
    dm_cols: list[str] | None = None
    if os.path.isdir(dm_path):
        dm_cols = [
            c
            for c in spark.read.parquet(dm_path).columns
            if c != "seg_batch"
        ]
        missing = [c for c in dm_cols if c not in docs.columns]
        if missing:
            raise ValueError(
                f"append batch is missing doc_map columns {missing} that "
                "the committed index carries"
            )

    def _w_doc_map():
        if dm_cols is None:
            return
        docs.select(*dm_cols).withColumn(
            "seg_batch", F.lit(append_no)
        ).write.mode("overwrite").options(**dyn).partitionBy(
            "seg_batch"
        ).parquet(dm_path)

    td_dir = f"term_dict_v{append_no}"

    def _w_tdict():
        tdict.write.mode("overwrite").parquet(os.path.join(index_dir, td_dir))

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as _ex:
        futures = [
            _ex.submit(f)
            for f in (
                _w_segments, _w_doclens, _w_doc_map, _w_tdict,
                _w_positions, _w_forward, _w_stored,
            )
        ]
        for fut in futures:
            fut.result()

    written = spark.read.parquet(seg_path).filter(
        F.col("chunk") >= new_chunk_lo
    )
    metrics = (
        written.groupBy("chunk")
        .agg(
            F.sum("n").alias("postings"),
            F.sum("bytes").alias("bytes"),
            F.count("*").alias("terms"),
            (F.max("n") / F.avg("n")).alias("skew_ratio"),
        )
        .collect()
    )
    chunks = dict(man["chunks"])
    for r in metrics:
        chunks[str(r["chunk"])] = {
            "postings": int(r["postings"]),
            "bytes": int(r["bytes"]),
            "terms": int(r["terms"]),
            "skew_ratio": round(float(r["skew_ratio"]), 3),
        }
    man2 = dict(man)
    man2.update(
        {
            "n_docs": n_docs,
            "avgdl": avgdl,
            "total_dl": total_dl,
            "next_docid": max_docid + 1,
            "n_terms": int(n_terms),
            "appends": append_no,
            "term_dict_dir": td_dir,
            "last_append_seconds": round(time.time() - t0, 2),
            "chunks": chunks,
        }
    )
    if extra_manifest:
        man2.update(extra_manifest)
    _write_manifest(index_dir, man2)
    fused.unpersist()
    tdict.unpersist()
    if fresh_cached is not None:
        fresh_cached.unpersist()
    return man2
