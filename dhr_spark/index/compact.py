"""Chunk compaction — the Lucene tiered-merge analogue for appended indexes.

Why it exists (scale rationale): every O(batch) incremental append
(index/incremental.py) allocates docids from the NEXT CHUNK BOUNDARY so it
only ever creates brand-new (chunk, term) groups — that is what makes
appends pure parquet writes with no read-modify-write. The cost is chunk
proliferation: a stream of small batches leaves a long tail of underfull
chunks, and chunks are the query-time parallel unit (one posting-list row,
one doclens row, one local-top-k slice per chunk), so at 10^12-turn scale a
years-long append history would degrade every query with per-chunk fixed
costs and small-file listing overhead. Lucene solves the identical problem
with background segment merges; this module is that merge, Spark-first.

What a compaction does: pick the underfull chunks (fill ratio below a
threshold), DECODE their posting lists back to (term_id, docid, tf) rows
(codec.varint_decode + segmented_cumsum_decode — the same kernels the WAND
scorer uses), remap the live docids into densely packed fresh chunks above
``next_docid``, re-encode with the ordinary build kernels
(segments.build_segments / build_doclens), rewrite the docid-keyed sidecar
artifacts (positions, forward index, doc_map), and atomically commit a
manifest whose chunk lineage drops the old chunks and adds the new ones.
Term ids, df, idf, n_docs, avgdl are all UNCHANGED — compaction moves
postings, it never rescores them — so search results are score-identical
by construction (verified in tests/test_compact.py against both the
pre-compaction index and a from-scratch rebuild).

Conversation-granularity indexes (index/conv.py) get the full Lucene
treatment: tombstoned docids inside the compacted chunks are DROPPED during
the rewrite and removed from the tombstone set — compaction is exactly the
"segment merge clears deletes" mechanism the tombstone model counts on to
stay under Searcher.MAX_TOMBSTONES. Corpus stats are untouched even then:
conversation appends already subtracted the superseded docs' contributions
exactly (conv.py), so tombstoned postings are dead weight, not stats.

Crash-safety protocol (the manifest rewrite is the single commit point,
exactly like build/append):

  1. write the remap table (old_docid, new_docid) to a versioned
     ``compactions/compact_<n>`` dir — lineage + the GC's work list;
  2. write the NEW chunk partitions of segments / doclens / positions /
     forward with dynamic partition overwrite — the new chunk ids start at
     a fresh boundary, so they never collide with live chunks and a
     crashed-and-retried compaction overwrites its own partial output;
  3. write the remapped doc_map rows to a NEW seg_batch partition — the
     stale rows under old seg_batches are left in place until GC, so a
     reader of the OLD manifest (crash before step 4) still resolves every
     old docid;
  4. commit the manifest: chunk lineage swapped, ``pending_gc`` recorded;
  5. GC (``gc_index``, run by default): rewrite the affected doc_map
     partitions minus the compacted docids, delete the dropped chunks'
     partition directories, clear ``pending_gc``. Every GC step is
     idempotent; a crash mid-GC is healed by re-running it.

Readers opened BEFORE a compaction keep working until its GC deletes the
old chunk files (step 5) — re-open Searchers after compaction, the same
contract as Lucene's IndexReader across merges. ``Searcher`` refuses to
serve an index whose manifest still carries ``pending_gc`` when the chunk
count exceeds its exact-isin pruning bound, because the <=max-chunk
fallback predicate could then read not-yet-deleted stale partitions.

Reference anchor: the reference merges per-split pickle indexes
single-node (/root/reference/retrieval/index.py:26-47,
merge_index.py); this is the distributed, incremental form of that merge.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.index.builder import (
    _write_manifest,
    load_manifest,
    read_tombstones,
)
from dhr_spark.index.segments import build_doclens, build_segments
from dhr_spark.index.codec import (
    codec_of,
    for_decode_stream,
    index_codec,
    pfor_decode_stream,
    segmented_cumsum_decode,
    varint_decode,
)
from dhr_spark.operators.docids import with_global_ids


def decode_doclens(dl_df: DataFrame) -> DataFrame:
    """Doclens chunk rows -> (docid, dl) for LIVE docs (dl > 0; zero slots
    are holes — boundary padding or empty-text docs — that own no postings)."""

    def _go(batches):
        for pdf in batches:
            outs = []
            for base, buf in zip(pdf["base_docid"], pdf["dls"]):
                arr = np.frombuffer(buf, dtype=np.int32)
                live = np.flatnonzero(arr)
                outs.append(
                    pd.DataFrame(
                        {
                            "docid": live.astype(np.int64) + int(base),
                            "dl": arr[live].astype(np.int64),
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return dl_df.mapInPandas(_go, "docid long, dl long")


def decode_segments(
    seg_df: DataFrame, block_size: int, codec: "str | dict" = "varint"
) -> DataFrame:
    """Segment rows -> (term_id, docid, tf) posting rows — the encode kernel
    (segments._encode_batch_arrow) run backwards. ``block_size`` is the
    index's fixed block length (manifest), which fully determines the
    per-block posting counts the gap decoder needs for its absolute
    restarts: every block holds block_size postings except the last.
    ``codec``: codec.index_codec(manifest) — a uniform codec str (varint
    LEB128 or FOR/PFOR bit-packed blocks), or a per-chunk {chunk: codec,
    -1: default} map for mixed-tier indexes (compact_index(codec=...))."""

    def _go(batches):
        for pdf in batches:
            tids, docids, tfs = [], [], []
            for chunk, tid, n, gaps_buf, tfs_buf, d_off, t_off in zip(
                pdf["chunk"], pdf["term_id"], pdf["n"], pdf["doc_gaps"],
                pdf["tfs"], pdf["block_doc_off"], pdf["block_tf_off"],
            ):
                ck = codec_of(codec, int(chunk))
                n = int(n)
                nblocks = -(-n // block_size)
                lens = np.full(nblocks, block_size, dtype=np.int64)
                lens[-1] = n - block_size * (nblocks - 1)
                if ck in ("for", "pfor"):
                    dec = (for_decode_stream if ck == "for"
                           else pfor_decode_stream)
                    sel = np.arange(nblocks)
                    d, _ = dec(
                        bytes(gaps_buf), np.asarray(d_off, dtype=np.int64),
                        lens, sel, restarts=True,
                    )
                    tf_v, _ = dec(
                        bytes(tfs_buf), np.asarray(t_off, dtype=np.int64),
                        lens, sel, restarts=False,
                    )
                else:
                    gaps = varint_decode(bytes(gaps_buf), n).astype(np.int64)
                    d = segmented_cumsum_decode(gaps, lens)
                    tf_v = varint_decode(bytes(tfs_buf), n).astype(np.int64)
                tids.append(np.full(n, int(tid), dtype=np.int64))
                docids.append(d)
                tfs.append(tf_v)
            if tids:
                yield pd.DataFrame(
                    {
                        "term_id": np.concatenate(tids),
                        "docid": np.concatenate(docids),
                        "tf": np.concatenate(tfs),
                    }
                )

    return seg_df.mapInPandas(_go, "term_id long, docid long, tf long")


def select_compactable(
    man: dict,
    chunk_live: dict[int, int],
    fill_threshold: float,
    max_chunks: int,
    min_chunks: int,
) -> list[int]:
    """Deterministic merge policy: the underfull chunks, smallest fill
    first, capped at ``max_chunks`` per run (a 10^12-turn index compacts
    incrementally across runs, like Lucene's tiered merges)."""
    chunk_docs = 1 << int(man["chunk_bits"])
    cand = [
        (live / chunk_docs, c)
        for c, live in chunk_live.items()
        if live / chunk_docs < fill_threshold
    ]
    if len(cand) < min_chunks:
        return []
    cand.sort()
    return sorted(c for _, c in cand[:max_chunks])


def compact_index(
    spark: SparkSession,
    index_dir: str,
    fill_threshold: float = 0.5,
    max_chunks: int = 10_000,
    min_chunks: int = 2,
    gc: bool = True,
    codec: str | None = None,
) -> dict:
    """Merge underfull chunks into densely packed fresh chunks.

    Returns the updated manifest (unchanged if nothing qualifies). Search
    results over the compacted index are identical — same (conv_id,
    turn_idx) ranking, same float64 BM25 scores — to both the pre-compaction
    index and a from-scratch rebuild; only docids and chunk layout move.

    ``codec``: re-encode the compacted chunks under this codec instead of
    the manifest default — the mixed-tier knob: fresh append chunks stay on
    the serving codec (varint: cheapest per-call decode) while compaction
    moves cold bulk into the packed FOR/PFOR layout (≈0.55x bytes;
    BASELINE.md codec microbench). The per-chunk choice is recorded in the
    manifest chunk entries and every decode path resolves it chunk-by-chunk
    (codec.index_codec/codec_of), so search, search_batch, merges and later
    compactions all read mixed tiers transparently.
    """
    if codec is not None and codec not in ("varint", "for", "pfor"):
        raise ValueError(f"unknown codec {codec!r}")
    t0 = time.time()
    man = load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    if int(man.get("version", 1)) < 2:
        raise ValueError("compaction requires a version>=2 index")
    if man.get("pending_gc"):
        # a prior compaction committed but its GC did not finish — heal
        # first so stale artifacts cannot shadow this run's bookkeeping
        man = gc_index(spark, index_dir)
    chunk_bits = int(man["chunk_bits"])
    chunk_docs = 1 << chunk_bits

    dl_all = spark.read.parquet(os.path.join(index_dir, "doclens")).filter(
        F.col("chunk").isin([int(c) for c in man["chunks"]])
    )
    # tombstoned docs are dead weight: they count as zero fill, and the
    # rewrite below drops them (the "merge clears deletes" contract)
    tomb: np.ndarray | None = None
    tomb_df = read_tombstones(spark, index_dir, man)
    if tomb_df is not None:
        tomb = np.array(
            sorted(int(r["docid"]) for r in tomb_df.collect()),
            dtype=np.int64,
        )
    live_rows = dl_all.select("chunk", "n_docs").collect()
    chunk_live = {int(r["chunk"]): int(r["n_docs"]) for r in live_rows}
    if tomb is not None and tomb.size:
        tomb_chunks = tomb >> chunk_bits
        for c, cnt in zip(*np.unique(tomb_chunks, return_counts=True)):
            if int(c) in chunk_live:
                chunk_live[int(c)] -= int(cnt)
    targets = select_compactable(
        man, chunk_live, fill_threshold, max_chunks, min_chunks
    )
    if not targets:
        return man

    comp_no = int(man.get("compactions", 0)) + 1
    batch_no = int(man.get("appends", 0)) + 1
    new_base = -(-int(man["next_docid"]) // chunk_docs) * chunk_docs
    target_set = set(targets)

    # ---- remap: live docids in the target chunks -> dense ids from
    # new_base, ordered by old docid (scalable two-phase numbering).
    # On a sorted index (manifest index_sort) the order is (field, old
    # docid) instead: merging chunks from different appends in plain
    # docid order would interleave their field ranges and break the
    # per-chunk sorted invariant search_sorted's early-termination cut
    # relies on — Lucene merges re-sort segments for the same reason ----
    # Remap source = doc_map rows of the target chunks, NOT the decoded
    # doclens alone: decode_doclens drops dl=0 slots, but some of those
    # are REAL docs — analyzed-empty (e.g. stopword-only) texts that own
    # no postings yet are counted in n_docs, doc_map, and the packed
    # doclens headers. A remap built without them would strand their
    # doc_map rows on dropped chunks (docids no reader can resolve) and
    # leave the compacted doclens headers short of doc_map — the exact
    # count mismatch check_index flags. The left join carries them
    # through with dl=0: they get fresh docids and zero slots, postings
    # and stored rows (which they never had) are unaffected.
    dm_live = (
        spark.read.parquet(os.path.join(index_dir, "doc_map"))
        .select("docid")
        .filter(
            F.shiftright(F.col("docid"), chunk_bits)
            .cast("int")
            .isin(targets)
        )
    )
    dl_t = dm_live.join(
        decode_doclens(dl_all.filter(F.col("chunk").isin(targets))),
        "docid",
        "left",
    ).select("docid", F.coalesce("dl", F.lit(0)).cast("long").alias("dl"))
    if tomb is not None and tomb.size:
        t_in = tomb[np.isin(tomb >> chunk_bits, np.array(targets))]
        if t_in.size:
            tdf = spark.createDataFrame(
                [(int(x),) for x in t_in], "docid long"
            )
            dl_t = dl_t.join(F.broadcast(tdf), "docid", "left_anti")
    else:
        t_in = np.empty(0, dtype=np.int64)
    iso = man.get("index_sort")
    if iso:
        dmf = spark.read.parquet(os.path.join(index_dir, "doc_map")).select(
            "docid", iso["field"]
        )
        dl_t = dl_t.join(dmf, "docid")
        f_ord = (
            F.col(iso["field"]).asc()
            if iso.get("ascending")
            else F.col(iso["field"]).desc()
        )
        order = [f_ord, F.col("docid").asc()]
    else:
        order = [F.col("docid").asc()]
    numbered = with_global_ids(dl_t, order, "_rank")
    remap = numbered.select(
        "docid",
        (F.col("_rank") + F.lit(new_base)).alias("new_docid"),
        "dl",
    ).cache()
    n_live = remap.count()
    numbered_cache = getattr(numbered, "_dhr_persisted", None)
    if n_live == 0:
        remap.unpersist()
        if numbered_cache is not None:
            numbered_cache.unpersist()
        return man

    comp_dir = os.path.join("compactions", f"compact_{comp_no}")
    remap.write.mode("overwrite").parquet(
        os.path.join(index_dir, comp_dir, "remap")
    )
    # From here on, the COMMITTED remap parquet is the one authoritative
    # mapping for every artifact rewrite below. The in-memory frame must
    # not be trusted across them: its lineage reads doclens/, and the new
    # doclens write below would invalidate its cache by path — Spark then
    # silently recomputes it with a FRESH range-partitioner sample, so the
    # sidecars written after that point would carry a DIFFERENT
    # old->new numbering than the segments/doclens written before it
    # (measured: ~90% of docids renumbered differently; doc_map/stored
    # text detached from the postings). with_global_ids is now
    # checkpoint-backed (recompute-proof) as well — this re-read makes the
    # compaction additionally immune to block loss on a real cluster: the
    # mapping used is by construction the one durably recorded for GC and
    # crash recovery.
    remap.unpersist()
    if numbered_cache is not None:
        numbered_cache.unpersist()
    numbered_cache = None
    remap = spark.read.parquet(os.path.join(index_dir, comp_dir, "remap"))
    # tombstones cleared by this merge: their postings die with the dropped
    # chunks, but their doc_map rows must die too (GC) — a later
    # conversation append re-deriving tombstones from doc_map would
    # otherwise resurrect them as phantom tombstone entries
    stale_ids = remap.select("docid")
    if t_in.size:
        cleared_df = spark.createDataFrame(
            [(int(x),) for x in t_in], "docid long"
        )
        cleared_df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, comp_dir, "cleared")
        )
        stale_ids = stale_ids.unionByName(cleared_df)

    # ---- postings: decode -> remap -> re-encode into fresh chunks ----
    seg_t = spark.read.parquet(os.path.join(index_dir, "segments")).filter(
        F.col("chunk").isin(targets)
    )
    post = (
        decode_segments(
            seg_t, int(man["block_size"]), index_codec(man)
        )
        .join(remap, "docid")
        .select(
            "term_id", F.col("new_docid").alias("docid"), "tf", "dl"
        )
    )
    dyn = {"partitionOverwriteMode": "dynamic"}
    out_codec = codec or man.get("codec", "varint")
    build_segments(
        post, chunk_bits, int(man["block_size"]), out_codec
    ).repartition(
        "chunk"
    ).write.mode("overwrite").options(**dyn).partitionBy("chunk").parquet(
        os.path.join(index_dir, "segments")
    )
    build_doclens(
        remap.select(F.col("new_docid").alias("docid"), "dl"), chunk_bits
    ).write.mode("overwrite").options(**dyn).partitionBy("chunk").parquet(
        os.path.join(index_dir, "doclens")
    )

    # ---- docid-keyed sidecars: pure remap rewrites ----
    def _remap_chunked(src_dir: str, cols: list[str]) -> None:
        src = spark.read.parquet(os.path.join(index_dir, src_dir)).filter(
            F.col("chunk").isin(targets)
        )
        (
            src.join(remap.select("docid", "new_docid"), "docid")
            .select(
                F.col("new_docid").alias("docid"),
                *cols,
                F.shiftright(F.col("new_docid"), chunk_bits)
                .cast("int")
                .alias("chunk"),
            )
            .repartition("chunk")
            .write.mode("overwrite")
            .options(**dyn)
            .partitionBy("chunk")
            .parquet(os.path.join(index_dir, src_dir))
        )

    if man.get("positional"):
        _remap_chunked("positions", ["term_id", "positions"])
    if man.get("forward_index"):
        _remap_chunked("forward", ["term_id", "tf", "dl"])
    if man.get("stored"):
        _remap_chunked("stored", ["text"])

    # ---- doc_map: new seg_batch partition; stale rows removed by GC so a
    # pre-commit reader still resolves old docids ----
    dm = spark.read.parquet(os.path.join(index_dir, "doc_map"))
    dim_cols = [c for c in dm.columns if c not in ("docid", "seg_batch")]
    affected = sorted(
        int(r["seg_batch"])
        for r in dm.join(stale_ids, "docid", "left_semi")
        .select("seg_batch")
        .distinct()
        .collect()
    )
    (
        dm.join(remap.select("docid", "new_docid"), "docid")
        .select(F.col("new_docid").alias("docid"), *dim_cols)
        .withColumn("seg_batch", F.lit(batch_no))
        .write.mode("overwrite")
        .options(**dyn)
        .partitionBy("seg_batch")
        .parquet(os.path.join(index_dir, "doc_map"))
    )

    # ---- docvalue update sidecars (index/dvupdate.py): compaction remaps
    # docids, so compacted docs' update rows move to their new docids in a
    # fresh VERSIONED dv dir (pointer flip in this commit, old dir GC'd);
    # rows of dead (tombstoned) compacted docs drop; untouched docs' rows
    # copy verbatim with their generations — latest-wins is preserved ----
    dv_gens = dict(man.get("dv_gens") or {})
    new_dv_rel = old_dv_rel = None
    if dv_gens:
        from dhr_spark.index.dvupdate import dv_dir as _dv_rel

        old_dv_rel = _dv_rel(man)
        new_dv_rel = f"dv_updates_v{comp_no}"
        for fld, g in dv_gens.items():
            rows = spark.read.parquet(
                os.path.join(index_dir, old_dv_rel, fld)
            ).filter(F.col("gen") <= int(g))
            in_target = (
                F.shiftright(F.col("docid"), chunk_bits)
                .cast("int")
                .isin(targets)
            )
            (
                rows.join(
                    remap.select(
                        F.col("docid").alias("_od"), "new_docid"
                    ),
                    rows["docid"] == F.col("_od"),
                    "left",
                )
                .filter(~in_target | F.col("new_docid").isNotNull())
                .select(
                    F.coalesce("new_docid", "docid").alias("docid"),
                    "value",
                    "gen",
                )
                .repartition(1)
                .write.mode("overwrite")
                .partitionBy("gen")
                .parquet(os.path.join(index_dir, new_dv_rel, fld))
            )

    # ---- tombstones: survivors outside the compacted chunks, written to a
    # VERSIONED dir so the old manifest's pointer stays valid on crash ----
    man2 = dict(man)
    if new_dv_rel is not None:
        man2["dv_dir"] = new_dv_rel
    if tomb is not None and tomb.size:
        remaining = tomb[~np.isin(tomb, t_in)]
        new_tomb_dir = f"tombstones_v{comp_no}"
        # tomb_batch-partitioned like the original dir, so later
        # conversation appends drop their new tombstone partitions into it
        # with the same dynamic-overwrite idempotence (conv.py)
        spark.createDataFrame(
            [(int(x), 0) for x in remaining], "docid long, tomb_batch int"
        ).coalesce(1).write.mode("overwrite").partitionBy("tomb_batch").parquet(
            os.path.join(index_dir, new_tomb_dir)
        )
        man2["tombstones"] = int(remaining.size)
        man2["tombstones_dir"] = new_tomb_dir

    # ---- manifest commit ----
    written = spark.read.parquet(os.path.join(index_dir, "segments")).filter(
        F.col("chunk") >= (new_base >> chunk_bits)
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
    chunks = {
        c: v for c, v in man["chunks"].items() if int(c) not in target_set
    }
    for r in metrics:
        chunks[str(r["chunk"])] = {
            "postings": int(r["postings"]),
            "bytes": int(r["bytes"]),
            "terms": int(r["terms"]),
            "skew_ratio": round(float(r["skew_ratio"]), 3),
        }
        if out_codec != man.get("codec", "varint"):
            # mixed-tier marker: this chunk decodes under its own codec
            chunks[str(r["chunk"])]["codec"] = out_codec
    man2.update(
        {
            "chunks": chunks,
            "next_docid": new_base + n_live,
            "appends": batch_no,
            "compactions": comp_no,
            "last_compaction": {
                "chunks_in": len(targets),
                "chunks_out": len(metrics),
                "docs_moved": int(n_live),
                "tombstones_cleared": int(t_in.size),
                "seconds": round(time.time() - t0, 2),
            },
            "pending_gc": {
                "chunks": targets,
                "doc_map_batches": affected,
                "remap_dir": comp_dir,
                # superseded dv-updates dir (pointer flipped above); []
                # when the index has no committed docvalue updates
                "dv_dirs": [old_dv_rel] if old_dv_rel is not None else [],
            },
        }
    )
    _write_manifest(index_dir, man2)
    if gc:
        man2 = gc_index(spark, index_dir)
    return man2


def gc_index(spark: SparkSession, index_dir: str) -> dict:
    """Finish a committed compaction: purge the compacted docids' stale
    doc_map rows, delete the dropped chunks' partition directories, clear
    ``pending_gc``. Idempotent — safe to re-run after any crash. Local-FS
    directory removal stands in for FileSystem.delete on a real cluster."""
    man = load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    pending = man.get("pending_gc")
    if not pending:
        return man
    remap = spark.read.parquet(
        os.path.join(index_dir, pending["remap_dir"], "remap")
    ).select("docid")
    cleared_path = os.path.join(index_dir, pending["remap_dir"], "cleared")
    if os.path.isdir(cleared_path):
        remap = remap.unionByName(
            spark.read.parquet(cleared_path).select("docid")
        )
    dm_path = os.path.join(index_dir, "doc_map")
    batches = [int(b) for b in pending["doc_map_batches"]]
    if batches:
        dm = spark.read.parquet(dm_path).filter(
            F.col("seg_batch").isin(batches)
        )
        kept = dm.join(remap, "docid", "left_anti")
        # dynamic overwrite rewrites each affected partition in place; a
        # partition whose rows were ALL compacted away must be deleted
        # explicitly (an empty write leaves the old files untouched)
        kept_batches = {
            int(r["seg_batch"])
            for r in kept.select("seg_batch").distinct().collect()
        }
        if kept_batches:
            kept.repartition("seg_batch").write.mode("overwrite").options(
                partitionOverwriteMode="dynamic"
            ).partitionBy("seg_batch").parquet(dm_path)
        for b in set(batches) - kept_batches:
            shutil.rmtree(
                os.path.join(dm_path, f"seg_batch={b}"), ignore_errors=True
            )
    # superseded dv-updates dirs (docvalue generations remapped into the
    # manifest's current dv_dir at compaction commit)
    for d in pending.get("dv_dirs") or []:
        shutil.rmtree(os.path.join(index_dir, d), ignore_errors=True)
    live = {int(c) for c in man["chunks"]}
    for art in ("segments", "doclens", "positions", "forward", "stored"):
        base = os.path.join(index_dir, art)
        if not os.path.isdir(base):
            continue
        for c in pending["chunks"]:
            if int(c) not in live:
                shutil.rmtree(
                    os.path.join(base, f"chunk={int(c)}"), ignore_errors=True
                )
    man2 = dict(man)
    man2.pop("pending_gc", None)
    _write_manifest(index_dir, man2)
    return man2
