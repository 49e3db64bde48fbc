"""Conversation-granularity index build + incremental refresh.

A conversation-level index stores ONE document per conv_id (turn texts
concatenated in stable turn order, operators/conversations.conv_documents).
New turns therefore do not just add documents — they CHANGE existing ones:
a turn appended to conversation c makes c's old document stale. This module
makes that sound without rebuilding:

  * ``build_conv_index``   — one doc per conversation, docids dense in
    conv_id order, doc_map (docid, conv_id, n_turns).
  * ``append_conversations`` — given the new turns AND the full updated
    transcripts source (an Iceberg table at scale: the affected-conv filter
    pushes down to its partition pruning), re-emits ONLY the affected
    conversations as brand-new docs past the next chunk boundary, and
    TOMBSTONES their previous docids. Tombstoned postings stay on disk
    (committed chunks are never rewritten) but never score: the WAND kernel
    masks them before both the theta bootstrap and top-k selection, and the
    positional/phrase paths anti-join them (operators/wand.py) — Lucene's
    deleted-docs model. A periodic compaction (plain rebuild over live
    docs) clears tombstones, exactly like a segment merge.

Exact-stats contract (what makes append == rebuild): the forward index
(required) holds every doc's (term_id, tf, dl) vector, so the append
subtracts the tombstoned docs' contributions from term df / n_docs /
total_dl and adds the batch's — the resulting dictionary, idf and avgdl
are IDENTICAL to a fresh build over the updated transcripts, and with dead
docs masked at scoring, ranked results match a full rebuild score-for-score
(verified per conv_id in tests/test_conv_incremental.py).

Cost shape at scale: conv_documents over the AFFECTED conversations only
(semi-join pushdown into the transcripts scan), one (chunk, term) shuffle
of the re-emitted docs, a broadcast-sized tombstone read of the forward
index, and the |V|-row dictionary rewrite every append already pays.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.functions.bm25 import idf_col
from dhr_spark.index.builder import (
    _write_manifest,
    build_index_from_docs,
    load_manifest,
    read_tombstones,
    write_positions,
)
from dhr_spark.index.segments import build_doclens, build_segments
from dhr_spark.operators.conversations import conv_documents
from dhr_spark.operators.docids import with_global_ids
from dhr_spark.operators.termfreq import doc_term_freqs


def _conv_docs_with_ids(transcripts: DataFrame) -> DataFrame:
    cd = conv_documents(transcripts)
    return with_global_ids(cd, [F.col("conv_id").asc()], "docid")


def build_conv_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    **kwargs,
) -> dict:
    """Build a conversation-granularity index. ``forward_index=True`` is
    forced on: the exact-stats append math needs the doc term vectors."""
    kwargs["forward_index"] = True
    docs = _conv_docs_with_ids(transcripts)
    extra = dict(kwargs.pop("extra_manifest", None) or {})
    extra.update({"granularity": "conversation", "tombstones": 0})
    try:
        return build_index_from_docs(
            spark,
            docs.select("docid", "text"),
            index_dir,
            doc_map_df=docs.select("docid", "conv_id", "n_turns"),
            extra_manifest=extra,
            **kwargs,
        )
    finally:
        cached = getattr(docs, "_dhr_persisted", None)
        if cached is not None:
            cached.unpersist()


def append_conversations(
    spark: SparkSession,
    new_turns: DataFrame,
    turns_all: DataFrame,
    index_dir: str,
    extra_manifest: dict | None = None,
) -> dict:
    """Fold new turns into a conversation-granularity index.

    ``new_turns``: the ingest batch (decides WHICH conversations changed).
    ``turns_all``: the full updated transcripts source including the batch
    (the affected-conv semi-join prunes its scan; at 10^12 turns this is the
    Iceberg table with conv_id partition/bucket pruning).
    """
    t0 = time.time()
    man = load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    if man.get("granularity") != "conversation":
        raise ValueError(
            "append_conversations requires an index built by "
            "build_conv_index (granularity=conversation); for turn-level "
            "indexes use index.incremental.append_to_index"
        )
    if not man.get("forward_index"):
        raise ValueError(
            "conversation append needs the forward index for exact df/dl "
            "subtraction; rebuild with build_conv_index"
        )
    chunk_bits = int(man["chunk_bits"])
    chunk_docs = 1 << chunk_bits
    base = -(-int(man["next_docid"]) // chunk_docs) * chunk_docs
    append_no = int(man.get("appends", 0)) + 1

    affected = new_turns.select("conv_id").distinct()
    ids = _conv_docs_with_ids(
        turns_all.join(F.broadcast(affected), "conv_id", "left_semi")
    )
    docs = ids.withColumn("docid", F.col("docid") + F.lit(base))

    # ---- tombstones: every live docid currently mapping to an affected
    # conversation (previous appends' re-emits included, already-tombstoned
    # rows excluded) ----
    doc_map = spark.read.parquet(os.path.join(index_dir, "doc_map"))
    # compaction (index/compact.py) clears covered tombstones into a fresh
    # VERSIONED dir and repoints the manifest; honor the pointer
    tomb_dir = os.path.join(index_dir, man.get("tombstones_dir", "tombstones"))
    tomb_lazy = doc_map.join(
        F.broadcast(affected), "conv_id", "left_semi"
    ).select("docid")
    prior_tombs = read_tombstones(spark, index_dir, man)
    if prior_tombs is not None:
        # committed batches only: an orphan partition from a crashed op was
        # never stats-accounted, so the retry must re-derive (and then
        # dynamic-overwrite) it rather than skip it (builder.read_tombstones)
        tomb_lazy = tomb_lazy.join(prior_tombs, "docid", "left_anti")
    # SNAPSHOT to the driver, not .cache(): tomb_new reads doc_map, and this
    # append REWRITES doc_map below — a lazy (or evicted-cache) re-evaluation
    # after that write would see the batch's own re-emitted docs and
    # tombstone them too (observed: 6 intended tombstones became 16). The
    # set is |affected convs| x versions — driver-bounded by construction.
    tomb_ids = sorted(int(r["docid"]) for r in tomb_lazy.collect())
    n_tomb = len(tomb_ids)
    tomb_new = spark.createDataFrame(
        [(i,) for i in tomb_ids], "docid long"
    )

    # ---- exact stats subtraction from the forward index ----
    fwd_dir = os.path.join(index_dir, "forward")
    fwd = spark.read.parquet(fwd_dir)
    removed = fwd.join(F.broadcast(tomb_new), "docid")
    rm_df = removed.groupBy("term_id").agg(
        F.count("*").alias("df_rm"),
        F.sum("tf").cast("long").alias("ctf_rm"),
    )
    rm_dl = (
        removed.select("docid", "dl")
        .distinct()
        .agg(F.coalesce(F.sum("dl"), F.lit(0)).alias("s"))
        .collect()[0]["s"]
    )

    try:
        fused = doc_term_freqs(docs, mode=man["analyzer_mode"]).cache()
        cs = fused.agg(
            F.count(F.when(F.col("first"), 1)).alias("n"),
            F.sum(F.when(F.col("first"), F.col("dl"))).alias("dl_sum"),
            F.max(F.when(F.col("first"), F.col("docid"))).alias("max_docid"),
        ).collect()[0]
        if int(cs["n"] or 0) == 0:
            raise ValueError("append batch affects no conversations")
        n_new, dl_new = int(cs["n"]), int(cs["dl_sum"])
        max_docid = int(cs["max_docid"])
        n_docs = int(man["n_docs"]) - n_tomb + n_new
        total_dl = int(man["total_dl"]) - int(rm_dl) + dl_new
        avgdl = total_dl / n_docs

        tfs = fused.filter(F.col("term").isNotNull())
        dls = fused.filter(F.col("first")).select("docid", "dl")

        # ---- dictionary merge: df - removed + batch; fresh ids for new
        # terms; idf recomputed for ALL terms under the live n_docs ----
        old_raw = spark.read.parquet(
            os.path.join(index_dir, man.get("term_dict_dir", "term_dict"))
        )
        has_ctf = "ctf" in old_raw.columns  # legacy dicts stay legacy
        old = old_raw.select(
            *(["term", "term_id", "df"] + (["ctf"] if has_ctf else []))
        )
        batch_df = tfs.groupBy("term").agg(
            F.count("*").alias("df_b"),
            F.sum("tf").cast("long").alias("ctf_b"),
        )
        joined = old.join(batch_df, "term", "full_outer").join(
            rm_df.withColumnRenamed("term_id", "_rm_tid"),
            F.col("term_id") == F.col("_rm_tid"),
            "left",
        )
        known_cols = [
            F.col("term"),
            F.col("term_id"),
            (
                F.coalesce(F.col("df"), F.lit(0))
                - F.coalesce(F.col("df_rm"), F.lit(0))
                + F.coalesce(F.col("df_b"), F.lit(0))
            ).alias("df"),
        ]
        if has_ctf:
            known_cols.append(
                (
                    F.coalesce(F.col("ctf"), F.lit(0))
                    - F.coalesce(F.col("ctf_rm"), F.lit(0))
                    + F.coalesce(F.col("ctf_b"), F.lit(0))
                ).cast("long").alias("ctf")
            )
        known = joined.filter(F.col("term_id").isNotNull()).select(*known_cols)
        fresh_base = with_global_ids(
            joined.filter(F.col("term_id").isNull()).select(
                "term", "df_b", "ctf_b"
            ),
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

        post = tfs.join(
            F.broadcast(tdict.select("term", "term_id")), "term"
        ).select("term_id", "docid", "tf", "dl")

        dyn = {"partitionOverwriteMode": "dynamic"}
        if man.get("positional"):
            write_positions(
                docs, tdict, index_dir, man["analyzer_mode"], chunk_bits,
                mode="overwrite", dynamic=True,
            )
        (
            post.withColumn(
                "chunk", F.shiftright(F.col("docid"), chunk_bits).cast("int")
            )
            .repartition("chunk")
            .write.mode("overwrite")
            .options(**dyn)
            .partitionBy("chunk")
            .parquet(fwd_dir)
        )
        if man.get("stored"):
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
        seg = build_segments(
            post, chunk_bits, int(man["block_size"]),
            man.get("codec", "varint"),
        )
        seg.repartition("chunk").write.mode("overwrite").options(
            **dyn
        ).partitionBy("chunk").parquet(os.path.join(index_dir, "segments"))
        build_doclens(dls, chunk_bits).write.mode("overwrite").options(
            **dyn
        ).partitionBy("chunk").parquet(os.path.join(index_dir, "doclens"))
        docs.select("docid", "conv_id", "n_turns").withColumn(
            "seg_batch", F.lit(append_no)
        ).write.mode("overwrite").options(**dyn).partitionBy(
            "seg_batch"
        ).parquet(os.path.join(index_dir, "doc_map"))
        tomb_new.withColumn("tomb_batch", F.lit(append_no)).write.mode(
            "overwrite"
        ).options(**dyn).partitionBy("tomb_batch").parquet(tomb_dir)
        td_dir = f"term_dict_v{append_no}"
        tdict.write.mode("overwrite").parquet(os.path.join(index_dir, td_dir))

        new_chunk_lo = base >> chunk_bits
        written = spark.read.parquet(
            os.path.join(index_dir, "segments")
        ).filter(F.col("chunk") >= new_chunk_lo)
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
                "tombstones": int(man.get("tombstones", 0)) + n_tomb,
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
    finally:
        cached = getattr(ids, "_dhr_persisted", None)
        if cached is not None:
            cached.unpersist()
