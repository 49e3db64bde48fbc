"""Explicit document deletion — Lucene ``IndexWriter.deleteDocuments``.

The reference serves Lucene/FAISS indexes that support deleting documents
without a rebuild (its Lucene backend — the index that
/root/reference/densify/output_vector.py:24-31 reads BM25 vectors from —
carries Lucene's liveDocs deleted-docs semantics; Anserini's underlying
``IndexWriter`` deletes by Term/Query and segment merges later purge
them). At 10^12-turn scale the same
need is GDPR-shaped: "remove these conversations from retrieval NOW" cannot
wait for a full rebuild over the source table. This module gives any
dhr_spark index (turn- or conversation-granularity) that operation, reusing
the tombstone machinery conversation appends introduced (index/conv.py):
deleted docids are written to the ``tomb_batch``-partitioned tombstone dir,
masked inside the WAND scoring kernel and anti-joined from every
positional/stored/docvalues surface, and physically purged by chunk
compaction (index/compact.py) — committed postings are never rewritten on
the delete path.

Two stats contracts, chosen per call:

* ``exact_stats=True`` (default; requires the forward index): the deleted
  docs' term-df / doclen contributions are subtracted exactly — a new
  versioned term dictionary is written with idf recomputed under the live
  n_docs, and manifest n_docs/total_dl/avgdl drop. Post-delete rankings are
  IDENTICAL to a fresh build over the corpus minus the deleted docs
  (tests/test_delete.py asserts score-for-score identity).
* ``exact_stats=False``: mask-only. This is literal Lucene semantics —
  ``IndexReader.docFreq`` and sumTotalTermFreq keep counting deleted docs
  until a merge rewrites the segment — so scores drift from a fresh build
  by the stale df/avgdl, while deleted docs still never surface. The
  manifest gains ``stale_stats: true``; chunk compaction preserves the
  drift (it clears postings, not dictionary stats — same as our exact-stats
  tombstones being "dead weight, not stats"); a full rebuild
  (streaming.compact_to_index) restores exactness.

Cost shape at scale: resolving the delete set is a docvalues-column filter
over doc_map (partition-pruned parquet), the stats subtraction is one
broadcast semi-join of the forward index against the delete set plus the
|V|-row dictionary rewrite every append already pays, and the tombstone
write is one tiny partition. The tombstone SET is driver-resident at query
time by design (Searcher bounds it with MAX_TOMBSTONES and demands
compaction beyond that), so unbounded deletes — "drop half the corpus" —
should be a filtered rebuild, not this path.

Crash contract: artifact writes are deterministic dynamic-partition
overwrites keyed by the op number; the manifest rewrite is the atomic
commit. A retry after a mid-crash recomputes the same delete set (prior
tombstones are read committed-only, builder.read_tombstones) and overwrites
the orphan partitions byte-for-byte before committing.
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.functions.bm25 import idf_col
from dhr_spark.index.builder import (
    _write_manifest,
    load_manifest,
    read_tombstones,
)


def _doclens_docids(spark: SparkSession, index_dir: str) -> DataFrame:
    """(docid) of every doc with at least one posting — exploded from the
    packed doclens arrays (the validation source of last resort when an
    index has neither doc_map nor forward index)."""
    import numpy as np
    import pandas as pd

    def gen(it):
        for pdf in it:
            for _, row in pdf.iterrows():
                arr = np.frombuffer(row["dls"], dtype=np.int32)
                nz = np.flatnonzero(arr)
                yield pd.DataFrame({"docid": nz + int(row["base_docid"])})

    return (
        spark.read.parquet(os.path.join(index_dir, "doclens"))
        .mapInPandas(gen, "docid long")
    )


def delete_docs(
    spark: SparkSession,
    index_dir: str,
    docids: Iterable[int] | DataFrame | None = None,
    match: tuple[str, Iterable] | None = None,
    exact_stats: bool = True,
) -> dict:
    """Tombstone documents in-place; returns the committed manifest.

    Exactly one of:
      ``docids`` — explicit global docids (list or a (docid) DataFrame);
      ``match``  — ``(field, values)`` over doc_map docvalues columns, the
                   ``deleteDocuments(Term)`` analogue (e.g.
                   ``("conv_id", ["c12", "c40"])`` on a conversation index,
                   ``("source", ["src3"])`` on a turn index built with
                   ``docvalues=["source"]``).

    Unknown docids / unmatched values are ignored (Lucene: deleting a
    non-existent term is a no-op); deleting every live document raises.
    """
    t0 = time.time()
    man = load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    if (docids is None) == (match is None):
        raise ValueError("pass exactly one of docids= or match=")
    if exact_stats and not man.get("forward_index"):
        raise ValueError(
            "exact_stats delete needs the forward index for df/dl "
            "subtraction — rebuild with build_index(forward_index=True), "
            "or pass exact_stats=False for Lucene-style mask-only deletion "
            "(stats drift until a full rebuild)"
        )

    dm_path = os.path.join(index_dir, "doc_map")
    has_doc_map = os.path.isdir(dm_path)
    if match is not None:
        if not has_doc_map:
            raise ValueError(
                "match= deletion selects over doc_map docvalues, and this "
                "index has no doc_map — build with doc_map_df/docvalues, "
                "or delete by explicit docids"
            )
        doc_map = spark.read.parquet(dm_path)
        field, values = match
        if field not in doc_map.columns:
            raise ValueError(
                f"doc_map has no column {field!r} (has "
                f"{sorted(set(doc_map.columns) - {'docid', 'seg_batch'})}); "
                "declare it at build time via doc_map_df/docvalues"
            )
        # match against CURRENT values: committed in-place docvalue updates
        # (index/dvupdate.py) overlay the build-time column, so deleting
        # ("status", ["expired"]) hits docs whose status was updated to
        # expired after indexing — Lucene deleteDocuments-after-
        # updateDocValues parity
        from dhr_spark.index.dvupdate import overlay_fields

        doc_map = overlay_fields(spark, index_dir, man, doc_map, [field])
        targets = doc_map.filter(
            F.col(field).isin([v for v in values])
        ).select("docid")
    else:
        if isinstance(docids, DataFrame):
            targets = docids.select("docid")
        else:
            targets = spark.createDataFrame(
                [(int(d),) for d in docids], "docid long"
            )
        # unknown ids are dropped, not tombstoned: a bogus id in the mask
        # is harmless to scoring but would inflate the manifest count that
        # gates MAX_TOMBSTONES. Validate against whichever live-docid
        # artifact exists — doc_map is optional (generic-corpus indexes
        # built without doc_map_df), the forward index next, doclens always
        if has_doc_map:
            valid = spark.read.parquet(dm_path).select("docid")
        elif man.get("forward_index"):
            valid = (
                spark.read.parquet(os.path.join(index_dir, "forward"))
                .select("docid")
                .distinct()
            )
        else:
            valid = _doclens_docids(spark, index_dir)
        targets = targets.join(valid, "docid", "left_semi")

    prior = read_tombstones(spark, index_dir, man)
    if prior is not None:
        targets = targets.join(prior, "docid", "left_anti")

    # driver snapshot, not cache: the set is bounded by the caller's delete
    # request and must be stable across the doc_map-reading writes below
    # (same hazard conv.py documents for its tomb_lazy)
    tomb_ids = sorted(int(r["docid"]) for r in targets.collect())
    n_new = len(tomb_ids)
    op_no = int(man.get("appends", 0)) + 1
    man2 = dict(man)
    if n_new == 0:
        return man2  # nothing new to delete — no-op, no manifest bump

    n_docs_live = int(man["n_docs"]) - n_new
    if exact_stats and n_docs_live <= 0:
        raise ValueError(
            "delete would remove every live document — drop the index "
            "instead"
        )
    tomb_new = spark.createDataFrame([(i,) for i in tomb_ids], "docid long")

    if exact_stats:
        fwd = spark.read.parquet(os.path.join(index_dir, "forward"))
        removed = fwd.join(F.broadcast(tomb_new), "docid")
        rm_df = removed.groupBy("term_id").agg(
            F.count("*").alias("df_rm"),
            F.sum("tf").cast("long").alias("ctf_rm"),
        )
        rm_dl = int(
            removed.select("docid", "dl")
            .distinct()
            .agg(F.coalesce(F.sum("dl"), F.lit(0)).alias("s"))
            .collect()[0]["s"]
        )
        total_dl = int(man["total_dl"]) - rm_dl
        # dictionary rows are KEPT at df=0 (Lucene keeps the term in the
        # dict until merge); idf of EVERY term moves because n_docs did
        old_raw = spark.read.parquet(
            os.path.join(index_dir, man.get("term_dict_dir", "term_dict"))
        )
        has_ctf = "ctf" in old_raw.columns
        old = old_raw.select(
            *(["term", "term_id", "df"] + (["ctf"] if has_ctf else []))
        )
        del_cols = [
            F.col("term"),
            F.col("term_id"),
            (F.col("df") - F.coalesce(F.col("df_rm"), F.lit(0))).alias("df"),
        ]
        if has_ctf:
            del_cols.append(
                (F.col("ctf") - F.coalesce(F.col("ctf_rm"), F.lit(0)))
                .cast("long").alias("ctf")
            )
        tdict = (
            old.join(rm_df, "term_id", "left")
            .select(*del_cols)
            .withColumn("idf", idf_col(F.col("df"), F.lit(n_docs_live)))
        )
        td_dir = f"term_dict_v{op_no}"
        tdict.write.mode("overwrite").parquet(
            os.path.join(index_dir, td_dir)
        )
        man2.update(
            {
                "n_docs": n_docs_live,
                "total_dl": total_dl,
                "avgdl": total_dl / n_docs_live,
                "term_dict_dir": td_dir,
            }
        )
    else:
        man2["stale_stats"] = True

    tomb_dir = os.path.join(
        index_dir, man.get("tombstones_dir", "tombstones")
    )
    (
        tomb_new.withColumn("tomb_batch", F.lit(op_no))
        .coalesce(1)
        .write.mode("overwrite")
        .options(partitionOverwriteMode="dynamic")
        .partitionBy("tomb_batch")
        .parquet(tomb_dir)
    )
    man2.update(
        {
            "appends": op_no,
            "tombstones": int(man.get("tombstones", 0)) + n_new,
            "last_delete": {
                "docs": n_new,
                "exact_stats": bool(exact_stats),
                "seconds": round(time.time() - t0, 2),
            },
        }
    )
    _write_manifest(index_dir, man2)
    return man2
