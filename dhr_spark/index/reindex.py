"""Reindex: rebuild an index from its own stored fields — the
Elasticsearch ``_reindex`` analogue.

``reindex`` reads the LIVE documents (committed tombstones excluded) of a
``stored=True`` index and builds a fresh index at ``dst_dir`` — no access
to the original corpus needed, which is the whole point: change the
analyzer, chunk geometry, artifact set (add positions / forward index /
docvalues), or pruning policy of a serving index from the index itself.
An optional ``transform(df) -> df`` hook is ES's reindex script — it sees
(docid, text, <doc_map columns>) and may rewrite text or docvalue columns
(it must keep docid unique and non-null).

Docids are PRESERVED, not reassigned: v2 docids are position-independent
(chunk = docid >> chunk_bits works for any chunk_bits), so the rebuild
never pays a global sort and deleted docs simply leave gaps — the
reindexed output is exactly the index a fresh ``build_index_from_docs``
over the live corpus would produce (pinned by tests). Deleted docs are
compacted away (no tombstones in dst); committed docvalue-update
generations are baked into dst's doc_map (latest-generation-wins), so dst
starts with a clean dv_gens slate.

Scale shape: one stored-fields scan + one doc_map join feed the standard
build pipeline; nothing here adds a shuffle beyond the build's own. At
10^12 turns a reindex is exactly one full build — the unavoidable cost of
changing the analyzer — with IO in place of re-ingest.

Reference anchor: Elasticsearch ``_reindex`` (source index -> new index
with new settings/mappings); Lucene has no in-place analyzer change
either — Solr/ES docs prescribe reindex-from-stored-fields, which is
this operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.index.builder import (
    build_index_from_docs,
    load_manifest,
    read_tombstones,
)

_INHERITED = (
    "analyzer_mode",
    "chunk_bits",
    "block_size",
    "k1",
    "b",
    "forward_index",
    "positional",
    "stored",
    "docvalues",
    "prune_per_term",
)


def reindex(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    transform=None,
    **overrides,
) -> dict:
    """Rebuild ``src_dir``'s live documents into a fresh index at
    ``dst_dir``. Build parameters inherit from the source manifest;
    ``overrides`` replace any of analyzer_mode / chunk_bits / block_size /
    k1 / b / forward_index / positional / stored / docvalues /
    prune_per_term / index_sort. Returns the new manifest.

    ``index_sort`` inherits too; because docids are preserved, the
    inherited sort invariant carries over verbatim under the same
    chunk_bits (the build re-verifies it and fails loudly rather than
    mis-rank if an override broke it — pass index_sort=None to drop the
    sort instead)."""
    man = load_manifest(src_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {src_dir}")
    if not man.get("stored"):
        raise ValueError(
            "reindex needs the source's stored fields (build_index(..., "
            "stored=True)) — without them the original text is gone"
        )
    bad = set(overrides) - set(_INHERITED) - {"index_sort"}
    if bad:
        raise ValueError(f"unknown reindex overrides: {sorted(bad)}")

    committed = [int(c) for c in man["chunks"]]
    stored = (
        spark.read.parquet(os.path.join(src_dir, "stored"))
        .filter(F.col("chunk").isin(committed))
        .select("docid", "text")
    )
    tomb = read_tombstones(spark, src_dir, man)
    if tomb is not None:
        stored = stored.join(tomb, "docid", "left_anti")

    docs = stored
    dm_path = os.path.join(src_dir, "doc_map")
    doc_map_df = None
    if os.path.isdir(dm_path):
        dm = spark.read.parquet(dm_path).drop("seg_batch")
        dv_cols = [c for c in dm.columns if c != "docid"]
        if dv_cols:
            from dhr_spark.index.dvupdate import overlay_fields

            dm = overlay_fields(
                spark, src_dir, man,
                dm,
                [c for c in dv_cols if c in man.get("dv_gens", {})],
            )
        docs = stored.join(dm, "docid")
    if transform is not None:
        docs = transform(docs)
        if "docid" not in docs.columns or "text" not in docs.columns:
            raise ValueError(
                "transform must keep the (docid, text) columns"
            )
    if os.path.isdir(dm_path):
        doc_map_df = docs.drop("text")

    params = {k: man.get(k) for k in _INHERITED}
    iso = man.get("index_sort")
    params["index_sort"] = (
        (iso["field"], bool(iso["ascending"])) if iso else None
    )
    params.update(overrides)
    if params.get("docvalues") is None:
        params["docvalues"] = []
    return build_index_from_docs(
        spark,
        docs.select(
            "docid", "text",
        ) if doc_map_df is None else docs,
        dst_dir,
        doc_map_df=doc_map_df,
        **params,
    )
