"""Query-driven bulk mutations — Elasticsearch ``_update_by_query`` /
``_delete_by_query`` (Lucene ``IndexWriter.deleteDocuments(Query)``).

The serving-tier composition of two primitives this index already has:

* the MATCH SET of a query — every live doc containing >= 1 analyzed query
  term (OR semantics, exactly ES's default ``match`` query), resolved with
  the docid-blocks-only presence kernel (``Searcher._matched_docs``):
  postings tf bytes are never read and nothing is scored, so the cost is a
  term-pushdown scan of the query terms' blocks, not a search;
* the MUTATION — ``index/dvupdate.update_docvalues`` (docvalue generation
  sidecars) for updates, ``index/delete.delete_docs`` (tombstones, exact or
  mask-only stats) for deletes.

An optional docvalues FILTER clause (``filter_field`` + ``lo``/``hi``/
``values``) gates the match set the way ES bool-filter context gates
``_delete_by_query`` — evaluated over CURRENT values (committed docvalue
updates overlay), so "delete docs matching 'error' whose status was
updated to retired" works.

``update_by_query`` assignments map field -> new value, where the value is
a literal or a pyspark ``Column`` over the doc's current doc_map columns
(committed updates overlaid): ``{"pop": F.col("pop") + 1}`` is ES's
``ctx._source.pop += 1`` painless script for numeric/keyword docvalues.

Scale shape: match-set resolution decodes only the query terms' docid
blocks (chunk-pruned parquet scan); the update write is O(|matches|)
sidecar rows; the delete is the tombstone path. Nothing rescans the corpus
and no postings are rewritten. Like ES, an unbounded match ("delete
everything containing 'the'") is the anti-pattern — delete_docs's
MAX_TOMBSTONES pressure and the every-live-doc guard push that case to a
filtered rebuild.

Reference anchor: the reference's Lucene backend (Anserini — the index
/root/reference/densify/output_vector.py:24-31 reads from) exposes
deleteDocuments(Query); ES layers update-by-query over the same reader.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dhr_spark.index.builder import load_manifest
from dhr_spark.index.delete import delete_docs
from dhr_spark.index.dvupdate import PROTECTED, update_docvalues


def _matched_set(
    searcher,
    query: str,
    filter_field: str | None,
    lo,
    hi,
    values,
) -> DataFrame:
    """(docid) live docs matching ``query`` (OR over analyzed terms),
    optionally gated by a docvalues predicate over current values."""
    if not isinstance(query, str) or not query.strip():
        raise ValueError("query must be a non-empty string")
    if filter_field is None and (
        lo is not None or hi is not None or values is not None
    ):
        raise ValueError("lo=/hi=/values= need filter_field=")
    spark = searcher.spark
    qdf = spark.createDataFrame([("q", query)], "qid string, text string")
    hits = searcher._matched_docs(qdf).select("docid").distinct()
    if filter_field is not None:
        if lo is None and hi is None and values is None:
            raise ValueError("filter_field= needs lo=, hi= and/or values=")
        dv = searcher.docvalues_frame([filter_field])
        if values is not None:
            dv = dv.filter(F.col(filter_field).isin(list(values)))
        if lo is not None:
            dv = dv.filter(F.col(filter_field) >= lo)
        if hi is not None:
            dv = dv.filter(F.col(filter_field) <= hi)
        hits = hits.join(dv.select("docid"), "docid", "left_semi")
    return hits


def update_by_query(
    spark: SparkSession,
    index_dir: str,
    query: str,
    assignments: dict,
    filter_field: str | None = None,
    lo=None,
    hi=None,
    values=None,
) -> dict:
    """ES ``_update_by_query``: set docvalues on every doc matching
    ``query`` (OR semantics over the index's analyzer), without reindexing.

    ``assignments``: field -> literal or pyspark Column over the doc's
    current doc_map columns (committed docvalue updates overlaid — a
    second run of ``{"pop": F.col("pop") + 1}`` increments again, exactly
    like re-running an ES script). Targets must be non-identity doc_map
    columns (update_docvalues validates types/NULLs).

    No matching docs -> no-op (no generation written, manifest unchanged) —
    ES reports ``updated: 0``. Returns the committed manifest."""
    from dhr_spark.index.dvupdate import overlay_fields
    from dhr_spark.operators.wand import Searcher

    if not assignments:
        raise ValueError("assignments must map >= 1 field to a new value")
    bad = sorted(set(assignments) & PROTECTED)
    if bad:
        raise ValueError(
            f"columns {bad} are identity columns, not docvalues — changing "
            "them is a reindex, not an update"
        )
    s = Searcher(spark, index_dir)
    import os

    dm_path = os.path.join(index_dir, "doc_map")
    if not os.path.isdir(dm_path):
        raise ValueError(
            "update_by_query needs a doc_map artifact — build with "
            "doc_map_df/docvalues"
        )
    dm = spark.read.parquet(dm_path).drop("seg_batch")
    missing = [f for f in assignments if f not in dm.columns]
    if missing:
        raise ValueError(
            f"docvalues {missing} not in this index's doc_map (has "
            f"{sorted(set(dm.columns) - PROTECTED - {'docid'})})"
        )
    hits = _matched_set(s, query, filter_field, lo, hi, values)
    # expression environment: current values (committed updates overlaid)
    env_fields = [
        f for f in (s.manifest.get("dv_gens") or {}) if f in dm.columns
    ]
    env = overlay_fields(spark, index_dir, s.manifest, dm, env_fields)
    upd = hits.join(env, "docid").select(
        "docid",
        *[
            (v if isinstance(v, Column) else F.lit(v)).alias(f)
            for f, v in assignments.items()
        ],
    )
    if upd.limit(1).count() == 0:
        return dict(load_manifest(index_dir))  # updated: 0 — no-op
    return update_docvalues(
        spark,
        index_dir,
        upd,
        extra_manifest={"last_update_by_query": {"query": query}},
    )


def delete_by_query(
    spark: SparkSession,
    index_dir: str,
    query: str,
    filter_field: str | None = None,
    lo=None,
    hi=None,
    values=None,
    exact_stats: bool = True,
) -> dict:
    """ES ``_delete_by_query`` / Lucene ``deleteDocuments(Query)``:
    tombstone every doc matching ``query`` (OR semantics), optionally gated
    by a docvalues filter over current values. ``exact_stats`` as in
    delete_docs (True = rankings equal a rebuild minus the deleted docs;
    False = Lucene mask-only docFreq drift). No matches -> no-op manifest.
    """
    from dhr_spark.operators.wand import Searcher

    s = Searcher(spark, index_dir)
    hits = _matched_set(s, query, filter_field, lo, hi, values)
    return delete_docs(spark, index_dir, docids=hits, exact_stats=exact_stats)
