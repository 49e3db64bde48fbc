"""In-place docvalues updates — Lucene ``IndexWriter.updateNumericDocValue``
/ ``updateDocValues``.

Lucene lets per-doc columnar fields (DocValues) change WITHOUT reindexing
the document: each update writes a new "DV generation" file that readers
overlay over the segment's base values, latest generation wins. This module
is that design on the index layout here:

* an update op writes, per updated field, one ``gen=N`` partition of
  ``(docid, value)`` rows under ``<index>/dv_updates/<field>/`` — typed per
  field (each field directory has a homogeneous parquet schema), sized by
  the UPDATE, not the corpus;
* the manifest records ``dv_gens: {field: N}`` as the commit point. Readers
  overlay only generations ``<= dv_gens[field]``, so a crash between the
  data write and the manifest rewrite leaves an invisible orphan that the
  retried op overwrites (the same idempotency contract as appends), and a
  ``Searcher(snapshot=)`` time-travel read sees exactly the generations that
  snapshot had committed;
* every docvalues read path goes through ONE overlay point
  (``overlay_fields``, used by ``Searcher.docvalues_frame``, delete-by-match
  and the SQL layer's doc_map view), so sort/facet/boost/recency/filtered
  search and ``delete_docs(match=)`` all see current values with no
  per-surface work.

Scale: an update costs O(|updates|) parquet writes + one manifest rewrite —
never a doc_map rewrite (the historical Lucene criticism of whole-field DV
generation files is avoided: our generation holds only the updated rows).
The read overlay is one join per overlaid field against the committed
update set; AQE broadcasts it when small, which is the common case
(freshness/popularity signals touch a hot subset).

Updatable fields are the declared docvalues columns only. The identity
columns (docid, conv_id, turn_idx — the per-turn text-equality contract)
and seg_batch are protected: changing them would alter corpus identity, the
thing reindexing exists for (Lucene likewise restricts updates to DV-only
fields).

Lifecycle interplay:
* appends — new docids are unaffected (update docids are validated below
  the manifest's next_docid, so a stale update can never mask a future
  doc);
* chunk compaction — compaction REMAPS docids, so it rewrites the update
  rows of compacted docs into a fresh versioned dv dir (pointer flip in the
  same manifest commit; dead docs' rows dropped) — index/compact.py;
* physical merge — a source index carrying uncommitted-by-dst generations
  is refused (fold or drop them first) rather than silently losing updates
  — index/merge.py.

Reference anchor: the reference mutates nothing in place (its index is a
pickled array snapshot); this is the serving-tier capability its Lucene
backend (pyserini/Anserini, /root/reference/densify/output_vector.py:15-31)
exposes as updateDocValues.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dhr_spark.index.builder import _write_manifest, load_manifest
from dhr_spark.operators.docids import ORDER_COLS

PROTECTED = frozenset({"docid", "seg_batch", *ORDER_COLS})

DV_DIR_DEFAULT = "dv_updates"


def dv_dir(manifest: dict) -> str:
    """Relative dv-updates dir for this manifest (compaction versions it)."""
    return manifest.get("dv_dir", DV_DIR_DEFAULT)


def read_dv_overlay(
    spark: SparkSession, index_dir: str, manifest: dict, field: str
) -> DataFrame | None:
    """(docid, value): the committed latest-wins update rows for ``field``,
    or None when the manifest records no committed generation."""
    g = int((manifest.get("dv_gens") or {}).get(field, 0))
    if g <= 0:
        return None
    rows = spark.read.parquet(
        os.path.join(index_dir, dv_dir(manifest), field)
    ).filter(F.col("gen") <= g)
    w = Window.partitionBy("docid").orderBy(F.col("gen").desc())
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("docid", "value")
    )


def overlay_fields(
    spark: SparkSession,
    index_dir: str,
    manifest: dict,
    dm: DataFrame,
    fields: list[str],
) -> DataFrame:
    """Overlay committed docvalue updates onto ``dm`` (any frame carrying
    ``docid`` plus the fields). No-op per field without committed gens."""
    for f in fields:
        ov = read_dv_overlay(spark, index_dir, manifest, f)
        if ov is None:
            continue
        tmp = f"__dv_{f}"
        dm = (
            dm.join(ov.withColumnRenamed("value", tmp), "docid", "left")
            .withColumn(f, F.coalesce(F.col(tmp), F.col(f)))
            .drop(tmp)
        )
    return dm


def update_docvalues(
    spark: SparkSession,
    index_dir: str,
    updates: DataFrame,
    extra_manifest: dict | None = None,
) -> dict:
    """Apply in-place docvalue updates: ``updates`` carries ``docid`` plus
    one column per field to update (values cast to the doc_map column's
    type; NULL values and duplicate/unknown-range docids are refused).
    Docids absent from the corpus (e.g. already deleted) are silently
    no-ops at read time, as Lucene's update-by-term is on no match.

    Idempotent under crash-and-retry; the manifest rewrite is the single
    atomic commit point. Returns the committed manifest."""
    t0 = time.time()
    man = load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    dm_path = os.path.join(index_dir, "doc_map")
    if not os.path.isdir(dm_path):
        raise ValueError(
            "docvalue updates need a doc_map artifact — build with "
            "doc_map_df/docvalues"
        )
    fields = [c for c in updates.columns if c != "docid"]
    if "docid" not in updates.columns or not fields:
        raise ValueError(
            "updates must carry a docid column plus at least one field "
            f"column (got {updates.columns})"
        )
    bad = sorted(set(fields) & PROTECTED)
    if bad:
        raise ValueError(
            f"columns {bad} are identity columns, not docvalues — changing "
            "them is a reindex, not an update"
        )
    iso = man.get("index_sort")
    if iso and iso["field"] in fields:
        # Lucene likewise forbids updating the index-sort field: the docid
        # layout physically encodes its order, and an overlaid value would
        # silently break search_sorted's early-termination cut
        raise ValueError(
            f"field {iso['field']!r} is this index's index_sort key — its "
            "order is baked into the docid layout; changing it is a "
            "reindex, not a docvalue update"
        )
    dm_schema = {
        f.name: f.dataType
        for f in spark.read.parquet(dm_path).schema.fields
    }
    missing = [f for f in fields if f not in dm_schema]
    if missing:
        raise ValueError(
            f"docvalues {missing} not in this index's doc_map (has "
            f"{sorted(set(dm_schema) - PROTECTED - {'docid', 'seg_batch'})})"
        )

    # one validation pass: docid bounds/dups/nulls + per-field null or
    # uncastable values (a cast that nulls a non-null input is refused)
    casted = updates.select(
        F.col("docid").cast("long").alias("docid"),
        *[F.col(f).cast(dm_schema[f]).alias(f) for f in fields],
    )
    checks = updates.select(
        F.count("*").alias("n"),
        F.count_distinct("docid").alias("nd"),
        F.max(F.col("docid").cast("long")).alias("hi"),
        F.count(F.when(F.col("docid").isNull(), 1)).alias("null_ids"),
        *[
            F.count(
                F.when(
                    F.col(f).isNull()
                    | F.col(f).cast(dm_schema[f]).isNull(),
                    1,
                )
            ).alias(f"bad_{i}")
            for i, f in enumerate(fields)
        ],
    ).collect()[0]
    if int(checks["n"]) == 0:
        raise ValueError("update batch is empty (0 rows)")
    if int(checks["null_ids"]):
        raise ValueError("update batch has NULL docids")
    if int(checks["n"]) != int(checks["nd"]):
        raise ValueError(
            "update batch has duplicate docids (latest-wins is defined "
            "ACROSS ops, not within one)"
        )
    if int(checks["hi"]) >= int(man["next_docid"]):
        raise ValueError(
            f"update docid {int(checks['hi'])} is beyond the corpus "
            f"(next_docid {int(man['next_docid'])}) — a stale update must "
            "never mask a future append's doc"
        )
    for i, f in enumerate(fields):
        if int(checks[f"bad_{i}"]):
            raise ValueError(
                f"field {f!r} has NULL or not-{dm_schema[f].simpleString()}"
                "-castable update values"
            )

    gens = dict(man.get("dv_gens") or {})
    base = dv_dir(man)
    for f in fields:
        g = int(gens.get(f, 0)) + 1
        (
            casted.select("docid", F.col(f).alias("value"))
            .withColumn("gen", F.lit(g))
            .repartition(1)
            .write.mode("overwrite")
            .options(partitionOverwriteMode="dynamic")
            .partitionBy("gen")
            .parquet(os.path.join(index_dir, base, f))
        )
        gens[f] = g

    man2 = dict(man)
    man2.update(
        {
            "dv_gens": gens,
            "last_dv_update": {
                "fields": fields,
                "rows": int(checks["n"]),
                "seconds": round(time.time() - t0, 2),
            },
        }
    )
    if extra_manifest:
        man2.update(extra_manifest)
    _write_manifest(index_dir, man2)
    return man2
