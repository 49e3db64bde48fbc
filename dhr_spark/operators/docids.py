"""Stable dense docid assignment under (conv_id ASC, turn_idx ASC).

The reference assigns docids positionally in file/line order and maps results
back through a positional lookup (/root/reference/densify/densify_corpus.py:83;
/root/reference/retrieval/gip_retrieval.py:336-341). Our invariant
(BASELINE.json input_hint): per-turn text equality under stable turn ordering.

Two strategies:
  * ``window``   — row_number() over a global order. Correct but serializes
    the final numbering through a single partition; fine to ~10^7 rows.
  * ``scalable`` — repartitionByRange(conv_id, turn_idx) + sortWithinPartitions
    + per-partition counts -> cumulative offsets (tiny driver array) ->
    offset + local row index. No global single-partition sort; this is the
    path that holds at 10^12 turns. Deterministic for a given partitioning;
    the (docid <-> conv_id, turn_idx) mapping is materialized in doc_map so
    downstream consumers never depend on re-derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ["conv_id", "turn_idx"]


def with_global_ids(
    df: DataFrame,
    order_exprs: list,
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 0-based int64 ids in the global order of ``order_exprs``,
    WITHOUT a global sort through one partition.

    Two-phase: repartitionByRange on the order + sortWithinPartitions, then
    per-partition counts -> exclusive prefix offsets (tiny driver array) ->
    offset + local row index. The local index comes from
    monotonically_increasing_id() = (partition_id << 33) + row-index — NOT a
    Window.partitionBy(_pid), which would hash-shuffle N partition ids into
    N buckets WITH COLLISIONS, silently capping stage parallelism (measured
    ~5 busy cores of 8). Bound: <= 2^33 rows per partition.

    The materialized base is an EAGER LOCAL CHECKPOINT, not a persist().
    Every pass (the counts collect and each later consumer job) must see
    the SAME sampled range bounds and row order, but a plain cache is not
    a guarantee of that: RangePartitioner re-samples with a fresh seed on
    recomputation, and Spark SILENTLY recomputes a cached frame whenever
    its cache is invalidated — most insidiously when a consumer OVERWRITES
    a directory that appears in the frame's own read lineage (CacheManager
    invalidates-by-path on InsertIntoHadoopFsRelation; measured: a
    compaction numbering read from doclens/, then the new doclens write
    invalidated it, and the remaining sidecar rewrites renumbered ~90% of
    docids differently — doc_map/stored disagreeing with segments).
    localCheckpoint truncates the lineage to the materialized blocks: no
    path dependency to invalidate, and recomputation is impossible — a
    lost block fails the job loudly instead of corrupting ids. Blocks are
    MEMORY_AND_DISK and are released when the frame is garbage-collected
    (the ``_dhr_persisted`` unpersist handle remains for caller
    compatibility; on a checkpointed frame it is a no-op).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *order_exprs).sortWithinPartitions(
        *order_exprs
    )
    with_pid = parted.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    counts = {r["_pid"]: r["cnt"] for r in
              with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    if not counts:
        # empty input: create_map() with zero entries is not a valid
        # expression — return the (empty) frame with the id column typed
        out = with_pid.drop("_pid").withColumn(id_col, F.lit(0).cast("long"))
        out._dhr_persisted = with_pid
        return out
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offmap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    local = F.monotonically_increasing_id() - (
        F.col("_pid").cast("long") * F.lit(1 << 33)
    )
    out = (
        with_pid.withColumn(id_col, (offmap[F.col("_pid")] + local).cast("long"))
        .drop("_pid")
    )
    # hand the persisted base to the caller: the cache must live until the
    # numbered rows are materialized, so it cannot be released here — callers
    # (index.builder) unpersist it once their jobs have run
    out._dhr_persisted = with_pid
    return out


def with_docids(
    transcripts: DataFrame,
    strategy: str = "scalable",
    num_partitions: int | None = None,
    order: list | None = None,
) -> DataFrame:
    """Returns transcripts + ``docid`` (int64, dense, 0-based, ordered by
    (conv_id, turn_idx) — or by ``order`` (a list of Column sort
    expressions) when given: the index-sort build path prepends its sort
    field so docid order IS the index sort order."""
    order_exprs = order or [F.col(c).asc() for c in ORDER_COLS]
    if strategy == "window":
        w = Window.orderBy(*order_exprs)
        # cast: row_number is int32, but docid is contractually int64 — the
        # scalable path emits int64, and an int64 append onto an
        # int32-built artifact leaves mixed parquet schemas that fail at
        # read time (PARQUET_COLUMN_DATA_TYPE_MISMATCH)
        return transcripts.withColumn(
            "docid", (F.row_number().over(w) - 1).cast("long")
        )

    return with_global_ids(transcripts, order_exprs, "docid", num_partitions)


def doc_map(docs: DataFrame, extra: tuple[str, ...] | list[str] = ()) -> DataFrame:
    """(docid, conv_id, turn_idx, *extra) dimension table — the positional
    docid lookup of the reference (gip_retrieval.py:336-341) as a
    broadcastable dim. ``extra`` columns are DOCVALUES (Lucene's columnar
    per-doc fields): carried for sort-by-field and result faceting.
    Base columns double as docvalues already, so declaring one in
    ``extra`` (docvalues=["turn_idx"]) dedupes instead of producing a
    duplicate-column doc_map that fails at parquet-write time; repeats
    WITHIN extra (--docvalues ts,ts) dedupe the same way."""
    base = {"docid", *ORDER_COLS}
    dv = [c for c in dict.fromkeys(extra) if c not in base]
    return docs.select("docid", *ORDER_COLS, *dv)
