"""Sequence packing for LLM pretraining: concat-and-cut window assignment.

Pretraining pipelines concatenate every document's token stream in a fixed
global order and cut the stream into fixed-length training sequences
(GPT-style packing; T5 calls it "packing", HF calls it "grouping"). The
document-level view of that layout is a pure function of the exclusive
prefix sum of token counts:

    start_tok = sum of n_tokens over all docs ordered before this one
    pack_id   = start_tok // seq_len        (window the doc STARTS in)
    offset    = start_tok %  seq_len        (position inside that window)
    n_packs   = number of windows the doc spans (0 for empty docs)

so a planner can route each doc's tokens to its training shards without
ever materializing the concatenated stream.

The interesting part at 10^12 tokens is the PREFIX SUM. A
``Window.orderBy(id)`` cumsum executes as a single-partition sort — the
exact anti-pattern this repo's docid assignment already avoids
(operators/docids.with_global_ids). Same two-phase shape here, summing
instead of counting:

  1. ``repartitionByRange(id)`` + ``sortWithinPartitions`` — ordered,
     balanced partitions (eagerly local-checkpointed so both passes see
     the same sampled range bounds, recomputation-proof);
  2. per-partition token SUMS -> exclusive per-partition bases (a tiny
     driver array, one row per partition, broadcast back);
  3. one Arrow ``mapInPandas`` pass: local numpy cumsum + the partition
     base. No global sort, no shuffle beyond the range exchange, and the
     result is partitioning-independent.

Like with_global_ids, the range-partitioned base is an eager local
checkpoint that lives until the result is garbage-collected; the
``out._dhr_persisted`` handle remains for caller compatibility
(index/builder.py:98 documents the original hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_offsets(
    counts: DataFrame,
    seq_len: int,
    id_col: str = "docid",
    n_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, start_tok, pack_id, offset, n_packs) — the packing
    plan for a (id, n_tokens) table under doc-id-ordered concatenation
    into ``seq_len``-token windows. NULL counts read as 0, and so do
    NEGATIVE counts (``F.size`` yields -1, not NULL, for a NULL array —
    the common token-count idiom; an un-clamped -1 would silently walk
    the cumsum backwards and corrupt every later start_tok); empty docs
    occupy no window (n_packs 0) but still anchor a start position.

    ``id_col`` values must be UNIQUE: the concatenation order is defined
    by the id, so duplicate ids would receive arbitrary relative start
    positions (ties under sortWithinPartitions are not stable across
    runs). Every id producer in this repo (with_docids, doc_id synthesis)
    already guarantees uniqueness."""
    if int(seq_len) <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    seq = int(seq_len)
    spark = counts.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    base = counts.select(
        F.col(id_col).cast("long").alias(id_col),
        F.greatest(
            F.lit(0).cast("long"),
            F.coalesce(F.col(n_col).cast("long"), F.lit(0)),
        ).alias(n_col),
    )
    parted = base.repartitionByRange(n_parts, id_col).sortWithinPartitions(
        id_col
    )
    # eager local checkpoint, not persist: the sums pass and the numbering
    # pass MUST see identical range bounds and row order, and a cache can
    # be silently invalidated + recomputed with a fresh range sample
    # (operators/docids.with_global_ids documents the measured corruption)
    with_pid = parted.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    sums = {
        r["_pid"]: int(r["s"] or 0)
        for r in with_pid.groupBy("_pid").agg(F.sum(n_col).alias("s")).collect()
    }
    bases, acc = {}, 0
    for pid in sorted(sums):
        bases[pid] = acc
        acc += sums[pid]
    b_bases = spark.sparkContext.broadcast(bases)
    schema = (
        f"{id_col} long, {n_col} long, start_tok long, pack_id long, "
        "offset long, n_packs long"
    )

    def gen(it):
        import numpy as np

        running = None  # carries the local cumsum across Arrow batches
        for pdf in it:
            if len(pdf) == 0:
                continue
            if running is None:
                running = b_bases.value.get(int(pdf["_pid"].iloc[0]), 0)
            n = pdf[n_col].to_numpy(dtype="int64")
            ends = running + np.cumsum(n)
            start = ends - n
            running = int(ends[-1])
            off = start % seq
            out = pdf[[id_col, n_col]].copy()
            out["start_tok"] = start
            out["pack_id"] = start // seq
            out["offset"] = off
            out["n_packs"] = np.where(n == 0, 0, (off + n - 1) // seq + 1)
            yield out

    out = with_pid.mapInPandas(gen, schema)
    out._dhr_persisted = with_pid
    return out


def pack_stats(plan: DataFrame, seq_len: int) -> DataFrame:
    """One row of layout statistics for a pack_offsets plan: total tokens,
    window count, straddling docs, and the tail padding the final partial
    window would need — the numbers a shard planner sizes storage with."""
    if int(seq_len) <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    seq = int(seq_len)
    return plan.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.ceil(F.sum("n_tokens") / F.lit(seq)).cast("long").alias("n_packs"),
        F.sum(F.when(F.col("n_packs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("straddling_docs"),
        (
            (F.ceil(F.sum("n_tokens") / F.lit(seq)) * F.lit(seq))
            - F.sum("n_tokens")
        ).cast("long").alias("tail_padding"),
    )
