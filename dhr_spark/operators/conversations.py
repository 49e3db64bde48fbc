"""Conversation-level operators over multi-turn transcript tables.

The engine's input is an Iceberg-style table of transcript turns
(conv_id, turn_idx, role, text, tool, ts) — BASELINE.json input_hint. The
reference indexes flat passages (MS MARCO JSONL,
/root/reference/densify/tokenize_corpus.py:31-36); a transcripts corpus
additionally needs conversation-scoped reshaping upstream of indexing:

  * ``conv_documents``  — fold a conversation's turns into ONE document with
    STABLE turn ordering (the north-star per-row invariant: per-turn text
    equality under stable turn ordering). Implemented as a single groupBy
    with array_sort(collect_struct) — ordering is pinned by (turn_idx), not
    by arrival order, so the result is identical under any partitioning/AQE
    plan.
  * ``turn_context``    — sliding context (prev/next turn text) per turn via
    lag/lead over the (conv_id, turn_idx) window; the retrieval unit stays
    the turn but carries its dialogue neighborhood (context windows for
    training-data pipelines).
  * ``conv_role_stats`` — per-conversation role mix + length stats.
  * ``tool_usage``      — per-tool invocation counts with conversation reach
    (distinct convs), the agent-telemetry rollup.

Scale: every operator is ONE hash-shuffle keyed by conv_id (or tool) — the
natural partitioning for transcripts; a conversation's turns are bounded
(thousands, not millions), so per-group state is small and skew-safe. All
pure Column expressions; DuckDB oracle twins live in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conv_documents(turns: DataFrame, sep: str = " ") -> DataFrame:
    """(conv_id, n_turns, text): one document per conversation, turn texts
    concatenated in turn_idx order regardless of physical row order."""
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("turn_idx"), F.col("text")))
    )
    return turns.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.array_join(
            F.transform(ordered, lambda s: s["text"]), sep
        ).alias("text"),
    )


def turn_context(turns: DataFrame, before: int = 1, after: int = 1) -> DataFrame:
    """(conv_id, turn_idx, role, text, prev_text, next_text): each turn with
    its dialogue neighborhood (empty string at conversation edges)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_cols = [F.lag("text", i).over(w) for i in range(before, 0, -1)]
    next_cols = [F.lead("text", i).over(w) for i in range(1, after + 1)]
    return turns.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.concat_ws(" ", *[F.coalesce(c, F.lit("")) for c in prev_cols]).alias(
            "prev_text"
        ),
        F.concat_ws(" ", *[F.coalesce(c, F.lit("")) for c in next_cols]).alias(
            "next_text"
        ),
    )


def conv_role_stats(turns: DataFrame) -> DataFrame:
    """(conv_id, role, n_turns, total_chars, avg_chars): role mix per conv.

    avg_chars is rounded to 6 decimals for cross-engine value hashing."""
    return turns.groupBy("conv_id", "role").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.round(F.avg(F.length("text")), 6).alias("avg_chars"),
    )


def tool_usage(turns: DataFrame) -> DataFrame:
    """(tool, n_calls, n_convs): tool invocation rollup over tool turns."""
    return (
        turns.filter(F.col("tool").isNotNull())
        .groupBy("tool")
        .agg(
            F.count("*").cast("long").alias("n_calls"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
        )
    )


_BLOCK_JOIN_AGGS = {
    "max": F.max,
    "total": F.sum,
    "avg": F.avg,
    "min": F.min,
}


def block_join_topk(
    child_scores: DataFrame,
    child_parent: DataFrame,
    k: int = 1000,
    score_mode: str = "max",
) -> DataFrame:
    """(qid, docid=parent, rank, score): Lucene ToParentBlockJoinQuery.

    Turns (children) are scored by any ranking plan — BM25 slow path, the
    WAND index, QLD — and hits roll up to their parent conversation under a
    Lucene ``ScoreMode``: max | total | avg | min
    (org.apache.lucene.search.join.ScoreMode). ``child_scores`` is
    (qid, docid, score) at child granularity; ``child_parent`` maps
    (docid, parent). Parents with no matching child never appear (Lucene
    block-join semantics: the parent filter intersects matching children).

    Scale: the child scoring plan is untouched; the rollup adds ONE
    (qid, parent) hash aggregation over the hit set (|hits|, not corpus).
    When parent ids are arithmetic in the docid (conv_id = docid // turns),
    pass a projected mapping built from the hit set itself — the join then
    broadcasts. Scores are rounded to 6 decimals before ranking (same
    determinism contract as topk.SCORE_DECIMALS: avg division order and
    float sum order vary across engines; the round pins ties identically).
    """
    from dhr_spark.operators.topk import topk

    try:
        agg = _BLOCK_JOIN_AGGS[score_mode]
    except KeyError:
        raise ValueError(
            f"score_mode {score_mode!r} not one of {sorted(_BLOCK_JOIN_AGGS)}"
        )
    scored = (
        child_scores.join(child_parent, "docid")
        .groupBy("qid", "parent")
        .agg(F.round(agg("score"), 6).alias("score"))
        .select("qid", F.col("parent").alias("docid"), "score")
    )
    return topk(scored, k)
