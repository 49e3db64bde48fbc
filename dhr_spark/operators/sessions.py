"""Event-stream operators: gap sessionization, tumbling-window aggregation,
JSON field extraction.

Transcripts-adjacent: a training-data pipeline over agent logs needs to cut
event streams into sessions (the conversation-boundary problem when conv_id
is absent), window activity, and pull typed fields out of JSON props — all
as declarative plans (window functions + built-in JSON paths, no UDF).

Scale notes: sessionization is one window over (user, ts) — Spark shuffles
by user_id; skewed power-users are bounded by the gap cut itself (a session
never spans a gap), so AQE skew-join handling plus per-user ordering is
enough. Tumbling windows are a plain groupBy on a derived key (map-side
partial aggs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def sessionize(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MIN,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Adds ``session_seq``: per-user session index (0-based), new session
    when the gap to the previous event exceeds ``gap_minutes``.

    lag + conditional cumsum — the standard one-shuffle sessionization."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), "event_id")
    gap = F.col(ts_col).cast("timestamp").cast("long") - F.lag(F.col(ts_col).cast("timestamp").cast("long")).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_seq",
        (F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ) - 1).cast("long"),
    )


def session_stats(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MIN
) -> DataFrame:
    """(user_id, session_seq, n_events, start_ts, end_ts, duration_sec,
    total_value): per-session rollup."""
    s = sessionize(events, gap_minutes)
    # timestamps emitted as epoch seconds: timezone-annotation differences
    # between engines make raw timestamp value-hashes unstable
    return s.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(F.col("ts").cast("timestamp").cast("long")).alias("start_epoch"),
        F.max(F.col("ts").cast("timestamp").cast("long")).alias("end_epoch"),
        (F.max(F.col("ts").cast("timestamp").cast("long")) - F.min(F.col("ts").cast("timestamp").cast("long")))
        .cast("long")
        .alias("duration_sec"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def tumbling_counts(
    events: DataFrame, minutes: int = 60, ts_col: str = "ts"
) -> DataFrame:
    """(window_start, event_type, n, avg_value): tumbling-window aggregate.

    Batch twin of the Structured Streaming windowed agg (same F.window
    expression works under readStream with a watermark)."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), f"{minutes} minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            # exact integer-micros mean: per-row round-to-micros is exact
            # in both engines, the integer SUM is order-independent (float
            # summation order is not), and the single final division is
            # deterministic IEEE — round(avg(double),6) drew .xxxxxx5
            # midpoints at sf0.1 where Spark and DuckDB round apart
            (
                F.sum(F.round(F.col("value") * F.lit(1e6)).cast("long"))
                .cast("double")
                / (F.count("*") * F.lit(1_000_000)).cast("double")
            ).alias("avg_value"),
        )
        .select(
            F.col("w.start").cast("timestamp").cast("long").alias("window_epoch"),
            "event_type", "n", "avg_value",
        )
    )


def json_fields(events: DataFrame, props_col: str = "props") -> DataFrame:
    """(event_id, k): typed field from the JSON props column via JSON-path
    expressions (codegen'd, no UDF)."""
    return events.select(
        "event_id",
        F.get_json_object(F.col(props_col), "$.k").cast("long").alias("k"),
    )
