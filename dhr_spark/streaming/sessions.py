"""Streaming sessionization — a CUSTOM STATEFUL operator via
``applyInPandasWithState`` (the piece of the Structured Streaming surface
that windowed aggregation cannot express: session windows need per-key
mutable state with data-dependent boundaries).

Semantics = the batch ``operators/sessions.session_stats`` rollup,
incrementally: per user, events sorted by (ts, event_id) extend the open
session while the gap stays <= ``gap_minutes``; a larger gap CLOSES the
session, which is emitted immediately with the exact batch-rollup row
shape (user_id, session_seq, n_events, start_epoch, end_epoch,
duration_sec, total_value). The open tail session is held in state —
carried across micro-batches AND across query restarts via the
checkpoint — with an event-time timeout at ``end + gap``: when the
watermark passes it, the session can no longer be extended, fires, and
is emitted without any further event arriving.

State contract (one row per user): ``(next_seq, start_epoch, end_epoch,
n_events, total_value)`` where ``n_events == 0`` means "no open session,
counter only". The counter outlives session emission so session_seq
stays the batch-identical dense per-user index; state size is O(users),
the same bound as any per-user streaming aggregation (add a state-TTL
policy upstream if the key space is unbounded).

Late events beyond the watermark are dropped by the engine before the
function sees them, exactly like the windowed-agg path
(streaming/ingest.streaming_turn_counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, start_epoch long, "
    "end_epoch long, duration_sec long, total_value double"
)
_STATE_SCHEMA = (
    "next_seq long, start_epoch long, end_epoch long, n_events long, "
    "total_value double"
)
_COLS = [
    "user_id", "session_seq", "n_events", "start_epoch", "end_epoch",
    "duration_sec", "total_value",
]


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_minutes: int = 60,
) -> DataFrame:
    """(user_id, session_seq, n_events, start_epoch, end_epoch,
    duration_sec, total_value): streaming per-user session rollups over an
    events stream (event_id, ts, user_id, value, ...). Sessions closed by
    an in-batch gap emit in that micro-batch; the open tail emits when the
    event-time timeout fires. Rows match the batch session_stats exactly
    (tests pin emitted == batch minus still-open tails)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if int(gap_minutes) <= 0:
        raise ValueError(f"gap_minutes must be positive, got {gap_minutes}")
    gap_s = int(gap_minutes) * 60

    def fn(key, pdfs, state: GroupState):
        user = int(key[0])
        out = []

        def emit(seq, st, en, n, tv):
            out.append((user, seq, n, st, en, en - st, round(tv, 6)))

        if state.hasTimedOut:
            seq, st, en, n, tv = state.get
            if n > 0:
                emit(seq, st, en, n, tv)
            # keep the counter so the user's NEXT session continues the
            # dense per-user index; a closed state never re-arms a timeout
            state.update((seq + 1, 0, 0, 0, 0.0))
            yield pd.DataFrame(out, columns=_COLS)
            return

        ev = pd.concat(list(pdfs), ignore_index=True)
        ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
        epochs = ev["ts"].astype("datetime64[ns]").astype("int64") // 10**9
        values = ev["value"].fillna(0.0).astype("float64")

        if state.exists:
            seq, st, en, n, tv = state.get
        else:
            seq, st, en, n, tv = 0, 0, 0, 0, 0.0
        for t, v in zip(epochs.tolist(), values.tolist()):
            if n == 0:
                st, en, n, tv = t, t, 1, float(v)
            elif t - en > gap_s:
                emit(seq, st, en, n, tv)
                seq, st, en, n, tv = seq + 1, t, t, 1, float(v)
            else:
                en, n, tv = max(en, t), n + 1, tv + float(v)
        state.update((seq, st, en, n, tv))
        if n > 0:
            # fire once the watermark proves no event can extend the
            # session; must stay strictly ahead of the current watermark
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max((en + gap_s) * 1000, wm + 1))
        yield pd.DataFrame(out, columns=_COLS)

    return (
        events.withWatermark("ts", f"{int(watermark_minutes)} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
