"""Stateful streaming sessionization (streaming/sessions.py,
applyInPandasWithState): in-batch gap closes emit immediately, the open
tail survives micro-batches AND query restarts via the checkpoint, and
the event-time timeout fires a session once the watermark proves it can
no longer be extended. All expectations hand-computed."""

from __future__ import annotations

import datetime as dt

import pytest

from dhr_spark.streaming.sessions import sessionize_stream

BASE = dt.datetime(2024, 1, 1)
GAP_MIN, WM_MIN = 30, 60


def _ev(eid, user, minute, value=1.5):
    return (eid, BASE + dt.timedelta(minutes=minute), user, value)


def _write(spark, rows, in_dir, name):
    """Land one parquet FILE inside the watched dir (the file stream
    source lists files, not nested directories)."""
    import glob
    import os
    import shutil

    tmp = f"{in_dir}__stage_{name}"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    ).coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(in_dir, exist_ok=True)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, f"{in_dir}/{name}.parquet")
    shutil.rmtree(tmp)


def _drain(spark, input_dir, ckpt, out_dir, seen=frozenset()):
    """Run one availableNow pass (parquet sink — the memory sink cannot
    recover from a checkpoint, so restarts need a real sink) and return
    the rows NEW in this pass."""
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(input_dir)
    q = (
        sessionize_stream(stream, gap_minutes=GAP_MIN,
                          watermark_minutes=WM_MIN)
        .writeStream.format("parquet").option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    all_rows = {
        (r["user_id"], r["session_seq"]):
            (r["n_events"], r["start_epoch"], r["end_epoch"],
             r["duration_sec"], r["total_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    return {k: v for k, v in all_rows.items() if k not in seen}


def _epoch(minute):
    return int((BASE + dt.timedelta(minutes=minute)).timestamp())


def test_stateful_sessionization_three_phases(spark, tmp_path):
    root = str(tmp_path)
    in_dir, ckpt, out = f"{root}/in", f"{root}/ckpt", f"{root}/out"

    # phase 1: u1 has a closed session {0,10} + open {50,60};
    # u2 closed {0} + open {100}; u3 open {0,20}
    _write(spark, [
        _ev(1, 1, 0), _ev(2, 1, 10), _ev(3, 1, 50), _ev(4, 1, 60),
        _ev(5, 2, 0), _ev(6, 2, 100),
        _ev(7, 3, 0), _ev(8, 3, 20),
    ], in_dir, "p1")
    got1 = _drain(spark, in_dir, ckpt, out)
    assert got1 == {
        (1, 0): (2, _epoch(0), _epoch(10), 600, 3.0),
        (2, 0): (1, _epoch(0), _epoch(0), 0, 1.5),
    }

    # phase 2 (query RESTART, same checkpoint): u1@200 gap-closes the held
    # {50,60}; u3@45 EXTENDS its held session (gap 25m <= 30m, and 45m is
    # past the restored 40m watermark so it is not late). The availableNow
    # drain then runs a final timer batch at watermark 200-60=140m, which
    # passes u2's held timeout (100+30=130m) and u3's extended one
    # (45+30=75m) -> both fire via EventTimeTimeout with no new event for
    # those users; u1's fresh tail (timeout 230m) stays held
    _write(spark, [_ev(9, 1, 200), _ev(10, 3, 45)], in_dir, "p2")
    got2 = _drain(spark, in_dir, ckpt, out, seen=set(got1))
    assert got2 == {
        (1, 1): (2, _epoch(50), _epoch(60), 600, 3.0),
        (2, 1): (1, _epoch(100), _epoch(100), 0, 1.5),
        (3, 0): (3, _epoch(0), _epoch(45), 2700, 4.5),
    }

    # phase 3: a fresh user's event at 300m pushes the watermark to 240m,
    # past u1's held timeout (200+30=230m) -> the tail fires with no
    # further u1 event; u4's own tail (330m) stays held
    _write(spark, [_ev(11, 4, 300)], in_dir, "p3")
    got3 = _drain(spark, in_dir, ckpt, out, seen=set(got1) | set(got2))
    assert got3 == {
        (1, 2): (1, _epoch(200), _epoch(200), 0, 1.5),
    }


def test_emitted_rows_match_batch_rollup(spark, tmp_path):
    """Every emitted streaming row equals the batch session_stats row for
    the same (user, session_seq) — the incremental operator computes the
    identical rollup."""
    from dhr_spark.operators.sessions import session_stats

    rows = [
        _ev(i, u, m)
        for i, (u, m) in enumerate(
            [(1, 0), (1, 10), (1, 50), (1, 95), (2, 0), (2, 40), (2, 41),
             (3, 5), (3, 90), (3, 91)]
        )
    ]
    in_dir, ckpt = f"{tmp_path}/in", f"{tmp_path}/ckpt"
    _write(spark, rows, in_dir, "p1")
    got = _drain(spark, in_dir, ckpt, f"{tmp_path}/out")
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    batch = {
        (r["user_id"], r["session_seq"]):
            (r["n_events"], r["start_epoch"], r["end_epoch"],
             r["duration_sec"], r["total_value"])
        for r in session_stats(events, gap_minutes=GAP_MIN).collect()
    }
    assert got  # closed sessions exist
    for key, row in got.items():
        assert batch[key] == row
    # what did NOT emit is exactly each user's open tail (max seq)
    held = set(batch) - set(got)
    assert held == {
        (u, max(s for (uu, s) in batch if uu == u))
        for u in {u for (u, _) in batch}
    }


def test_bad_gap_raises(spark, tmp_path):
    ev = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(str(tmp_path))
    with pytest.raises(ValueError, match="gap_minutes"):
        sessionize_stream(ev, gap_minutes=0)
