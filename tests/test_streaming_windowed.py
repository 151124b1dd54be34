"""Watermark + tumbling-window streaming agg: finalized windows are emitted
exactly once and a later-than-watermark event is dropped, not double-counted.

Each file is processed by its own availableNow run (the checkpointed
watermark carries across runs), making the batch boundaries — and therefore
the watermark advancement — deterministic regardless of file mtimes."""

from __future__ import annotations

import os
from datetime import datetime

import pandas as pd

from consult_spark.streaming.windowed import (
    EVENTS_SCHEMA,
    stream_session_counts,
    stream_windowed_counts,
)


def _append(spark, events_dir, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    spark.createDataFrame(pdf, EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(events_dir)


def test_windowed_counts_drop_late_events(spark, tmp_path):
    events_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = lambda m, s: datetime(2026, 1, 1, 10, m, s)  # noqa: E731

    def run():
        q = stream_windowed_counts(spark, events_dir, out_dir, ckpt, max_files_per_trigger=16)
        q.awaitTermination(120)

    # run 1: two events in window 10:00 -> watermark 9:58:20, nothing emitted
    _append(spark, events_dir, [(1, 1, t(0, 10), 1.0), (2, 1, t(0, 20), 2.0)])
    run()
    # run 2: event at 10:05 -> watermark advances to 10:03 (end of run)
    _append(spark, events_dir, [(3, 1, t(5, 0), 4.0)])
    run()
    # run 3: a LATE event for 10:00 (ts < watermark 10:03 -> dropped) plus an
    # event at 10:10; the 10:00 window (end 10:01 <= 10:03) finalizes & emits
    _append(spark, events_dir, [(4, 1, t(0, 30), 100.0), (5, 1, t(10, 0), 8.0)])
    run()
    # run 4: fresh event pushes the watermark so the 10:05 window emits
    _append(spark, events_dir, [(6, 2, t(15, 0), 16.0)])
    run()

    got = {
        (r["window_start"].minute, r["user_id"]): (r["n_events"], r["sum_cents"])
        for r in spark.read.parquet(os.path.join(out_dir, "windowed")).collect()
    }
    # 10:00 window: exactly the two on-time events — the late 100.0 event
    # was dropped, not re-emitted or double-counted
    assert got[(0, 1)] == (2, 300)
    # 10:05 window finalized by the 10:10 event's watermark advance
    assert got[(5, 1)] == (1, 400)
    # 10:10 emitted by run 4's no-data flush batch (availableNow drains
    # state eligible under the final watermark 10:13); 10:15 still open
    assert got[(10, 1)] == (1, 800)
    assert (15, 2) not in got


def test_sliding_windows_overlap(spark, tmp_path):
    """slide < window_dur: each event lands in every overlapping window
    (2-minute windows sliding by 1 minute -> 2 windows per event), each
    finalized independently by the watermark."""
    events_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = lambda m, s: datetime(2026, 1, 1, 10, m, s)  # noqa: E731

    def run():
        q = stream_windowed_counts(
            spark, events_dir, out_dir, ckpt,
            window_dur="2 minutes", slide="1 minute", max_files_per_trigger=16,
        )
        q.awaitTermination(120)

    # one event at 10:01:30 -> belongs to [10:00,10:02) and [10:01,10:03)
    _append(spark, events_dir, [(1, 1, t(1, 30), 1.0)])
    run()
    # advance the watermark far enough to finalize both windows
    _append(spark, events_dir, [(2, 1, t(10, 0), 2.0)])
    run()
    got = {
        (r["window_start"].minute, r["window_end"].minute): (r["n_events"], r["sum_cents"])
        for r in spark.read.parquet(os.path.join(out_dir, "windowed")).collect()
        if r["window_start"].minute < 5
    }
    assert got == {(0, 2): (1, 100), (1, 3): (1, 100)}


def test_session_windows_merge_and_drop_late(spark, tmp_path):
    """Session windows: a bridging event MERGES two open sessions of the
    same user (the gap-merge semantics tumbling windows can't express); a
    later-than-watermark event is dropped; sessions finalize at
    (last event + gap) once the watermark passes."""
    events_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = lambda m, s: datetime(2026, 1, 1, 10, m, s)  # noqa: E731

    def run():
        q = stream_session_counts(
            spark, events_dir, out_dir, ckpt,
            gap="2 minutes", max_lateness="2 minutes", max_files_per_trigger=16,
        )
        q.awaitTermination(120)

    # run 1: two user-1 bursts 3 min apart -> TWO open sessions (gap 2 min)
    _append(spark, events_dir, [(1, 1, t(0, 0), 1.0), (2, 1, t(3, 0), 2.0)])
    run()
    # run 2: a bridging event at 10:01:30 (within 2 min of both) MERGES the
    # two sessions into one [10:00, 10:05)
    _append(spark, events_dir, [(3, 1, t(1, 30), 4.0)])
    run()
    # run 3: push the watermark past 10:05 so the merged session finalizes;
    # also a user-2 singleton
    _append(spark, events_dir, [(4, 2, t(9, 0), 8.0)])
    run()
    # run 4: a LATE user-1 event (ts 10:02 < watermark 10:07) must be
    # dropped, not re-open the emitted session; fresh event finalizes the
    # user-2 session
    _append(spark, events_dir, [(5, 1, t(2, 0), 100.0), (6, 2, t(14, 0), 16.0)])
    run()

    rows = spark.read.parquet(os.path.join(out_dir, "sessions")).collect()
    got = {
        (r["session_start"].minute, r["user_id"]): (
            r["session_end"].minute, r["n_events"], r["sum_cents"],
        )
        for r in rows
    }
    # ONE merged user-1 session 10:00 -> 10:05 (3 events; late 100.0 absent)
    assert got[(0, 1)] == (5, 3, 700)
    # user-2 session finalized by run 4's watermark advance
    assert got[(9, 2)] == (11, 1, 800)
    # the late event neither re-opened nor duplicated the merged session
    assert sum(1 for (_, u) in got if u == 1) == 1
