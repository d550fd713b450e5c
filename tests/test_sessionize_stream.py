"""Streaming sessionization (streaming/sessionize_stream.py,
applyInPandasWithState): closed sessions equal the batch gap-fold oracle;
sessions spanning micro-batches are stitched through state; checkpoint
restart does not duplicate output."""

import pytest

from rt_etl_yahoo_search_engine_spark.streaming.sessionize_stream import (
    sessionize_events,
    sessionize_stream,
)

GAP = 10

# (user_id, ts_epoch, event_id) — crafted so that:
#  * user 1's first session SPANS the two input files (state stitching);
#  * user 2 closes one session inside file 1 and opens another;
#  * user 3 appears only in file 2.
FILE1 = [
    (1, 100, 0), (1, 105, 1),
    (2, 100, 2), (2, 130, 3),   # gap 30 > GAP: closes (100,100,1)
]
FILE2 = [
    (1, 112, 4),                # 112-105 <= GAP: continues file1's session
    (1, 140, 5),                # closes (100,112,3), opens (140,...)
    (2, 135, 6),                # continues (130,...)
    (3, 50, 7),
]


def _py_sessions(rows):
    """All sessions (closed AND open tails) from the full event list."""
    by_user = {}
    for u, t, _e in rows:
        by_user.setdefault(u, []).append(t)
    out = []
    for u, ts in by_user.items():
        ts.sort()
        start = last = ts[0]
        n = 1
        for t in ts[1:]:
            if t - last <= GAP:
                last, n = t, n + 1
            else:
                out.append((u, start, last, n))
                start = last = t
                n = 1
        out.append((u, start, last, n))  # open tail
    return out


def _write_files(spark, d):
    spark.createDataFrame(
        FILE1, "user_id long, ts_epoch long, event_id long"
    ).coalesce(1).write.parquet(f"{d}/f1")
    spark.createDataFrame(
        FILE2, "user_id long, ts_epoch long, event_id long"
    ).coalesce(1).write.parquet(f"{d}/f2")
    # flatten: the file source needs one directory of files
    import glob
    import shutil

    files = sorted(glob.glob(f"{d}/f*/part-*.parquet"))
    dst = f"{d}/events"
    import os

    os.makedirs(dst)
    import time

    base = time.time() - 1000
    for i, f in enumerate(files):
        p = f"{dst}/{i:04d}.parquet"
        shutil.copy(f, p)
        # the file source orders micro-batches by modification time; pin
        # strictly increasing mtimes so f1 is batch 1 and f2 is batch 2
        os.utime(p, (base + i * 60, base + i * 60))
    return dst


def test_closed_sessions_span_batches(spark, tmp_path):
    events_dir = _write_files(spark, str(tmp_path))
    out_dir = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    q = sessionize_stream(spark, events_dir, out_dir, ckpt, gap_s=GAP)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    )
    all_rows = FILE1 + FILE2
    full = _py_sessions(all_rows)
    # the stream emits exactly the CLOSED sessions: every oracle session
    # except each user's open tail (the last session per user)
    tails = {}
    for u, s, e, n in full:
        tails[u] = (u, s, e, n)  # sessions are emitted in time order
    want = sorted(x for x in full if x != tails[x[0]])
    assert got == want
    # the cross-file stitched session is present with events from BOTH files
    assert (1, 100, 112, 3) in got


def test_restart_from_checkpoint_no_duplicates(spark, tmp_path):
    events_dir = _write_files(spark, str(tmp_path))
    out_dir = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    q = sessionize_stream(spark, events_dir, out_dir, ckpt, gap_s=GAP)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    # restart on the same checkpoint: nothing new to process, no dupes
    q2 = sessionize_stream(spark, events_dir, out_dir, ckpt, gap_s=GAP)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    again = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    assert again == first


def test_bad_gap_rejected(spark):
    df = spark.createDataFrame([], "user_id long, ts_epoch long, event_id long")
    with pytest.raises(ValueError):
        sessionize_events(df, gap_s=0)
