"""Streaming EQL sequence (streaming/eql_stream.py): completed sequences
equal the batch eql_sequence twin; candidates spanning micro-batches are
stitched through state; maxspan is mandatory (state bound)."""

import datetime as dt
import glob
import os
import shutil
import time

import pytest

from rt_etl_yahoo_search_engine_spark.streaming.eql_stream import (
    eql_sequence_stream,
    eql_sequence_stream_df,
)

STAGES = ["a", "b", "c"]
SPAN = 100

# (user_id, ts_epoch, event_id, event_type) — crafted so that:
#  * user 1's sequence BINDS ACROSS the two files (a,b in f1; c in f2);
#  * user 1 opens a second candidate in f1 whose b arrives in f2;
#  * user 2 has a candidate that EXPIRES (maxspan) before its c arrives;
#  * user 3 completes entirely inside file 2.
FILE1 = [
    (1, 10, 0, "a"),
    (1, 20, 1, "b"),
    (1, 30, 2, "a"),
    (2, 10, 3, "a"),
    (2, 20, 4, "b"),
]
FILE2 = [
    (1, 40, 5, "b"),
    (1, 50, 6, "c"),   # completes (0,1,6) and (2,5,6)
    (2, 200, 7, "c"),  # 200-10 > SPAN: user 2's candidate is expired
    (3, 60, 8, "a"),
    (3, 61, 9, "b"),
    (3, 62, 10, "c"),
]


def _write_files(spark, d):
    spark.createDataFrame(
        FILE1, "user_id long, ts_epoch long, event_id long, event_type string"
    ).coalesce(1).write.parquet(f"{d}/f1")
    spark.createDataFrame(
        FILE2, "user_id long, ts_epoch long, event_id long, event_type string"
    ).coalesce(1).write.parquet(f"{d}/f2")
    files = sorted(glob.glob(f"{d}/f*/part-*.parquet"))
    dst = f"{d}/events"
    os.makedirs(dst)
    base = time.time() - 1000
    for i, f in enumerate(files):
        p = f"{dst}/{i:04d}.parquet"
        shutil.copy(f, p)
        os.utime(p, (base + i * 60, base + i * 60))
    return dst


def _batch_oracle(spark, rows):
    """The (brute-tested) batch twin over the same events."""
    from rt_etl_yahoo_search_engine_spark.functions.events_agg import (
        eql_sequence,
    )

    df = spark.createDataFrame(
        [
            (e, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t), u, s)
            for u, t, e, s in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    base = int(dt.datetime(2024, 1, 1).timestamp())
    return sorted(
        (
            r["key"],
            r["e1_id"],
            r["e2_id"],
            r["e3_id"],
            int(r["start_ts"].timestamp()) - base,
            r["span_s"],
        )
        for r in eql_sequence(df, STAGES, maxspan_s=SPAN).collect()
    )


def test_stream_equals_batch_across_files(spark, tmp_path):
    events_dir = _write_files(spark, str(tmp_path))
    out_dir = str(tmp_path / "seqs")
    ckpt = str(tmp_path / "ckpt")
    q = eql_sequence_stream(spark, events_dir, out_dir, ckpt, STAGES, SPAN)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (
            r["user_id"], r["e1_id"], r["e2_id"], r["e3_id"],
            r["start_epoch"], r["span_s"],
        )
        for r in spark.read.parquet(out_dir).collect()
    )
    want = _batch_oracle(spark, FILE1 + FILE2)
    assert got == want
    # the cross-file stitched sequences are present (a,b from f1, c f2)
    assert (1, 0, 1, 6, 10, 40) in got
    assert (1, 2, 5, 6, 30, 20) in got
    # user 2's expired candidate is NOT emitted
    assert not any(r[0] == 2 for r in got)


def test_restart_from_checkpoint_no_duplicates(spark, tmp_path):
    events_dir = _write_files(spark, str(tmp_path))
    out_dir = str(tmp_path / "seqs")
    ckpt = str(tmp_path / "ckpt")
    q = eql_sequence_stream(spark, events_dir, out_dir, ckpt, STAGES, SPAN)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    q2 = eql_sequence_stream(spark, events_dir, out_dir, ckpt, STAGES, SPAN)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert sorted(map(tuple, spark.read.parquet(out_dir).collect())) == first


def test_maxspan_required(spark):
    df = spark.createDataFrame(
        [], "user_id long, ts_epoch long, event_id long, event_type string"
    )
    with pytest.raises(ValueError):
        eql_sequence_stream_df(df, STAGES, None)
    with pytest.raises(ValueError):
        eql_sequence_stream_df(df, ["only"], 10)
