"""Streaming trending terms (streaming/trending_stream): finalized
windowed term counts equal the batch oracle over the same rows
(stream == batch identity), windows finalize exactly once across
micro-batches and restarts, late-beyond-watermark rows are dropped,
and top_terms ranks per window deterministically."""

import datetime as dt
import glob
import os
import shutil
import time

from rt_etl_yahoo_search_engine_spark.streaming.trending_stream import (
    top_terms, trending_batch, trending_stream,
)

T0 = dt.datetime(2024, 9, 21, 0, 0, 0)
SCHEMA = "doc_id long, ts timestamp, text string"


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


FILE1 = [
    (1, _ts(0), "spark joins spark"),
    (2, _ts(10), "joins shuffle"),
    (3, _ts(70), "window spark"),
]
FILE2 = [
    (4, _ts(130), "shuffle shuffle window"),
    (5, _ts(400), "spark closes earlier windows"),  # advances watermark
]


def _write_file(spark, pages_dir, rows, idx):
    tmp = f"{pages_dir}_stage{idx}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(tmp)
    os.makedirs(pages_dir, exist_ok=True)
    src = glob.glob(f"{tmp}/part-*.parquet")[0]
    dst = f"{pages_dir}/{idx:04d}.parquet"
    shutil.copy(src, dst)
    os.utime(dst, (time.time() - 1000 + idx * 60,) * 2)


def _run(spark, pages_dir, out_dir, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_dir)
    )
    counts = trending_stream(stream, window="1 minute", delay="2 minutes")
    q = (
        counts.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _rows(df):
    return sorted(
        (r["window_start"], r["term"], r["n"]) for r in df.collect()
    )


def test_finalized_counts_equal_batch(spark, tmp_path):
    pages = str(tmp_path / "pages")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_file(spark, pages, FILE1, 0)
    _write_file(spark, pages, FILE2, 1)
    _run(spark, pages, out, ckpt)
    got = _rows(spark.read.parquet(out))
    # the stream finalizes every window whose end + delay <= max event
    # time (t=400 -> windows ending <= 160s are final: 0-60, 60-120,
    # 120-180); the last window (400) is still open -> absent.
    batch = trending_batch(
        spark.createDataFrame(FILE1 + FILE2, SCHEMA), window="1 minute"
    )
    want = [
        r for r in _rows(batch)
        if r[0] + dt.timedelta(minutes=3) <= _ts(400)
    ]
    assert got == want
    assert len(got) > 0
    assert all(ws < _ts(200) for ws, _, _ in got)


def test_restart_emits_remaining_windows_once(spark, tmp_path):
    pages = str(tmp_path / "pages")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_file(spark, pages, FILE1, 0)
    _run(spark, pages, out, ckpt)
    first = _rows(spark.read.parquet(out))
    # second RUN with the same checkpoint: watermark state resumes, the
    # new file closes the earlier windows; nothing re-emits
    _write_file(spark, pages, FILE2, 1)
    _run(spark, pages, out, ckpt)
    both = _rows(spark.read.parquet(out))
    assert len(both) > len(first)
    assert len(both) == len(set(both))  # exactly-once per (window, term)


def test_late_row_beyond_watermark_dropped(spark, tmp_path):
    pages = str(tmp_path / "pages")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_file(spark, pages, FILE1, 0)
    _write_file(spark, pages, FILE2, 1)
    _run(spark, pages, out, ckpt)
    # second RUN, same checkpoint (watermark 400-120=280 restored): a row
    # for the long-closed first window must be DROPPED, not re-emitted
    # and not re-counted
    _write_file(spark, pages, [(9, _ts(5), "spark spark spark")], 2)
    _run(spark, pages, out, ckpt)
    got = _rows(spark.read.parquet(out))
    spark_w0 = [r for r in got if r[0] == _ts(0) and r[1] == "spark"]
    assert spark_w0 == [(_ts(0), "spark", 2)]  # late 3x 'spark' ignored


def test_top_terms_ranks_per_window(spark):
    batch = trending_batch(
        spark.createDataFrame(FILE1 + FILE2, SCHEMA), window="1 minute"
    )
    out = top_terms(batch, k=2).collect()
    by_w = {}
    for r in out:
        by_w.setdefault(r["window_start"], []).append(
            (r["rank"], r["term"], r["n"])
        )
    w0 = sorted(by_w[_ts(0)])
    assert w0[0] == (1, "joins", 2) or w0[0] == (1, "spark", 2)
    # deterministic tie-break: n DESC then term ASC
    assert [r for r, _, _ in w0] == [1, 2]
    assert w0[0][1] < w0[1][1] or w0[0][2] > w0[1][2]
