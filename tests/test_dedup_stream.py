"""Streaming exact dedup (streaming/dedup_stream.py,
dropDuplicatesWithinWatermark): first occurrence of each content hash is
kept across micro-batches; duplicate state survives a checkpoint restart
so a re-fetched page arriving in a later RUN is still dropped."""

import datetime as dt
import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark.streaming.dedup_stream import (
    dedup_stream,
    with_content_hash,
)

T0 = dt.datetime(2024, 9, 21, 0, 0, 0)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


# (url, warc_ts, text) — texts A and B repeat across files
FILE1 = [
    ("u1", _ts(0), "text A"),
    ("u2", _ts(1), "text B"),
    ("u3", _ts(2), "text A"),   # intra-batch dup of u1
]
FILE2 = [
    ("u4", _ts(60), "text A"),  # cross-batch dup of u1
    ("u5", _ts(61), "text C"),
]
FILE3 = [
    ("u6", _ts(120), "text B"),  # dup arriving in a NEW RUN (restart test)
    ("u7", _ts(121), "text D"),
]

SCHEMA = "url string, warc_ts timestamp, text string"


def _write_file(spark, pages_dir, rows, idx):
    tmp = f"{pages_dir}_stage{idx}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(tmp)
    os.makedirs(pages_dir, exist_ok=True)
    src = glob.glob(f"{tmp}/part-*.parquet")[0]
    dst = f"{pages_dir}/{idx:04d}.parquet"
    shutil.copy(src, dst)
    # file source orders micro-batches by mtime: pin strictly increasing
    os.utime(dst, (time.time() - 1000 + idx * 60,) * 2)


def _run(spark, pages_dir, out_dir, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_dir)
    )
    deduped = dedup_stream(with_content_hash(stream), delay="24 hours")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_first_occurrence_kept_across_batches(spark, tmp_path):
    pages = str(tmp_path / "pages")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_file(spark, pages, FILE1, 0)
    _write_file(spark, pages, FILE2, 1)
    _run(spark, pages, out, ckpt)
    got = sorted((r.url, r.text) for r in spark.read.parquet(out).collect())
    # u3 (intra-batch dup) and u4 (cross-batch dup) dropped
    assert got == [("u1", "text A"), ("u2", "text B"), ("u5", "text C")]


def test_state_survives_restart(spark, tmp_path):
    pages = str(tmp_path / "pages")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_file(spark, pages, FILE1, 0)
    _write_file(spark, pages, FILE2, 1)
    _run(spark, pages, out, ckpt)
    # new run, same checkpoint: 'text B' re-arrives and must STILL drop
    _write_file(spark, pages, FILE3, 2)
    _run(spark, pages, out, ckpt)
    got = sorted((r.url, r.text) for r in spark.read.parquet(out).collect())
    assert got == [
        ("u1", "text A"),
        ("u2", "text B"),
        ("u5", "text C"),
        ("u7", "text D"),
    ]


def test_matches_batch_first_occurrence(spark, tmp_path):
    """Stream output == batch keep-earliest-by-(ts, url) exact dedup."""
    pages = str(tmp_path / "pages")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    for i, rows in enumerate([FILE1, FILE2, FILE3]):
        _write_file(spark, pages, rows, i)
    _run(spark, pages, out, ckpt)
    batch = (
        with_content_hash(spark.createDataFrame(FILE1 + FILE2 + FILE3, SCHEMA))
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("content_hash")
                .orderBy("warc_ts", "url")
            ),
        )
        .filter("rn = 1")
    )
    want = sorted((r.url, r.text) for r in batch.collect())
    got = sorted((r.url, r.text) for r in spark.read.parquet(out).collect())
    assert got == want
