"""Streaming ingest: extracted output equals the batch extractor's; ledger
rows are appended per micro-batch (the reference's PIT status pattern)."""

import time

from rt_etl_yahoo_search_engine_spark.functions.extract import extract_df
from rt_etl_yahoo_search_engine_spark.sources.synth import synth_pages_df
from rt_etl_yahoo_search_engine_spark.streaming.ingest import extract_stream


def test_stream_matches_batch(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = synth_pages_df(spark, 120, num_partitions=6)
    pages.write.parquet(pages_dir)

    q = extract_stream(spark, pages_dir, out_dir, ckpt,
                       max_files_per_trigger=2, trigger_seconds=0.5)
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            break
    finally:
        q.stop()

    got = {
        (r["url"], r["seq"]): (r["link"], r["date"], r["body"])
        for r in spark.read.parquet(f"{out_dir}/extracted").collect()
    }
    want = {
        (r["url"], r["seq"]): (r["link"], r["date"], r["body"])
        for r in extract_df(
            pages.filter("lang = 'en' and html is not null")
        ).collect()
    }
    assert got == want

    ledger = spark.read.parquet(f"{out_dir}/ledger").collect()
    assert len(ledger) >= 1  # one row per micro-batch, append-only
    assert sum(r["n_results"] for r in ledger) == len(got)
    assert all(r["status"] == "COMPLETED" for r in ledger)
