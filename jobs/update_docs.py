#!/usr/bin/env python3
"""spark-submit entry point: upsert documents into a built index by url.

    spark-submit --py-files dist/engine.zip jobs/update_docs.py \
        --index /data/index --pages /data/new_versions [--tokenizer html] \
        [--source-id batch-2024-09-21]

The batch is the new TRUTH for its urls (operators/deletes.py::update_docs):
its pages are appended as a fresh segment (rank-exact, same machinery as
``jobs/extend_index``), then every pre-existing doc with one of those urls
is tombstoned, so queries return only the newest version of each url.
Urls not yet in the index are plain inserts.  Append commits before
tombstone, so a crash never loses a document; pass --source-id to make
replays exactly-once.  History is physically reclaimed by
``jobs/compact_index``.  Prints the number of stale docs tombstoned.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--pages", required=True, help="new page versions parquet")
    p.add_argument("--tokenizer", choices=["html", "text"], default="html")
    p.add_argument("--url-ordered", action="store_true")
    p.add_argument("--source-id", help="batch name for exactly-once replays")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from rt_etl_yahoo_search_engine_spark.operators.deletes import update_docs

    spark = SparkSession.builder.appName("update-docs").getOrCreate()
    try:
        n = update_docs(
            spark,
            args.index,
            args.pages,
            tokenizer=args.tokenizer,
            url_ordered=args.url_ordered,
            source_id=args.source_id,
        )
        print(f"n_stale_tombstoned={n}")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
