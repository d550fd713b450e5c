#!/usr/bin/env python3
"""spark-submit entry point: tombstone documents in a built index.

    spark-submit --py-files dist/engine.zip jobs/delete_docs.py \
        --index /data/index --url https://example.com/a --url https://example.com/b
    spark-submit ... jobs/delete_docs.py --index /data/index --urls-parquet /data/to_delete
    spark-submit ... jobs/delete_docs.py --index /data/index --doc-id 17 --doc-id 42

Deletion is metadata-scale (operators/deletes.py): the urls resolve to
index doc ids against the docmap, the ids commit as a doc-range-sorted
tombstone sidecar, and every query path masks them BEFORE top-k from then
on.  BM25 statistics keep counting deleted docs (Lucene semantics) until
``jobs/compact_index`` / ``compact_index(...)`` physically purges them.
Unknown urls are no-ops; replaying a delete is idempotent.  Prints the
total number of docs now tombstoned.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--url", action="append", default=[],
                   help="url to delete (repeatable)")
    p.add_argument("--urls-parquet",
                   help="parquet table with a `url` column to delete")
    p.add_argument("--doc-id", action="append", type=int, default=[],
                   help="index doc id to delete (repeatable)")
    p.add_argument("--query",
                   help="tombstone every matching doc (deleteByQuery)")
    p.add_argument("--mode", choices=["conjunctive", "disjunctive"],
                   default="conjunctive",
                   help="--query match mode (default: docs with ALL terms)")
    args = p.parse_args(argv)
    given = sum(
        bool(x) for x in (args.url, args.urls_parquet, args.doc_id, args.query)
    )
    if given != 1:
        p.error(
            "give exactly one of --url(s), --urls-parquet, --doc-id(s), --query"
        )

    from pyspark.sql import SparkSession

    from rt_etl_yahoo_search_engine_spark.operators.deletes import (
        delete_by_query,
        delete_docs,
    )

    spark = SparkSession.builder.appName("delete-docs").getOrCreate()
    try:
        if args.query:
            n = delete_by_query(spark, args.index, args.query, mode=args.mode)
            print(f"n_newly_tombstoned={n}")
            return 0
        if args.doc_id:
            n = delete_docs(spark, args.index, doc_ids=args.doc_id)
        elif args.urls_parquet:
            n = delete_docs(
                spark, args.index, urls=spark.read.parquet(args.urls_parquet)
            )
        else:
            n = delete_docs(spark, args.index, urls=args.url)
        print(f"n_deleted={n}")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
