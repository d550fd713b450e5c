#!/usr/bin/env python3
"""spark-submit entry point: build (or resume) the inverted index.

Packaging (north_rule: ships as spark-submit --py-files):

    cd /root/repo && python jobs/package.py      # -> dist/engine.zip
    spark-submit --py-files dist/engine.zip jobs/build_index.py \
        --pages /data/pages --index /data/index \
        --shards 256 --buckets 64 [--bucket-batch 8] [--tokenizer html]

The job is idempotent: rerunning after a failure resumes from the last
committed manifest partition (see operators/index_build.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# importable without --py-files when launched from a repo checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True, help="input pages parquet/iceberg path")
    p.add_argument("--index", required=True, help="output index root")
    p.add_argument("--shards", type=int, default=32, help="doc-range shards")
    p.add_argument("--buckets", type=int, default=16, help="term-hash buckets")
    p.add_argument("--bucket-batch", type=int, default=None,
                   help="buckets per encode commit (resume granularity)")
    p.add_argument("--tokenizer", choices=["html", "text"], default="html")
    p.add_argument("--url-ordered", action="store_true",
                   help="declare the pages table url-sorted with disjoint "
                        "per-file url ranges (e.g. Iceberg write-ordered by "
                        "url): skips the posting shuffle entirely")
    p.add_argument("--positions", action="store_true",
                   help="also build the positional sidecar (index-only "
                        "phrase queries; operators/positions.py)")
    p.add_argument("--synthesize", type=int, default=None, metavar="N_DOCS",
                   help="generate a deterministic N_DOCS webtext corpus at "
                        "--pages first (demo/bench)")
    args = p.parse_args(argv)

    from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
    from rt_etl_yahoo_search_engine_spark.session import get_spark

    spark = get_spark(app="build-index")
    if args.synthesize:
        from rt_etl_yahoo_search_engine_spark.sources.synth import write_pages

        write_pages(spark, args.synthesize, args.pages)
    cat = build_index(
        spark,
        args.pages,
        args.index,
        n_shards=args.shards,
        n_buckets=args.buckets,
        bucket_batch=args.bucket_batch,
        tokenizer=args.tokenizer,
        url_ordered=args.url_ordered,
    )
    if args.positions:
        from rt_etl_yahoo_search_engine_spark.operators.positions import (
            build_positions,
        )

        build_positions(spark, args.pages, args.index, tokenizer=args.tokenizer)
    stats = cat.read_stats()
    rows = cat.latest_status()
    print(json.dumps({
        "n_docs": stats["n_docs"],
        "avgdl": stats["avgdl"],
        "partitions_completed": sorted(rows),
        "total_build_time_s": round(
            sum(r["build_time_s"] for r in rows.values()), 2
        ),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
