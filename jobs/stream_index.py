#!/usr/bin/env python3
"""spark-submit entry point: CONTINUOUS incremental indexing.

Tails a pages directory (the Kafka stand-in — swap readStream.format on a
real cluster) and appends each micro-batch to the index as a segment,
exactly-once (streaming/index_stream.py).  The reference's real-time loop
(Kafka -> extract -> store; ref src/yahoo_search_process.py) as one
Structured Streaming query:

    spark-submit --py-files dist/engine.zip jobs/stream_index.py \
        --pages-dir /data/incoming --index /data/index \
        --checkpoint /data/ckpt --compact-at 8 [--available-now]

--available-now drains what is currently in --pages-dir and exits (batch
backfill / catch-up); without it the query runs until killed and resumes
from --checkpoint on restart.  The index stays queryable throughout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pages-dir", required=True,
                   help="directory new pages parquet files arrive in")
    p.add_argument("--index", required=True, help="index root (created if absent)")
    p.add_argument("--checkpoint", required=True,
                   help="streaming checkpoint location (offsets/commits)")
    p.add_argument("--shards", type=int, default=32,
                   help="doc-range shards (new index only)")
    p.add_argument("--buckets", type=int, default=16,
                   help="term-hash buckets (new index only)")
    p.add_argument("--tokenizer", choices=["html", "text"], default="html")
    p.add_argument("--compact-at", type=int, default=None,
                   help="merge segments whenever their count reaches this")
    p.add_argument("--max-files-per-trigger", type=int, default=4)
    p.add_argument("--trigger-seconds", type=float, default=1.0)
    p.add_argument("--available-now", action="store_true",
                   help="drain the current backlog and exit")
    args = p.parse_args(argv)

    from rt_etl_yahoo_search_engine_spark.session import get_spark
    from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog
    from rt_etl_yahoo_search_engine_spark.streaming.index_stream import index_stream

    spark = get_spark(app="stream-index")
    q = index_stream(
        spark,
        args.pages_dir,
        args.index,
        args.checkpoint,
        tokenizer=args.tokenizer,
        n_shards=args.shards,
        n_buckets=args.buckets,
        compact_at=args.compact_at,
        max_files_per_trigger=args.max_files_per_trigger,
        trigger_seconds=args.trigger_seconds,
        available_now=args.available_now,
    )
    q.awaitTermination()
    reg = Catalog(args.index).read_registry()
    print(json.dumps({
        "version": reg["version"],
        "n_docs": reg["n_docs"],
        "avgdl": reg["avgdl"],
        "n_segments": len(reg["segments"]),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
