#!/usr/bin/env python3
"""spark-submit entry point: append new documents to an existing index.

    spark-submit --py-files dist/engine.zip jobs/extend_index.py \
        --pages /data/new_pages --index /data/index [--tokenizer html]

Segment-append (operators/index_build.py::extend_index): no rebuild, atomic
registry commit, rank-exact vs a fresh full build over the union corpus.
At-least-once per source batch: a CRASHED extension resumes from its
manifest rows (idempotent); rerunning after a successful commit is refused
when the (path, doc count) fingerprint matches the last committed segment
(pass --allow-duplicate to force a genuine re-append).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True, help="NEW pages parquet path")
    p.add_argument("--index", required=True, help="existing index root")
    p.add_argument("--tokenizer", choices=["html", "text"], default="html")
    p.add_argument("--url-ordered", action="store_true")
    p.add_argument("--allow-duplicate", action="store_true",
                   help="re-append even if (path, doc count) matches the "
                        "last committed segment")
    p.add_argument("--positions", action="store_true",
                   help="also catch the positional sidecar up to the "
                        "extended corpus (incremental, O(delta docs))")
    args = p.parse_args(argv)

    from rt_etl_yahoo_search_engine_spark.operators.index_build import extend_index
    from rt_etl_yahoo_search_engine_spark.session import get_spark

    spark = get_spark(app="extend-index")
    cat = extend_index(
        spark, args.pages, args.index,
        tokenizer=args.tokenizer, url_ordered=args.url_ordered,
        allow_duplicate=args.allow_duplicate,
    )
    if args.positions:
        from rt_etl_yahoo_search_engine_spark.operators.positions import (
            extend_positions,
        )

        extend_positions(spark, args.pages, args.index, tokenizer=args.tokenizer)
    reg = cat.read_registry()
    print(json.dumps({
        "version": reg["version"],
        "n_docs": reg["n_docs"],
        "avgdl": reg["avgdl"],
        "segments": [s["dir"] for s in reg["segments"]],
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
