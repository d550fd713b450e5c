#!/usr/bin/env python3
"""spark-submit entry point: merge all posting segments into one.

    spark-submit --py-files dist/engine.zip jobs/compact_index.py \
        --index /data/index [--prune]

Segment compaction (operators/index_build.py::compact_index): rewrites an
extended (multi-segment) index into the form a fresh build over the
concatenated corpus would produce — posting rows re-derived from the staged
tokens tables (extraction/tokenization is never repeated), re-sharded by the
global doc count, re-encoded against the current avgdl.  Queries before and
after are score- and rank-identical; all per-segment bound-drift factors
return to 1.0.  Atomic registry commit; crashed runs resume from manifest
rows.  --prune deletes the replaced posting/lexicon/docmap directories after
the commit (staged tokens are always kept).

Compaction is also the physical reclaim point for tombstoned docs
(jobs/delete_docs.py, jobs/update_docs.py): their token/posting/docmap rows
are dropped, BM25 statistics are recomputed over the live corpus, and the
tombstone list resets — afterwards queries equal a fresh build over the
live documents (doc ids keep their holes; they are never renumbered).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True, help="existing index root")
    p.add_argument("--prune", action="store_true",
                   help="delete replaced directories after the commit")
    args = p.parse_args(argv)

    from rt_etl_yahoo_search_engine_spark.operators.index_build import compact_index
    from rt_etl_yahoo_search_engine_spark.session import get_spark

    spark = get_spark(app="compact-index")
    cat = compact_index(spark, args.index, prune=args.prune)
    reg = cat.read_registry()
    print(json.dumps({
        "version": reg["version"],
        "n_docs": reg["n_docs"],
        "segments": [s["dir"] for s in reg["segments"]],
        "lexicon_dir": reg["lexicon_dir"],
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
