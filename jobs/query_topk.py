#!/usr/bin/env python3
"""spark-submit entry point: BM25 top-k queries against a built index.

    spark-submit --py-files dist/engine.zip jobs/query_topk.py \
        --index /data/index --query "Chicken Rice" --query "Gout" \
        [--mode conjunctive] [--k 10] [--oracle] [--serve] [--out /data/results]

--oracle runs the exhaustive DataFrame scorer instead of the TAAT path
(rank-identical by construction; used for verification).
--serve answers from the low-latency local searcher (plans.serve) — no
Spark job at all; rank-identical to the distributed path.
--phrase treats each --query as a quoted phrase (contiguous token run;
plans.phrase).  Verification uses the positional sidecar when the index has
a fresh one (build_index.py --positions); otherwise pass --pages, the
(url, html|text) table whose text the index was built from (--tokenizer
selects the column, as in the build).
--near N treats each --query as an unordered proximity query: all terms
within a window of N token positions (plans.near; requires the sidecar).
Both --phrase and --near combine with --serve (LocalSearcher.search_phrase
/ .search_near — no Spark job, rank-identical to the distributed paths).
--search enables the unified syntax per --query — plain terms, "quoted
phrases", -minus-terms, -"minus phrases" (plans.search).
--exclude "term ..." adds minus-terms to EVERY query: docs containing any
such token are removed BEFORE top-k selection (exact kth).  Supported on
the default distributed path and --serve; not on --oracle.
"""

from __future__ import annotations

import argparse
import os
import sys

# importable without --py-files when launched from a repo checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--query", action="append", default=[],
                   help="repeatable; default: the reference query set")
    p.add_argument("--mode", choices=["disjunctive", "conjunctive"],
                   default="disjunctive")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--oracle", action="store_true")
    p.add_argument("--serve", action="store_true")
    p.add_argument("--phrase", action="store_true",
                   help="quoted-phrase semantics (sidecar or --pages)")
    p.add_argument("--near", type=int, default=None, metavar="WINDOW",
                   help="proximity semantics: all terms within WINDOW "
                        "token positions (requires the positional sidecar)")
    p.add_argument("--exclude", default=None,
                   help="minus-terms applied to every query")
    p.add_argument("--search", action="store_true",
                   help="unified search syntax per --query: plain terms, "
                        "\"quoted phrases\", -minus-terms, -\"minus "
                        "phrases\" (plans.search; phrases need the sidecar)")
    p.add_argument("--pages", default=None,
                   help="pages parquet for phrase verification")
    p.add_argument("--tokenizer", choices=["html", "text"], default="html",
                   help="pages payload column (phrase mode)")
    p.add_argument("--out", default=None, help="write results parquet here")
    args = p.parse_args(argv)

    from rt_etl_yahoo_search_engine_spark import spec
    from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk, topk_oracle
    from rt_etl_yahoo_search_engine_spark.session import get_spark

    queries = (
        {f"q{i}": q for i, q in enumerate(args.query)}
        if args.query
        else spec.REFERENCE_QUERIES
    )
    exclude = {qid: args.exclude for qid in queries} if args.exclude else None
    if exclude and (args.oracle or args.phrase or args.near is not None
                    or args.search):
        p.error("--exclude works with the default path and --serve only "
                "(--search has its own -term syntax)")
    if args.serve:
        from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher

        searcher = LocalSearcher(args.index)
        if args.phrase or args.search or args.near is not None:
            # low-latency positional paths (sidecar required for phrases)
            import pandas as pd

            rows = []
            for qid, text in queries.items():
                if args.phrase:
                    hits = searcher.search_phrase(text, k=args.k)
                elif args.search:
                    hits = searcher.search_query(text, mode=args.mode, k=args.k)
                else:
                    hits = searcher.search_near(text, window=args.near, k=args.k)
                rows.extend((qid, r, d, s) for r, d, s in hits)
            pdf = pd.DataFrame(
                rows, columns=["query_id", "rank", "doc_id", "score"]
            )
        else:
            pdf = searcher.search_batch(
                queries, mode=args.mode, k=args.k, exclude=exclude
            )
        if args.out:
            pdf.to_parquet(args.out)
        else:
            print(pdf.sort_values(["query_id", "rank"]).to_string(index=False))
        return 0
    if args.phrase:
        from rt_etl_yahoo_search_engine_spark.plans.phrase import phrase_topk

        spark = get_spark(app="query-phrase")
        docs_text = None
        if args.pages:
            from rt_etl_yahoo_search_engine_spark.functions.extract import (
                page_text_df,
            )

            pages = spark.read.parquet(args.pages)
            docs_text = (
                page_text_df(pages) if args.tokenizer == "html"
                else pages.select("url", "text")
            )
        # verify="auto": positional sidecar when fresh, else the text scan
        # (which then requires --pages)
        out = phrase_topk(spark, args.index, queries, docs_text,
                          k=args.k, with_url=True)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
        else:
            out.orderBy("query_id", "rank").show(
                args.k * len(queries), truncate=False
            )
        spark.stop()
        return 0
    if args.search:
        from rt_etl_yahoo_search_engine_spark.plans.search import search_topk

        spark = get_spark(app="query-search")
        out = search_topk(spark, args.index, queries, mode=args.mode,
                          k=args.k, with_url=True)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
        else:
            out.orderBy("query_id", "rank").show(
                args.k * len(queries), truncate=False
            )
        spark.stop()
        return 0
    if args.near is not None:
        from rt_etl_yahoo_search_engine_spark.plans.near import near_topk

        spark = get_spark(app="query-near")
        out = near_topk(spark, args.index, queries, window=args.near,
                        k=args.k, with_url=True)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
        else:
            out.orderBy("query_id", "rank").show(
                args.k * len(queries), truncate=False
            )
        spark.stop()
        return 0
    spark = get_spark(app="query-topk")
    fn = topk_oracle if args.oracle else topk
    kwargs = {} if args.oracle else {"with_url": True, "exclude": exclude}
    out = fn(spark, args.index, queries, mode=args.mode, k=args.k, **kwargs)
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
    else:
        out.orderBy("query_id", "rank").show(args.k * len(queries), truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
