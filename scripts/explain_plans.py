#!/usr/bin/env python3
"""Capture physical plans of the engine's headline operators into EXPLAIN.md.

Run:  /root/.pyenv/shims/python3 scripts/explain_plans.py

For each headline query the script records `.explain(mode="formatted")`
output plus a short commentary on the scale-relevant properties to check:
pushed filters at the parquet scan (partition/row-group pruning), broadcast
vs shuffle joins, whole-stage codegen spans, and where the Arrow boundaries
sit.  The output is committed as EXPLAIN.md so plan regressions show up in
review diffs.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def captured_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    text = buf.getvalue()
    # keep the plan readable: drop exploded per-column ReadSchema spam > 400 chars
    return "\n".join(
        line if len(line) < 400 else line[:400] + " …(truncated)"
        for line in text.splitlines()
    )


def main() -> None:
    from rt_etl_yahoo_search_engine_spark import spec
    from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
    from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
    from rt_etl_yahoo_search_engine_spark.session import get_spark
    from rt_etl_yahoo_search_engine_spark.sources.synth import synth_pages_df

    import __spark_entry__ as entry

    spark = get_spark(app="explain", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="explain_idx_")
    pages_path = os.path.join(tmp, "pages")
    synth_pages_df(spark, 500, num_partitions=4).write.parquet(pages_path)
    idx = os.path.join(tmp, "idx")
    build_index(spark, pages_path, idx, n_shards=4, n_buckets=8)

    sections: list[tuple[str, str, str]] = []

    sections.append((
        "BM25 top-k (scan-side vectorized TAAT over compressed postings)",
        "The plan must contain NO exchange carrying posting payload bytes: "
        "the only input is the metadata-scale (path, factor) unit list fed "
        "to `MapInPandas` (one task per (segment, shard) reads its own "
        "shard directory via pyarrow with term-isin row-group pruning and "
        "scores the whole broadcast query batch vectorized), and the only "
        "wide exchange is the k-rows-per-(query,shard) window merge.",
        captured_plan(
            topk(spark, idx, {"q": "chicken rice", "q2": "coffee"}, k=10)
        ),
    ))

    sections.append((
        "Index build: posting rows (tokens ⋈ docmap + shard/bucket assignment)",
        "Expect `BroadcastHashJoin` on url (docmap broadcast at sandbox scale; "
        "at 10^12 docs this degrades to one shuffle join, by design), shard/"
        "bucket derived in-line by codegen'd expressions, no extra exchange "
        "before the partitioned write.",
        captured_plan(
            entry.queries()["tokenize_tf"](spark, SF_DIR)
        ),
    ))

    sections.append((
        "Scan + filter + projection pushdown (driver entry scan_filter_project)",
        "`PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,…)]` "
        "and a 3-column `ReadSchema` prove predicate + projection reach the "
        "parquet reader — nothing else is materialized.",
        captured_plan(entry.queries()["scan_filter_project"](spark, SF_DIR)),
    ))

    sections.append((
        "Semi-join via IN-list (left_semi, driver entry semi_join_inlist)",
        "The filtered orders side builds a broadcast exchange; lineitem scans "
        "stream past it (`BroadcastHashJoin … LeftSemi`) — no full shuffle of "
        "the big fact table.",
        captured_plan(entry.queries()["semi_join_inlist"](spark, SF_DIR)),
    ))

    sections.append((
        "Exact dedup (hash-groupBy window)",
        "One exchange on `content_hash` feeds the row_number window; md5 is "
        "computed in whole-stage codegen during the scan projection.",
        captured_plan(entry.queries()["dedup_exact"](spark, SF_DIR)),
    ))

    sections.append((
        "ANN brute-force cosine (broadcast query side)",
        "`BroadcastNestedLoopJoin` (tiny query side) over a single corpus "
        "scan; dot products run in codegen via higher-order functions — no "
        "Python in the hot path.",
        captured_plan(entry.queries()["ann_cosine_topk"](spark, SF_DIR)),
    ))

    sections.append((
        "Webgraph degree stats (union trick)",
        "EXACTLY ONE exchange: each edge becomes an (endpoint, is_out) pair "
        "via `Union`, and a single hash aggregate sums both degrees — the "
        "two-agg + outer-join alternative would cost two exchanges plus a "
        "join. Partial aggregation (`HashAggregate` before the exchange) "
        "combines map-side.",
        captured_plan(entry.queries()["link_degree_stats"](spark, SF_DIR)),
    ))

    sections.append((
        "PageRank round (join on src + groupBy dst)",
        "Each power-iteration round is one join of the degree-weighted edge "
        "list with the current ranks on src, then one hash aggregate on dst "
        "— both linear in |E|; at sandbox scale AQE turns the rank side "
        "into a broadcast. The final LEFT join back to the node set gives "
        "sink nodes their (1-d)/N floor. No corpus-scale window, no "
        "Python.",
        captured_plan(entry.queries()["link_pagerank"](spark, SF_DIR)),
    ))

    sections.append((
        "URL canonicalization + latest-snapshot dedup",
        "Canonicalization is a single codegen projection (regexp_extract + "
        "higher-order filter/array_sort — no UDF, no exchange); the "
        "snapshot dedup adds EXACTLY ONE hash exchange on the canonical "
        "url, shared by both window functions (row_number and count).",
        captured_plan(entry.queries()["url_canonicalize"](spark, SF_DIR)),
    ))

    sections.append((
        "Alternative similarity (LM-Dirichlet) over the same index",
        "Identical shape to the scan-side BM25 batch path: the only "
        "input is the metadata-scale (path, factor) unit list into "
        "`MapInPandas` (each unit reads its own shard dir with term-isin "
        "row-group pruning and emits k rows per set), the per-query map "
        "is a broadcast join, and the only wide exchange is the "
        "k-rows-per-(query,unit) window merge — swapping the weight "
        "formula changed NOTHING in the data movement.",
        captured_plan(entry.queries()["dirichlet_topk"](spark, SF_DIR)),
    ))

    sections.append((
        "Multi-fragment highlighting over top-k hits",
        "All highlight work (regexp tag pass + unrolled locate/substring "
        "fragment chain + posexplode) runs AFTER the top-k merge on "
        "k-rows-per-query data, with the per-query patterns arriving via "
        "a broadcast join — never a corpus-scale operation.",
        captured_plan(entry.queries()["bm25_topk_highlight"](spark, SF_DIR)),
    ))

    out = [
        "# EXPLAIN — physical plans of the headline operators\n",
        "Generated by `scripts/explain_plans.py` (local[8], sf=" + SF_DIR + ").",
        "Each section states the scale-critical plan properties to verify,"
        " then the `.explain(\"formatted\")` capture.\n",
    ]
    for title, commentary, plan in sections:
        out.append(f"## {title}\n")
        out.append(commentary + "\n")
        out.append("```\n" + plan.rstrip() + "\n```\n")
    with open(os.path.join(REPO, "EXPLAIN.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote EXPLAIN.md")
    spark.stop()


if __name__ == "__main__":
    main()
