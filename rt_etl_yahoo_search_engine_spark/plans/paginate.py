"""Result paging: from/size offset pages and exact search_after cursors
(Elasticsearch from+size / search_after; Lucene searchAfter(FieldDoc)).

Two cost shapes, both exact:

  * topk_page — page N of a ranked list (ES from+size).  The scan-side
    scorer already selects per-unit top-k' rows for any k', so asking it
    for from+k and slicing is the classic deep-paging cost: linear in
    page depth, cheap for the first pages, and capped by the same
    per-(set, unit) row bound as any top-k.  Ranks stay ABSOLUTE
    (page 2 of 10 is ranks 11..20).

  * search_after — cursor paging at any depth without the from+k
    priority-queue growth.  The cursor is the last hit's (score, doc_id);
    the next page is the top-k of the FULL scored match relation
    (plans/stats.score_docs) strictly after it in (score desc, doc_id
    asc) order.  O(sum df) per page — a batch engine pays the postings
    scan for any query anyway, and in exchange the cursor is EXACT at
    depth 10 or 10 million (no window to outgrow, no ES scroll-context
    state to keep alive server-side).  Cursors chain: feed the last row
    of one page back as the next page's cursor.

Float discipline: cursor comparisons are on the engine's own doubles.
Chain cursors from search_after pages (page 1 = cursors=None), not from
a different scorer's output, so equality on the tie-break is bitwise.
The cursor doc itself is excluded by doc_id as well, making the chain
robust even to a caller-rounded cursor score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from .bm25 import topk
from .stats import score_docs


def topk_page(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    k: int = spec.TOP_K_DEFAULT,
    page_from: int = 0,
    mode: str = spec.MODE_DISJUNCTIVE,
    with_url: bool = False,
) -> DataFrame:
    """(query_id, rank, doc_id[, url], score): ranks page_from+1 ..
    page_from+k of each query's result list (ES from/size).  Delegates to
    plans/bm25.topk at k' = page_from + k — the scan-side economics
    (payload bytes never shuffled, k' rows per (set, unit)) hold for any
    page depth."""
    out = topk(
        spark, index_root, queries, mode=mode, k=page_from + k,
        with_url=with_url,
    )
    if page_from > 0:
        out = out.filter(F.col("rank") > page_from)
    return out


def search_after(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    cursors: dict[str, tuple[float, int]] | None = None,
    k: int = spec.TOP_K_DEFAULT,
    mode: str = spec.MODE_DISJUNCTIVE,
) -> DataFrame:
    """(query_id, rank, doc_id, score): the k best hits strictly after
    each query's cursor in (score desc, doc_id asc) order; rank is 1..k
    WITHIN the page (the absolute position is unknown by design — same
    contract as ES search_after).  `cursors` maps query_id -> (score,
    doc_id) of the last hit already delivered; queries without a cursor
    (or cursors=None) get page 1."""
    rel = score_docs(spark, index_root, queries, mode)
    if cursors:
        cur = spark.createDataFrame(
            [(q, float(s), int(d)) for q, (s, d) in cursors.items()],
            "query_id string, c_score double, c_doc long",
        )
        rel = (
            rel.join(F.broadcast(cur), "query_id", "left")
            .filter(
                F.col("c_score").isNull()
                | (F.col("score") < F.col("c_score"))
                | (
                    (F.col("score") == F.col("c_score"))
                    & (F.col("doc_id") > F.col("c_doc"))
                )
            )
            .filter(
                F.col("c_doc").isNull() | (F.col("doc_id") != F.col("c_doc"))
            )
            .select("query_id", "doc_id", "score")
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        rel.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
