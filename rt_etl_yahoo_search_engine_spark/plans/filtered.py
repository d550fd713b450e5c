"""Attribute-filtered retrieval and sort-by-field result lists — the two
remaining Elasticsearch result-shaping primitives:

  * filtered_topk — ES bool query with a `filter` context: BM25-ranked
    top-k restricted to docs passing an attribute predicate.  The filter
    does not contribute to the score (ES filter-context semantics); it
    restricts WHICH docs compete, so the kth result is exact, not a
    post-filtered gap.  Exactness needs every competitive hit, not a
    retrieve-window guess (a selective filter can swallow any fixed
    window), so it sits on plans/stats.score_docs' full scored match
    relation — O(sum df) narrow rows, the same floor as exact facets.

  * sort_topk — ES `sort` by a doc field: each query's match set ordered
    by an attribute instead of relevance.  No scores are needed at all,
    so it rides the cheaper match_docs relation.

Scale shape: both take ONE semi/inner join of the narrow match relation
against a doc-keyed attribute table (facet_counts' join — and its
attribute-sidecar upgrade path in plans/stats applies unchanged), then a
per-query top-k window over result-scale rows.  Callers should push the
predicate INTO the attribute DataFrame (`attrs.filter(...)`) so it
reaches the attribute table's parquet scan as a pushed filter; the match
relation itself never widens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from .stats import match_docs, score_docs


def filtered_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    allowed: DataFrame,
    k: int = spec.TOP_K_DEFAULT,
    mode: str = spec.MODE_DISJUNCTIVE,
) -> DataFrame:
    """(query_id, rank, doc_id, score): BM25 top-k among the docs present
    in `allowed` (a one-column (doc_id) DataFrame — the filter context's
    passing set, typically `attrs.filter(pred).select("doc_id")`).
    Ranks are exact under the filter: selection happens AFTER the
    restriction, ordered (score desc, doc_id asc)."""
    rel = score_docs(spark, index_root, queries, mode).join(
        allowed.select("doc_id").distinct(), "doc_id", "left_semi"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        rel.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def sort_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    sort_attrs: DataFrame,
    k: int = spec.TOP_K_DEFAULT,
    mode: str = spec.MODE_DISJUNCTIVE,
    ascending: bool = True,
) -> DataFrame:
    """(query_id, rank, doc_id, sort_value): each query's match set
    ordered by a doc attribute (ES sort-by-field; ties -> doc_id asc),
    top-k per query.  `sort_attrs` is a (doc_id, <value>) table; its
    second column is the sort key.  Matching docs missing from it are
    dropped (inner join — ES requires the sort field to exist or an
    explicit `missing` policy; dropping IS the policy here)."""
    val_col = [c for c in sort_attrs.columns if c != "doc_id"][0]
    rel = match_docs(spark, index_root, queries, mode).join(
        sort_attrs.select("doc_id", val_col), "doc_id"
    )
    order = F.asc(val_col) if ascending else F.desc(val_col)
    w = Window.partitionBy("query_id").orderBy(order, F.asc("doc_id"))
    return (
        rel.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id", F.col(val_col).alias("sort_value")
        )
    )
