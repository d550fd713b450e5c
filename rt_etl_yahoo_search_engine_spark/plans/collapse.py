"""Field collapsing: one result per group key (Elasticsearch `collapse`,
Lucene CollapsingTopDocsCollector) — "best hit per site" in a web UI.

Exactness over window tricks: ES collapses inside each shard's collector
over every competitive hit; a batch engine gets the same guarantee by
collapsing over the FULL scored match relation (plans/stats.score_docs,
O(sum df) narrow rows — the information floor, same as exact facets).
A retrieve-window-then-collapse shortcut (topk(k=W) then dedupe) is NOT
exact: one dominant key can fill any fixed window.

Scale shape: score_docs' scan emits (query, doc, score); one join to the
doc-keyed collapse-attribute table (facet_counts' join shape — at 100 TB
the attribute sidecar upgrade path described in plans/stats applies
unchanged), then a groupBy whose struct-max partial-aggregates map-side,
so the exchange after the join carries at most one row per (query, key)
per partition.  The final rank window sees |queries| x |distinct keys
among hits| rows — result-scale, not corpus-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from .stats import score_docs


def collapsed_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    collapse: DataFrame,
    k: int = spec.TOP_K_DEFAULT,
    mode: str = spec.MODE_DISJUNCTIVE,
) -> DataFrame:
    """(query_id, rank, key, doc_id, score): top-k hits after keeping only
    the best-scoring doc per collapse key (ties: lower doc_id), ranked by
    (score desc, doc_id asc) — plans/bm25.topk's order.  `collapse` is a
    (doc_id, <key>) table, one row per doc; its second column is the
    collapse field.  Hit docs missing from `collapse` are dropped (inner
    join), matching ES collapsing on a field the doc must have."""
    key_col = [c for c in collapse.columns if c != "doc_id"][0]
    rel = score_docs(spark, index_root, queries, mode)
    best = (
        rel.join(collapse.select("doc_id", key_col), "doc_id")
        .groupBy("query_id", F.col(key_col).alias("key"))
        # struct max: field-by-field compare -> max score, then max
        # negated doc_id == min doc_id on score ties
        .agg(
            F.max(
                F.struct(
                    F.col("score").alias("s"), (-F.col("doc_id")).alias("nd")
                )
            ).alias("b")
        )
        .select(
            "query_id",
            "key",
            (-F.col("b.nd")).cast("long").alias("doc_id"),
            F.col("b.s").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        best.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "key", "doc_id", "score")
    )


def grouped_top_hits(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    group: DataFrame,
    k_groups: int = spec.TOP_K_DEFAULT,
    per_group: int = 3,
    mode: str = spec.MODE_DISJUNCTIVE,
) -> DataFrame:
    """ES `terms` aggregation with a `top_hits` sub-aggregation — "best
    sites for this query, with each site's best pages": per query, the
    top `k_groups` buckets of the group field, each carrying its top
    `per_group` hits.  Output (query_id, group_rank, key, hit_rank,
    doc_id, score); buckets are ordered by their best hit (score desc,
    then that hit's doc_id asc — deterministic, ES's `order: max_score`),
    hits within a bucket by (score desc, doc_id asc).

    Exact for the same reason collapsed_topk is: computed over the FULL
    scored match relation, not a retrieve-window.  `group` is a
    (doc_id, <key>) table; hit docs missing from it are dropped.

    Scale shape: one join match-relation ⋈ group table, then a
    row_number window per (query, key) cut to `per_group` — the window
    sort is per-group match-scale and spills, and everything after it is
    at most |queries| x |keys| x per_group rows, result-scale.  The
    bucket-ranking window runs on one row per (query, key)."""
    key_col = [c for c in group.columns if c != "doc_id"][0]
    hits = score_docs(spark, index_root, queries, mode).join(
        group.select("doc_id", F.col(key_col).alias("key")), "doc_id"
    )
    wh = Window.partitionBy("query_id", "key").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    hits = hits.withColumn("hit_rank", F.row_number().over(wh)).filter(
        F.col("hit_rank") <= per_group
    )
    wg = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    buckets = (
        hits.filter(F.col("hit_rank") == 1)
        .withColumn("group_rank", F.row_number().over(wg))
        .filter(F.col("group_rank") <= k_groups)
        .select("query_id", "key", "group_rank")
    )
    return hits.join(F.broadcast(buckets), ["query_id", "key"]).select(
        "query_id", "group_rank", "key", "hit_rank", "doc_id", "score"
    )
