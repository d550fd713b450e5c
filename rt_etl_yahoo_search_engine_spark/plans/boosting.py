"""Boosting query — ES/Lucene `boosting`: rank by the positive query's
BM25 score, DEMOTING (not excluding) docs that also match a negative
query: matched-negative docs keep competing with score multiplied by
`negative_boost` (0 < b < 1).  The middle ground between plain retrieval
and the hard minus-term exclusion plans/search.py already implements.

Per Lucene's BoostingQuery the negative part contributes nothing to the
score except the multiplier, and a doc matching ONLY the negative query
never appears.  Negative queries are keyed by the same query_id as their
positive counterpart; a query_id with no negative entry is left
undemoted.

Scale shape: the positive side is plans/stats.score_docs (scan-side
scoring, narrow rows); the negative side is plans/stats.match_docs over
the negative term set — a second pruned postings scan emitting only
(query_id, doc_id) pairs, usually far smaller.  One narrow left join
marks demotion, then the per-query top-k window.  Nothing corpus-scale
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from .stats import match_docs, score_docs


def boosting_topk(
    spark: SparkSession,
    index_root: str,
    positive: dict[str, str],
    negative: dict[str, str],
    negative_boost: float = 0.5,
    k: int = spec.TOP_K_DEFAULT,
    mode: str = spec.MODE_DISJUNCTIVE,
) -> DataFrame:
    """(query_id, rank, doc_id, score): positive-query BM25 top-k with
    matched-negative docs multiplied by `negative_boost`, ordered
    (score desc, doc_id asc) AFTER demotion — a demoted doc can fall out
    of the top-k and a clean doc can rise in, exactly (full match
    relation, not a rescore window)."""
    pos = score_docs(spark, index_root, positive, mode)
    neg = (
        match_docs(spark, index_root, negative, spec.MODE_DISJUNCTIVE)
        .withColumn("neg", F.lit(True))
    )
    rel = pos.join(neg, ["query_id", "doc_id"], "left").select(
        "query_id",
        "doc_id",
        F.when(F.col("neg").isNotNull(),
               F.col("score") * F.lit(float(negative_boost)))
        .otherwise(F.col("score"))
        .alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        rel.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
