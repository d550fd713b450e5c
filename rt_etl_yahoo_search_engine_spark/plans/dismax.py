"""Disjunction-max retrieval — Lucene DisjunctionMaxQuery / ES `dis_max`:
instead of summing per-clause BM25 weights (BooleanQuery's bag-of-words
score), a doc's score is its BEST clause weight plus `tie_breaker` times
the remaining clauses' weights:

    score = max_t w_t + tie_breaker * (sum_t w_t - max_t w_t)

Lucene applies this across arbitrary subqueries (classically per-field
best_fields); with this engine's single indexed text field the clauses
are the query's term clauses — the same DisjunctionMaxQuery-over-
TermQueries Lucene builds for best_fields on one field.  tie_breaker=0
is pure best-clause; 1.0 recovers the disjunctive sum (identity tested).

Scale shape: the combine is a per-doc numpy reduction inside
plans/stats.score_docs' unit kernel (per-clause weights are in hand
right before aggregation — max costs the same as sum), so this inherits
the scan-side economics: postings decoded once per unit, narrow rows
out, top-k window after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from .stats import score_docs


def dismax_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    tie_breaker: float = 0.0,
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """(query_id, rank, doc_id, score): top-k under the dis_max combine,
    ordered (score desc, doc_id asc) over the full match relation."""
    rel = score_docs(
        spark, index_root, queries, spec.MODE_DISJUNCTIVE,
        tie_breaker=float(tie_breaker),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        rel.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
