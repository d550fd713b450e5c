"""Ranking evaluation (ES `_rank_eval` API).

Elasticsearch's Ranking Evaluation API takes a set of queries, a ranked
result list per query, and relevance judgments (qrels), and returns
per-query retrieval-quality metrics: precision@k, recall@k, mean
reciprocal rank, and (normalized) discounted cumulative gain
(reference: https://www.elastic.co/guide/en/elasticsearch/reference/
current/search-rank-eval.html).  The reference engine's analog is the
manual relevance spot-checks its integration tests perform on canned
queries (integration_tests/.../test_consumers.py:42-44).

Spark-first shape: everything is a join between two result-scale
relations — the ranked list (queries × k rows) and the qrels (queries ×
judged docs) — so the evaluation itself never touches the corpus; it
scales with the number of queries, not the data.  Binary relevance, as
ES defaults to; DCG uses the standard 1/log2(rank+1) gain, ideal DCG is
the closed-form series over min(n_rel, k) computed with a deterministic
left fold (``aggregate`` over ``sequence``), no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rank_eval(ranked: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, n_rel, n_hits, precision_at_k, recall_at_k, rr, ndcg)
    per query.

    ``ranked``: (query_id, rank, doc_id) with rank 1-based, ≤ one row
    per (query, rank).  ``qrels``: (query_id, doc_id) binary-relevant
    pairs.  Queries appear in the output iff they have ≥1 judged
    relevant doc (metrics are undefined on an empty judgment set, per
    ES which errors on them)."""
    n_rel = qrels.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_rel")
    )
    hits = (
        ranked.filter(F.col("rank") <= k)
        .join(qrels, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.min("rank").alias("first_rank"),
            F.sum(
                F.lit(1.0) / F.log2(F.col("rank") + F.lit(1.0))
            ).alias("dcg"),
        )
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(k)).cast("int")),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i + F.lit(1.0)),
    )
    return (
        n_rel.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.lit(k), 6
            ).alias("precision_at_k"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.col("n_rel"), 6
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(
                    F.lit(1.0) / F.col("first_rank"), F.lit(0.0)
                ),
                6,
            ).alias("rr"),
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / idcg, 6
            ).alias("ndcg"),
        )
    )
