"""The full Elasticsearch `bool` query — the four clause kinds composed
with their exact semantics, riding the primitives this engine already
proves individually:

  * must      — ALL clauses match (conjunctive), scores contribute;
  * should    — optional clauses ADD score; with `min_should_match`, at
    least that many must match (when a `must` exists ES defaults msm to
    0 — pure boost — which is the default here too; with no `must`,
    msm is effectively max(1, msm), matching ES's rewrite);
  * must_not  — matching docs are EXCLUDED (pure filter, never scored);
  * filter    — non-scoring attribute restriction (filter context).

Score = sum(must clause scores) + sum(matched should clause scores) —
ES/Lucene BooleanQuery's combine.

Scale shape: every piece is a narrow relation over the same scan-side
kernel — must/should via plans/stats.score_docs (O(sum df) rows,
unit-complete sums), must_not via match_docs, filter via a doc-keyed
semi-join — composed with result-scale joins keyed (query_id, doc_id).
No piece re-scans postings for another's benefit, and the final top-k
window runs on the already-restricted relation, so the kth result is
exact under all four clauses simultaneously (no post-filter gaps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from .stats import match_docs, score_docs


def bool_topk(
    spark: SparkSession,
    index_root: str,
    must: dict[str, str],
    should: dict[str, str] | None = None,
    must_not: dict[str, str] | None = None,
    allowed: DataFrame | None = None,
    min_should_match: int = 0,
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """(query_id, rank, doc_id, score): top-k under the composed bool
    query, ordered (score desc, doc_id asc).  `must`/`should`/`must_not`
    map the SAME query ids to clause text (ids absent from a dict simply
    have no clauses of that kind); `allowed` is the filter context's
    passing (doc_id) set, applied to every query."""
    should = should or {}
    must_not = must_not or {}
    if must:
        rel = score_docs(spark, index_root, must, spec.MODE_CONJUNCTIVE)
        if should:
            s = score_docs(
                spark, index_root, should, spec.MODE_DISJUNCTIVE,
                with_matched=True,
            ).select(
                "query_id", "doc_id",
                F.col("score").alias("_s_score"),
                F.col("n_matched").alias("_s_matched"),
            )
            rel = (
                rel.join(s, ["query_id", "doc_id"], "left")
                .filter(
                    F.coalesce("_s_matched", F.lit(0))
                    >= int(min_should_match)
                )
                .select(
                    "query_id",
                    "doc_id",
                    (
                        F.col("score") + F.coalesce("_s_score", F.lit(0.0))
                    ).alias("score"),
                )
            )
    elif should:
        # no must: ES rewrites msm to at least 1 (something has to match)
        msm = max(1, int(min_should_match))
        rel = score_docs(
            spark, index_root, should, spec.MODE_DISJUNCTIVE,
            with_matched=True,
        ).filter(F.col("n_matched") >= msm).select(
            "query_id", "doc_id", "score"
        )
    else:
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double"
        )
    if must_not:
        neg = match_docs(
            spark, index_root, must_not, spec.MODE_DISJUNCTIVE
        )
        rel = rel.join(neg, ["query_id", "doc_id"], "left_anti")
    if allowed is not None:
        rel = rel.join(
            allowed.select("doc_id").distinct(), "doc_id", "left_semi"
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        rel.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("query_id", "rank", "doc_id", "score")
    )
