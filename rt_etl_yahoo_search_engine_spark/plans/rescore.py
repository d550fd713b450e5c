"""Query rescoring — Elasticsearch's `rescore` (Lucene QueryRescorer):
re-rank the top `window_size` hits of a cheap primary query with a more
selective secondary query, combining

    total = query_weight * primary + rescore_query_weight * secondary

with secondary = 0 for window docs the rescore query does not match.
ES semantics reproduced exactly:

  * Only the top `window_size` docs BY PRIMARY SCORE are rescored; docs
    outside the window keep their primary ordering strictly below the
    window (Lucene's QueryRescorer.rescore re-sorts the window in
    place), so for k <= window_size the final top-k comes entirely from
    the re-sorted window — which is what this returns (k > window_size
    is rejected rather than silently blended).
  * The window is selected by (primary score desc, doc_id asc) — the
    same total order every top-k in this engine uses — so the rescored
    set is deterministic under ties.

Scale shape: two score_docs passes over the SAME query plan shape
(postings decoded scan-side, narrow rows out — plans/stats.py), then a
join of the window (Q x window_size rows, request-scale) against the
secondary relation.  The window side is broadcast — it is bounded by
the request, never by the corpus — so the rescore combine adds zero
corpus-scale shuffles to the primary query.  This is the 100 TB story
for expensive ranking features generally: run the affordable scorer
corpus-wide, pay the expensive one only on request-scale candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from .stats import score_docs


def rescore_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    rescore_queries: dict[str, str],
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    k: int = spec.TOP_K_DEFAULT,
    mode: str = spec.MODE_DISJUNCTIVE,
) -> DataFrame:
    """(query_id, rank, doc_id, score): top-k after rescoring, ordered
    (total desc, doc_id asc).  `rescore_queries` maps the SAME query ids
    to the secondary query text; ids absent from it keep pure primary
    scores (weighted), matching ES requests with no rescore clause."""
    if k > window_size:
        raise ValueError("k must be <= window_size (ES rescore window)")
    wsel = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    window = (
        score_docs(spark, index_root, queries, mode)
        .withColumn("_wrn", F.row_number().over(wsel))
        .filter(F.col("_wrn") <= int(window_size))
        .select("query_id", "doc_id", F.col("score").alias("primary"))
    )
    sec_q = {q: t for q, t in rescore_queries.items() if q in queries}
    if sec_q:
        sec = score_docs(spark, index_root, sec_q, mode).select(
            "query_id", "doc_id", F.col("score").alias("secondary")
        )
        # Restrict the corpus-scale secondary relation to the window via
        # a broadcast inner join (window keys are request-scale), then
        # left-join the now-tiny result back — both broadcasts sit on a
        # valid build side (right), so no sort-merge exchange appears.
        sec_w = sec.join(
            F.broadcast(window.select("query_id", "doc_id")),
            ["query_id", "doc_id"],
        )
        window = window.join(
            F.broadcast(sec_w), ["query_id", "doc_id"], "left"
        )
    else:
        window = window.withColumn("secondary", F.lit(None).cast("double"))
    total = (
        F.lit(float(query_weight)) * F.col("primary")
        + F.lit(float(rescore_weight)) * F.coalesce("secondary", F.lit(0.0))
    )
    wfin = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        window.select("query_id", "doc_id", total.alias("score"))
        .withColumn("rank", F.row_number().over(wfin))
        .filter(F.col("rank") <= int(k))
        .select("query_id", "rank", "doc_id", "score")
    )
