"""minimum_should_match retrieval — ES/Lucene's middle ground between
disjunctive (match ANY term) and conjunctive (match ALL terms): a doc
competes iff it matches at least `m` of the query's term clauses, and its
score is the ordinary disjunctive BM25 sum over the terms it does match.

Semantics notes (Lucene BooleanQuery.setMinimumNumberShouldMatch):

  * The threshold counts CLAUSES, i.e. distinct query terms.  A term
    absent from the index is a clause that can never match, so a query
    with fewer index-present terms than `m` returns no rows (ES behaves
    identically: MatchNoDocsQuery after rewrite).
  * m=1 is plain disjunctive; m=len(terms) is conjunctive — both reduce
    to the existing modes and stay consistent with them because the
    clause count below is computed by the same scorer.

Scale shape: rides plans/stats.score_docs(with_matched=True) — the
clause-match count is accumulated inside each (segment, doc-range shard)
unit from the postings the scorer already decoded (doc-range sharding
makes the per-unit count complete), so the threshold is one narrow-row
filter BEFORE the per-query top-k window.  No extra scan, no extra
shuffle vs the exact filtered/collapse family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from .stats import score_docs


def msm_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    min_should_match: int = 2,
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """(query_id, rank, doc_id, score): BM25 top-k among docs matching at
    least `min_should_match` distinct query terms; scores are the
    disjunctive sums over the matched terms (ES minimum_should_match).
    Ranks are exact — selection happens over the full scored match
    relation, ordered (score desc, doc_id asc)."""
    rel = score_docs(
        spark, index_root, queries, spec.MODE_DISJUNCTIVE, with_matched=True
    ).filter(F.col("n_matched") >= int(min_should_match))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        rel.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def terms_set_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    attrs: DataFrame,
    required_col: str = "required",
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """(query_id, rank, doc_id, score, n_matched, required) — ES's
    ``terms_set`` query with ``minimum_should_match_field``: the
    should-match threshold is PER DOCUMENT, read from a document field
    (`attrs`: a doc_id-keyed relation carrying `required_col`), not a
    query constant.  A doc competes iff it matches at least its own
    `required` distinct query terms; scores are the disjunctive BM25
    sums over the matched terms, ranked (score desc, doc_id asc).
    Docs whose `required` exceeds the query's clause count can never
    match — exactly ES's behaviour (the rewritten CoveringQuery is
    unsatisfiable for them).

    Scale shape: rides score_docs(with_matched=True) — the match
    relation is O(sum df) narrow rows with the clause count computed
    unit-locally; `attrs` joins on doc_id (AQE broadcasts when small,
    shuffles doc-scale otherwise — the same cost class as fetching any
    per-doc field) and the threshold is a filter BEFORE the per-query
    top-k window."""
    rel = score_docs(
        spark, index_root, queries, spec.MODE_DISJUNCTIVE, with_matched=True
    )
    req = attrs.select(
        "doc_id", F.col(required_col).cast("long").alias("_required")
    )
    rel = rel.join(req, "doc_id").filter(
        F.col("n_matched") >= F.col("_required")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        rel.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            "score",
            F.col("n_matched").cast("long").alias("n_matched"),
            F.col("_required").alias("required"),
        )
    )
