"""Percolator — reverse search (ES `percolate` query).

Elasticsearch's percolator stores QUERIES in an index and, given a new
document, returns which stored queries match it — the alerting /
saved-search primitive (reference behavior:
https://www.elastic.co/guide/en/elasticsearch/reference/current/
query-dsl-percolate-query.html).  The reference engine's analog is the
stored search registry consulted on ingest
(src/services/yahoo_search_service.py:12's canned query plus the
client's saved queries).

Spark-first shape: the stored-query term table is tiny (queries ×
terms), so percolation is a BROADCAST join from the exploded distinct
document terms onto it, then a (doc, query) count compared against the
query's required-term count — one corpus scan, one broadcast, one
aggregation keyed by (doc_id, query_id) whose cardinality is bounded by
matches, not corpus × queries.  No per-document loop, no driver-side
matching: adding 1000× documents adds map work only.  Term-level
conjunction (AND of all query terms) with an optional
``min_match`` (ES `minimum_should_match`) relaxation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import spec
from ..functions.text_analysis import TOKENS_EXPR


def query_terms(queries: dict[str, str]) -> list[tuple[str, str, int]]:
    """(query_id, term, n_terms) rows — distinct analyzed terms per
    stored query (spec.tokenize, the repo's one analyzer), with the
    per-query required-term count."""
    rows = []
    for qid, text in queries.items():
        terms = sorted(set(spec.tokenize(text)))
        rows += [(qid, t, len(terms)) for t in terms]
    return rows


def percolate(
    docs: DataFrame,
    queries: dict[str, str],
    min_match: int | None = None,
) -> DataFrame:
    """(doc_id, query_id, n_matched) — stored queries matching each doc:
    all query terms present (conjunctive), or ≥ ``min_match`` of them
    when given."""
    spark = docs.sparkSession
    qterms = spark.createDataFrame(
        query_terms(queries), "query_id string, term string, n_terms int"
    )
    doc_terms = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.expr(TOKENS_EXPR))
        ).alias("term"),
    )
    need = (
        F.lit(min_match)
        if min_match is not None
        else F.col("n_terms")
    )
    return (
        doc_terms.join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count("*").cast("long").alias("n_matched"),
            F.first("n_terms").alias("n_terms"),
        )
        .filter(F.col("n_matched") >= need)
        .select("doc_id", "query_id", "n_matched")
    )
