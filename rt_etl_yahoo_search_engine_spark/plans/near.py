"""NEAR (unordered proximity) queries over the positional sidecar.

Semantics — the classic unordered-window operator (Lucene's sloppy span /
Indri's #uwN): a document matches query q with window W iff some span of
at most W consecutive token positions contains at least one occurrence of
EVERY distinct query term.  Matched docs are ranked by the same
conjunctive BM25 as plain queries (score DESC, doc_id ASC tie-break),
top-k per query.  W = len(query terms) degenerates to "all terms
adjacent in some order"; W = infinity degenerates to plain conjunctive.

The reference engine has no proximity operator (its read path is
Postgres LIKE-free exact-id lookups, ref src/services/daos/
extracted_search_results_dao.py:23-63); this is part of the fulltext
surface a search user expects next to quoted phrases.

Plan (all relational, zero Python):
  1. candidates + exact scores: the index conjunctive FULL match set
     (plans/bm25.topk, k = n_docs) — same retrieval the phrase plan uses;
  2. proximity verify from the positional sidecar ONLY (this operator
     REQUIRES the sidecar — there is no text fallback, because a text
     scan cannot decide windows without re-tokenizing every candidate):
     read the query terms' position lists (term-isin row-group pruned,
     O(sum df) bytes), explode to (query, doc, term, p), and decide
     "some window of W covers all terms" with an ANCHOR self-join: a
     minimal covering window starts at one of the occurrences, so
       match iff EXISTS anchor position a with
         count(DISTINCT term | p in [a, a+W-1]) == n_terms.
     The join blowup per (query, doc) is occurrences x window-occupancy —
     bounded, because candidates are already conjunctively filtered;
  3. window re-rank of the verified docs, rank <= k.

100 TB note: phase 2's self-join shuffles only (query_id, doc_id, term,
p) rows for CANDIDATE docs of the query's terms — never text, never
posting payloads.  A stop-word-only NEAR query degenerates exactly like
a stop-word phrase (candidates ~ corpus), and the sidecar keeps even
that case at O(sum df) I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from ..operators.positions import read_positions
from ..sources.catalog import Catalog
from . import bm25


def near_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    window: int = 8,
    k: int = spec.TOP_K_DEFAULT,
    with_url: bool = False,
) -> DataFrame:
    """Top-k BM25 over docs whose tokens contain all of each query's terms
    within a window of `window` consecutive positions (module docstring).

    Requires the positional sidecar (operators.positions.build_positions);
    raises the sidecar's absent/stale errors otherwise.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    empty = spark.createDataFrame(
        [], "query_id string, rank int, doc_id long, score double"
        + (", url string" if with_url else ""),
    )
    qterms = {qid: sorted(set(spec.tokenize(t))) for qid, t in queries.items()}
    live = {qid: ts for qid, ts in qterms.items() if ts}
    if not live:
        return empty

    reg = Catalog(index_root).read_registry()
    n_docs = int(reg["n_docs"])
    candidates = bm25.topk(
        spark,
        index_root,
        {qid: " ".join(ts) for qid, ts in live.items()},
        mode=spec.MODE_CONJUNCTIVE,
        k=max(n_docs, 1),
        with_url=True,
    ).drop("rank")

    qt = spark.createDataFrame(
        [(qid, t, len(ts)) for qid, ts in live.items() for t in ts],
        "query_id string, term string, n_terms int",
    )
    terms = sorted({t for ts in live.values() for t in ts})
    pos = read_positions(spark, index_root, terms)
    # exploded (query, doc, term, p) for candidate docs only; the
    # candidate join is unhinted for the same reason as the phrase plan
    # (AQE broadcasts selective sets; stop-word sets must stay a shuffle)
    ex = (
        pos.join(F.broadcast(qt), "term")
        .join(candidates.select("query_id", "doc_id"), ["query_id", "doc_id"])
        .select(
            "query_id", "doc_id", "term", "n_terms",
            F.explode("positions").alias("p"),
        )
    )
    a = ex.select(
        "query_id", "doc_id", "n_terms", F.col("p").alias("anchor")
    )
    b = ex.select(
        "query_id", "doc_id",
        F.col("term").alias("b_term"), F.col("p").alias("b_p"),
    )
    matched = (
        a.join(b, ["query_id", "doc_id"])
        .filter(
            (F.col("b_p") >= F.col("anchor"))
            & (F.col("b_p") < F.col("anchor") + F.lit(window))
        )
        .groupBy("query_id", "doc_id", "anchor", "n_terms")
        .agg(F.count_distinct("b_term").alias("hit"))
        .filter(F.col("hit") == F.col("n_terms"))
        .select("query_id", "doc_id")
        .distinct()
    )
    verified = candidates.join(matched, ["query_id", "doc_id"])

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    cols = ["query_id", "rank", "doc_id", "score"] + (["url"] if with_url else [])
    return (
        verified.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*cols)
    )
