"""Hybrid retrieval: BM25 ⊕ embedding-cosine, fused by Reciprocal Rank
Fusion (RRF) — the modern retrieval stack's default way to combine a
lexical and a dense ranker without score normalization.

    rrf(d) = Σ_lists 1 / (k0 + rank_list(d)),  k0 = 60 (Cormack et al.)

Each list contributes only through its RANK, so the fusion is immune to
the two scores' incomparable scales, deterministic, and exactly
reproducible by a SQL oracle (ranks are integers; 1/(k0+r) is exact IEEE
arithmetic in any engine).

Plan shape at 100 TB:
  * lexical list — the existing scan-side TAAT BM25 top-k_each
    (plans/bm25.topk): posting bytes never shuffle, k_each rows per
    (query, unit) out.
  * dense list — brute-force cosine with the query vectors broadcast onto
    ONE scan of the embedding table (the functions/similarity.py baseline;
    swap in its IVF/LSH variants for corpus-scale ANN — RRF only needs the
    ranks, so the fusion is retriever-agnostic).
  * fusion — a full-outer join of two k_each×Q row relations (metadata
    scale) + one window.  Nothing corpus-scale moves after the two
    retrievals.

The caller supplies embeddings keyed by INDEX doc_id (same convention as
plans/stats.facet_counts attribute tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from ..functions.similarity import DOT_EXPR, NORM_EXPR
from . import bm25

RRF_K0 = 60


def rrf_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    query_vecs: DataFrame,
    embeddings: DataFrame,
    k: int = spec.TOP_K_DEFAULT,
    k_each: int = 50,
    k0: int = RRF_K0,
    mode: str = spec.MODE_DISJUNCTIVE,
) -> DataFrame:
    """(query_id, rank, doc_id, rrf): RRF fusion of the BM25 top-k_each and
    the cosine top-k_each per query.

    queries: query_id -> text (lexical side).
    query_vecs: (query_id, qemb array<float>) — dense side; a query_id may
    appear on either side or both (a missing list contributes nothing).
    embeddings: (doc_id, embedding array<float>) keyed by INDEX doc_id.
    """
    lex = (
        bm25.topk(spark, index_root, queries, mode=mode, k=k_each)
        .select("query_id", "doc_id", F.col("rank").alias("r_lex"))
    )
    scored = embeddings.crossJoin(F.broadcast(query_vecs)).withColumn(
        "cos",
        F.expr(DOT_EXPR.format(a="embedding", b="qemb"))
        / (
            F.expr(NORM_EXPR.format(a="embedding"))
            * F.expr(NORM_EXPR.format(a="qemb"))
        ),
    )
    w_cos = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    dense = (
        scored.withColumn("r_dense", F.row_number().over(w_cos))
        .filter(F.col("r_dense") <= k_each)
        .select("query_id", "doc_id", "r_dense")
    )
    fused = (
        lex.join(dense, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(F.lit(1.0) / (F.lit(k0) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(k0) + F.col("r_dense")), F.lit(0.0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "rrf")
    )


def linear_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    query_vecs: DataFrame,
    embeddings: DataFrame,
    w_lex: float = 0.7,
    w_dense: float = 0.3,
    k: int = spec.TOP_K_DEFAULT,
    k_each: int = 50,
    mode: str = spec.MODE_DISJUNCTIVE,
) -> DataFrame:
    """(query_id, rank, doc_id, fused) — ES's `linear` retriever (8.16+):
    weighted sum of MIN-MAX-normalized scores from the lexical and dense
    top-k_each lists,

        fused(d) = w_lex * norm_lex(d) + w_dense * norm_dense(d),
        norm(s)  = (s - min) / (max - min)   over the list's own top
                   k_each scores per query (1.0 when max == min — a
                   single-candidate list's doc is its best; documented
                   deterministic choice), 0 for a doc absent from a
                   list.

    Unlike RRF this uses the SCORES, so normalization happens per
    retriever per query over the retrieved window — exactly ES's
    minmax normalizer.  Plan shape matches rrf_topk: two top-k_each
    retrievals, per-query min/max on k_each-row relations (metadata
    scale), full-outer fuse, one window."""
    lex = (
        bm25.topk(spark, index_root, queries, mode=mode, k=k_each)
        .select("query_id", "doc_id", F.col("score").alias("s_lex"))
    )
    lex_mm = lex.groupBy("query_id").agg(
        F.min("s_lex").alias("_mn"), F.max("s_lex").alias("_mx")
    )
    lex_n = lex.join(lex_mm, "query_id").select(
        "query_id", "doc_id",
        F.when(
            F.col("_mx") > F.col("_mn"),
            (F.col("s_lex") - F.col("_mn")) / (F.col("_mx") - F.col("_mn")),
        ).otherwise(F.lit(1.0)).alias("n_lex"),
    )
    scored = embeddings.crossJoin(F.broadcast(query_vecs)).withColumn(
        "cos",
        F.expr(DOT_EXPR.format(a="embedding", b="qemb"))
        / (
            F.expr(NORM_EXPR.format(a="embedding"))
            * F.expr(NORM_EXPR.format(a="qemb"))
        ),
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("doc_id")
    )
    dense = (
        scored.withColumn("_r", F.row_number().over(w_cos))
        .filter(F.col("_r") <= k_each)
        .select("query_id", "doc_id", F.col("cos").alias("s_dense"))
    )
    den_mm = dense.groupBy("query_id").agg(
        F.min("s_dense").alias("_mn"), F.max("s_dense").alias("_mx")
    )
    den_n = dense.join(den_mm, "query_id").select(
        "query_id", "doc_id",
        F.when(
            F.col("_mx") > F.col("_mn"),
            (F.col("s_dense") - F.col("_mn"))
            / (F.col("_mx") - F.col("_mn")),
        ).otherwise(F.lit(1.0)).alias("n_dense"),
    )
    fused = (
        lex_n.join(den_n, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "fused",
            F.lit(w_lex) * F.coalesce(F.col("n_lex"), F.lit(0.0))
            + F.lit(w_dense) * F.coalesce(F.col("n_dense"), F.lit(0.0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("fused"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "fused")
    )
