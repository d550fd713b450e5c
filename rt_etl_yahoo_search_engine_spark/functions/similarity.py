"""Similarity search over embedding columns (array<float>).

Two paths:
  * cosine_topk      — brute-force exact top-k: the correctness baseline.
    Dot products run JVM-side via aggregate(zip_with(...)) inside whole-stage
    codegen; the query side is broadcast, so cost is one scan of the corpus
    per query batch — the right baseline shape even at scale.
  * lsh_cosine_topk  — sign-bit LSH (axis-aligned hyperplanes on the first
    `n_planes` dimensions) bucketing; candidates are same-bucket rows only,
    so the pairwise work drops from O(N*Q) to O(bucket * Q).  Recall is
    tunable via n_planes; exactness is NOT guaranteed (scale path).

All arithmetic is cast to double with a fixed evaluation order so the DuckDB
oracle (same formula textually) hash-matches after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
)
NORM_EXPR = (
    "sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)),"
    " 0D, (acc, v) -> acc + v))"
)


def cosine_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """(query_id, rank, vec_id, cos) exact brute-force cosine top-k.
    embeddings: (vec_id: long, embedding: array<float>)."""
    q = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
        )
    )
    joined = embeddings.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.withColumn(
        "cos",
        F.expr(DOT_EXPR.format(a="embedding", b="qemb"))
        / (
            F.expr(NORM_EXPR.format(a="embedding"))
            * F.expr(NORM_EXPR.format(a="qemb"))
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def sign_bucket(col: str, n_planes: int = 8):
    """LSH bucket key: sign bits of the first n_planes dimensions."""
    return F.expr(
        f"concat_ws('', transform(slice({col}, 1, {n_planes}),"
        f" x -> case when x > 0 then '1' else '0' end))"
    )


def lsh_cosine_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10, n_planes: int = 8
) -> DataFrame:
    """(query_id, rank, vec_id, cos) top-k among SAME-BUCKET candidates."""
    emb = embeddings.withColumn("bucket", sign_bucket("embedding", n_planes))
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qemb"),
        F.col("bucket").alias("qbucket"),
    )
    joined = emb.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = joined.withColumn(
        "cos",
        F.expr(DOT_EXPR.format(a="embedding", b="qemb"))
        / (
            F.expr(NORM_EXPR.format(a="embedding"))
            * F.expr(NORM_EXPR.format(a="qemb"))
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )
