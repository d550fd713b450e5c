"""Pinned query — editorial result curation (ES `pinned` query).

ES's pinned query promotes an explicit id list to the top of the result
page, in the given order, with organic results (the wrapped query's
ranking, pinned ids excluded) below (reference:
https://www.elastic.co/guide/en/elasticsearch/reference/current/
query-dsl-pinned-query.html — ES implements the promotion as giant
constant scores; we report rank positions and flag the pinned rows,
score 0.0, since the sentinel scores carry no information).

Spark-first shape: everything after the organic top-k is result-scale —
the pinned list is a literal DataFrame, exclusion is a broadcast anti
join, and the re-rank is a window over ≤ k+m rows per query.  The
organic retrieval over-fetches k+m so exclusion can never leave the
page short."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from . import bm25


def pinned_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    pinned: dict[str, list[int]],
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """(query_id, rank, doc_id, score, pinned) — pinned ids (ORIGINAL
    doc-id space, the docmap url convention) at ranks 1..m in list
    order with score 0.0, organic BM25 ranks m+1.. with their scores,
    pinned ids excluded from the organic section; top-k total.  A
    query with no pinned list is pure organic.  Pinned ids are emitted
    whether or not they match the query — ES pins unconditionally."""
    m_max = max((len(v) for v in pinned.values()), default=0)
    organic = bm25.topk(
        spark,
        index_root,
        queries,
        mode=spec.MODE_DISJUNCTIVE,
        k=k + m_max,
        with_url=True,
    ).select(
        "query_id",
        F.col("url").cast("long").alias("doc_id"),
        "score",
        "rank",
    )
    pin_rows = [
        (qid, int(d), i + 1)
        for qid, ids in pinned.items()
        for i, d in enumerate(ids)
        if qid in queries
    ]
    if not pin_rows:
        return organic.filter(F.col("rank") <= k).select(
            "query_id", "rank", "doc_id", "score",
            F.lit(False).alias("pinned"),
        )
    pins = spark.createDataFrame(
        pin_rows, "query_id string, doc_id long, prank int"
    )
    counts = pins.groupBy("query_id").agg(F.count("*").alias("m"))
    w = Window.partitionBy("query_id").orderBy("rank")
    org = (
        organic.join(F.broadcast(pins), ["query_id", "doc_id"], "left_anti")
        .join(F.broadcast(counts), "query_id", "left")
        .withColumn(
            "new_rank",
            F.row_number().over(w) + F.coalesce("m", F.lit(0)),
        )
        .select(
            "query_id",
            F.col("new_rank").alias("rank"),
            "doc_id",
            "score",
            F.lit(False).alias("pinned"),
        )
    )
    pin_out = pins.select(
        "query_id",
        F.col("prank").alias("rank"),
        "doc_id",
        F.lit(0.0).alias("score"),
        F.lit(True).alias("pinned"),
    )
    return pin_out.unionByName(org).filter(F.col("rank") <= k)
