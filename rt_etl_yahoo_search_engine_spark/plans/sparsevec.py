"""ES `sparse_vector` query — learned-sparse (ELSER-style) retrieval:
the query is a {token: weight} map, each document carries per-token
impact weights, and the score is the dot product of the two sparse
vectors over the inverted index.

This engine stores term frequencies as the per-token document impacts
(the classic impact choice; a learned-sparse deployment would write its
model's weights into the same posting value slot — the read path and
score shape below are unchanged), so

    score(q, d) = Σ_t  w_q(t) · tf_d(t)

over the terms the query weights.  Determinism: with dyadic query
weights (representable in binary — 0.25, 1.5, 2.0 ...) the per-doc sum
of weight·integer-tf terms is EXACT in IEEE double regardless of
aggregation order, so the score is partition-layout- and
engine-independent; ties break on doc_id.

Scale shape: rides `plans/stats.term_raw` — the same unit scan every
scoring path uses (term-isin row-group pruning, O(sum df) narrow int
rows, tombstones masked unit-locally); the query weight table is a
broadcast literal relation; scoring is one map-side-combinable
groupBy((query, doc)) sum and a per-query WindowGroupLimit top-k.  No
new I/O shape, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from .stats import term_raw


def sparse_vector_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, dict[str, float]],
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """(query_id, rank, doc_id, score): top-k by sparse dot product.
    `queries`: {query_id: {term: weight}} — weights should be dyadic
    for bit-exact determinism (module docstring)."""
    if not queries or all(not w for w in queries.values()):
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double"
        )
    qtext = {
        qid: " ".join(sorted(w)) for qid, w in queries.items() if w
    }
    raw = term_raw(spark, index_root, qtext)
    wrows = [
        (qid, t, float(wt))
        for qid, w in queries.items()
        for t, wt in w.items()
    ]
    wdf = spark.createDataFrame(
        wrows, "query_id string, term string, w double"
    )
    scored = (
        raw.join(F.broadcast(wdf), ["query_id", "term"])
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("w") * F.col("tf")).alias("score"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("int").alias("rank"),
            "doc_id", "score",
        )
    )
