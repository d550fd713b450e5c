"""Function scoring — Elasticsearch `function_score` with a
`field_value_factor`: the final rank order is BM25 combined with a
per-document signal (freshness, popularity, page quality), the standard
way a web engine folds static doc priors into text relevance.

Semantics (ES parity): for each hit, `final = bm25 ∘ factor(doc)` where
``∘`` is the boost_mode (`multiply` or `sum`) and `factor` is a numeric
per-doc value the CALLER has already modifier-transformed (ES's `log1p`,
`sqrt`, ... are just column expressions on the factor DataFrame — keeping
the transform caller-side keeps this operator a pure combine).  Docs the
factor table is missing get `missing` (ES's `field_value_factor.missing`).

Exactness needs the FULL scored match relation: a doc ranked far below
the BM25 top-k can multiply into the final top-k (any retrieve-window
shortcut is wrong for unbounded factors), so this sits on
plans/stats.score_docs — O(sum df) narrow rows, the exact-facets floor.

Scale shape: one join of the narrow match relation against the doc-keyed
factor table (facet_counts' join; the attribute-sidecar upgrade path in
plans/stats applies unchanged), a codegen'd arithmetic combine, then the
per-query top-k window over result-scale rows.  Nothing widens the match
relation and no per-row Python runs.

Reference parity: the reference engine has no rank-combination stage —
its serving path returns raw relevance order
(reference src/search/results.py-equivalent); this is part of the
LLM-pipeline extension surface (quality-score-weighted retrieval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from .stats import score_docs

BOOST_MULTIPLY = "multiply"
BOOST_SUM = "sum"


def function_score_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    factors: DataFrame,
    k: int = spec.TOP_K_DEFAULT,
    mode: str = spec.MODE_DISJUNCTIVE,
    boost_mode: str = BOOST_MULTIPLY,
    missing: float = 1.0,
) -> DataFrame:
    """(query_id, rank, doc_id, score): top-k by the combined score
    ``bm25 * factor`` (boost_mode='multiply') or ``bm25 + factor``
    ('sum'), ties -> doc_id asc.  `factors` is a (doc_id, <value>)
    DataFrame — its non-doc_id column is the (already modifier-applied)
    factor; matching docs absent from it take `missing`."""
    if boost_mode not in (BOOST_MULTIPLY, BOOST_SUM):
        raise ValueError(f"unknown boost_mode: {boost_mode!r}")
    val_col = [c for c in factors.columns if c != "doc_id"][0]
    rel = score_docs(spark, index_root, queries, mode).join(
        factors.select("doc_id", val_col), "doc_id", "left"
    )
    fv = F.coalesce(F.col(val_col).cast("double"), F.lit(float(missing)))
    combined = (
        F.col("score") * fv
        if boost_mode == BOOST_MULTIPLY
        else F.col("score") + fv
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        rel.withColumn("score", combined)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
