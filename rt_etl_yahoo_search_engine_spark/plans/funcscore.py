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


DECAY_LINEAR = "linear"
DECAY_GAUSS = "gauss"
DECAY_EXP = "exp"


def decay_score_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    values: DataFrame,
    origin: float,
    scale: float,
    decay: float = 0.5,
    offset: float = 0.0,
    shape: str = DECAY_LINEAR,
    k: int = spec.TOP_K_DEFAULT,
    mode: str = spec.MODE_DISJUNCTIVE,
) -> DataFrame:
    """Elasticsearch `function_score` DECAY functions (`linear` /
    `gauss` / `exp` on a numeric field): final = bm25 * d(dist), where
    dist = max(0, |v - origin| - offset) and d is the shape with
    d(0)=1, d(scale)=decay —

        linear: max(0, (s - dist) / s),        s = scale / (1 - decay)
        gauss:  exp(-dist^2 / (2 sigma^2)),    sigma^2 = -scale^2 / (2 ln decay)
        exp:    exp(lambda * dist),            lambda = ln(decay) / scale

    Docs missing from `values` (a (doc_id, v) DataFrame) keep their BM25
    score (multiplier 1, ES's missing-field behaviour).  Same
    full-scored-relation exactness argument and scale shape as
    function_score_topk (a decayed doc can only FALL in rank, but a
    missing-field doc can overtake the decayed top-k, so the full
    relation is still required).

    Note for oracle-faithful use: the `linear` shape is pure rational
    arithmetic — bit-identical across engines; gauss/exp depend on the
    platform's libm exp()."""
    import math

    if shape not in (DECAY_LINEAR, DECAY_GAUSS, DECAY_EXP):
        raise ValueError(f"unknown decay shape: {shape!r}")
    if not (0.0 < decay < 1.0):
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    val_col = [c for c in values.columns if c != "doc_id"][0]
    rel = score_docs(spark, index_root, queries, mode).join(
        values.select("doc_id", val_col), "doc_id", "left"
    )
    dist = F.greatest(
        F.lit(0.0),
        F.abs(F.col(val_col).cast("double") - F.lit(float(origin)))
        - F.lit(float(offset)),
    )
    if shape == DECAY_LINEAR:
        s = scale / (1.0 - decay)
        mult = F.greatest(F.lit(0.0), (F.lit(s) - dist) / F.lit(s))
    elif shape == DECAY_GAUSS:
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        mult = F.exp(-(dist * dist) / F.lit(2.0 * sigma2))
    else:
        lam = math.log(decay) / scale
        mult = F.exp(F.lit(lam) * dist)
    combined = F.when(
        F.col(val_col).isNull(), F.col("score")
    ).otherwise(F.col("score") * mult)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("final"), F.asc("doc_id")
    )
    return (
        rel.withColumn("final", combined)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id", F.col("final").alias("score")
        )
    )


def distance_feature_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    values: DataFrame,
    origin: float,
    pivot: float,
    boost: float = 1.0,
    k: int = spec.TOP_K_DEFAULT,
    mode: str = spec.MODE_DISJUNCTIVE,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — ES `distance_feature` query as
    a bool-should clause beside the text query:

        final = bm25 + boost * pivot / (pivot + |v - origin|)

    the recency/proximity boost ES applies to date and numeric fields
    (docs closest to `origin` gain up to `boost`; the contribution decays
    hyperbolically with pivot as the half-boost distance).  Docs absent
    from `values` (or NULL) contribute 0 — ES's missing-field behaviour
    inside a should clause.  The transform is pure rational arithmetic
    (no libm), so scores are bit-reproducible across engines.

    Scale shape: identical to rank_feature_topk — the exact scored match
    relation (O(sum df) narrow rows) joined once against the doc-keyed
    value table, codegen arithmetic, per-query top-k window over
    result-scale rows.  Exactness needs the full relation: an unboosted
    doc far down the BM25 order can overtake a boosted one only if every
    matching doc is scored, so no retrieve-window shortcut is sound."""
    if pivot <= 0:
        raise ValueError(f"pivot must be positive, got {pivot}")
    val_col = [c for c in values.columns if c != "doc_id"][0]
    v = F.col(val_col).cast("double")
    contrib = F.lit(float(pivot)) / (
        F.lit(float(pivot)) + F.abs(v - F.lit(float(origin)))
    )
    rel = score_docs(spark, index_root, queries, mode).join(
        values.select("doc_id", val_col), "doc_id", "left"
    )
    combined = F.col("score") + F.lit(float(boost)) * F.coalesce(
        contrib, F.lit(0.0)
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


RANK_FEATURE_SATURATION = "saturation"
RANK_FEATURE_LOG = "log"
RANK_FEATURE_SIGMOID = "sigmoid"


def rank_feature_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    features: DataFrame,
    k: int = spec.TOP_K_DEFAULT,
    mode: str = spec.MODE_DISJUNCTIVE,
    function: str = RANK_FEATURE_SATURATION,
    pivot: float = 100.0,
    scale: float = 1.0,
    exponent: float = 2.0,
    boost: float = 1.0,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — ES `rank_feature` query as a
    bool-should clause beside the text query: final = bm25 + boost *
    f(feature), where f is ES's saturation S/(S+pivot), log
    ln(1 + scale*S), or sigmoid S^exp/(S^exp + pivot^exp).  Docs absent
    from `features` (or NULL) take contribution 0 — ES's "doesn't match
    the rank_feature clause" inside a should.

    `features` is (doc_id, <value>): the single non-doc_id column is the
    feature (ES rank_feature fields are positive floats by contract).

    Scale shape: identical to function_score_topk — the exact scored
    match relation (O(sum df) narrow rows) joined once against the
    doc-keyed feature table, codegen arithmetic, per-query top-k window
    over result-scale rows.  The feature transform itself is a pure
    column expression, so Catalyst folds it into the same stage."""
    if function not in (
        RANK_FEATURE_SATURATION, RANK_FEATURE_LOG, RANK_FEATURE_SIGMOID
    ):
        raise ValueError(f"unknown rank_feature function: {function!r}")
    val_col = [c for c in features.columns if c != "doc_id"][0]
    s = F.col(val_col).cast("double")
    if function == RANK_FEATURE_SATURATION:
        contrib = s / (s + F.lit(float(pivot)))
    elif function == RANK_FEATURE_LOG:
        contrib = F.log(F.lit(1.0) + F.lit(float(scale)) * s)
    else:
        sp = F.pow(s, F.lit(float(exponent)))
        contrib = sp / (sp + F.lit(float(pivot) ** float(exponent)))
    rel = score_docs(spark, index_root, queries, mode).join(
        features.select("doc_id", val_col), "doc_id", "left"
    )
    combined = F.col("score") + F.lit(float(boost)) * F.coalesce(
        contrib, F.lit(0.0)
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
