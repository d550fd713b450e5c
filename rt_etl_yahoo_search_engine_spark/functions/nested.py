"""ES join-data-model queries: `nested`, `has_child`, `has_parent`.

Elasticsearch models one-to-many structure two ways, and both exist
because FLATTENED fields give wrong answers: a flattened orders table
with lineitem arrays would match a parent whose quantity>=30 comes from
one line and discount>=0.05 from a DIFFERENT line.  The `nested` query
requires a SINGLE nested object to satisfy the whole inner predicate;
`has_child`/`has_parent` are the join-field equivalents across two
separately-indexed relations (ES docs: query-dsl-nested-query,
query-dsl-has-child-query, parent-join field).  The reference engine has
no join model at all (its read path is exact-id Postgres lookups, ref
src/services/daos/extracted_search_results_dao.py:23-63); this is the
ES-parity surface re-expressed over ordinary child RELATIONS — the
100 TB-native layout (a child table co-partitioned by parent key)
instead of ES's same-shard parent-join routing.

Semantics implemented (matching ES score modes):

* ``nested_topk``: children filtered by the per-OBJECT predicate
  (conjunction evaluated within one child row — the nested guarantee is
  free in a relational child table, because a row IS the object);
  matching children's scores roll up to the parent by ``score_mode``
  (sum | max | avg | count == ES "none" + filter counting); top-k
  parents.
* ``has_child_topk``: same rollup shape plus ES's ``min_children`` /
  ``max_children`` bounds on the number of matching children.
* ``has_parent_topk``: children of matching parents, each scored by the
  PARENT's score expression (ES has_parent with score=true: every child
  inherits its parent's score).

Scale shape: one scan-local child filter, one map-side-combinable
groupBy(child_key), one key-equi join to the parent relation (broadcast
when the matched-parent side is small; AQE picks), and a global top-k
via sort+limit — Spark plans that as TakeOrderedAndProject (per-partition
partial top-k, then a k-row driver merge), never a full global sort.
No window, no skew-prone wide row: the rolled-up relation is one row per
matched parent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MODES = ("sum", "max", "avg", "count")


def _rollup(child_score: Column, score_mode: str) -> Column:
    if score_mode == "sum":
        return F.sum(child_score)
    if score_mode == "max":
        return F.max(child_score)
    if score_mode == "avg":
        return F.avg(child_score)
    if score_mode == "count":  # ES score_mode=none: filter + count
        return F.count("*").cast("double")
    raise ValueError(f"score_mode must be one of {_MODES}")


def nested_topk(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_key: str,
    predicate: Column,
    child_score: Column,
    score_mode: str = "sum",
    k: int = 10,
) -> DataFrame:
    """(parent_key, score, n_matching) top-k parents whose nested
    objects (child rows) match `predicate` — the whole predicate within
    ONE child row, ES `nested` semantics — rolled up by `score_mode`."""
    rolled = (
        child.filter(predicate)
        .groupBy(F.col(child_key).alias(parent_key))
        .agg(
            _rollup(child_score, score_mode).alias("score"),
            F.count("*").cast("long").alias("n_matching"),
        )
    )
    return (
        parent.select(parent_key)
        .join(rolled, parent_key)
        .orderBy(F.desc("score"), F.asc(parent_key))
        .limit(k)
    )


def has_child_topk(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_key: str,
    predicate: Column,
    child_score: Column,
    score_mode: str = "max",
    min_children: int = 1,
    max_children: int | None = None,
    k: int = 10,
) -> DataFrame:
    """(parent_key, score, n_matching) top-k parents with between
    min_children and max_children children matching `predicate`,
    scored by `score_mode` over matching children — ES `has_child`."""
    rolled = (
        child.filter(predicate)
        .groupBy(F.col(child_key).alias(parent_key))
        .agg(
            _rollup(child_score, score_mode).alias("score"),
            F.count("*").cast("long").alias("n_matching"),
        )
        .filter(F.col("n_matching") >= min_children)
    )
    if max_children is not None:
        rolled = rolled.filter(F.col("n_matching") <= max_children)
    return (
        parent.select(parent_key)
        .join(rolled, parent_key)
        .orderBy(F.desc("score"), F.asc(parent_key))
        .limit(k)
    )


def has_parent_topk(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_key: str,
    parent_predicate: Column,
    parent_score: Column,
    child_id: str,
    k: int = 10,
) -> DataFrame:
    """(child_id, parent_key, score) top-k children whose PARENT matches
    `parent_predicate`; every child inherits its parent's
    `parent_score` — ES `has_parent` with score=true.  The matched-
    parent side is filtered before the join, so it broadcasts when
    selective."""
    p = parent.filter(parent_predicate).select(
        parent_key, parent_score.alias("score")
    )
    return (
        child.select(child_id, F.col(child_key).alias(parent_key))
        .join(p, parent_key)
        .orderBy(F.desc("score"), F.asc(child_id))
        .limit(k)
        .select(child_id, parent_key, "score")
    )


def children_agg(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    bucket_col: str,
    value_col: str,
) -> DataFrame:
    """(bucket, n_children, sum_value, avg_value) — ES `children`
    AGGREGATION (distinct from the has_child QUERY): a terms bucket over
    a PARENT field switches context to the child documents, so each
    parent bucket aggregates metrics over every child whose parent falls
    in it (ES docs: search-aggregations-bucket-children-aggregation).

    Scale shape: the children side never aggregates per parent first —
    one key-equi join attaches the parent's bucket label to each child
    row (the (parent_key, bucket) relation is two narrow columns,
    broadcast when the parent table is small; AQE picks otherwise), then
    ONE map-side-combinable groupBy(bucket).  Child payload columns are
    pruned to (child_key, value_col) before the join."""
    lab = parents.select(
        F.col(parent_key).alias("_k"), F.col(bucket_col).alias("bucket")
    )
    kids = children.select(
        F.col(child_key).alias("_k"), F.col(value_col).alias("_v")
    )
    return (
        kids.join(lab, "_k")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_children"),
            F.sum("_v").alias("sum_value"),
            F.avg("_v").alias("avg_value"),
        )
    )


def parent_agg(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    bucket_col: str,
    value_col: str,
) -> DataFrame:
    """(bucket, n_parents, sum_value, avg_value) — ES `parent`
    AGGREGATION: a terms bucket over a CHILD field switches context to
    the parent documents; each child bucket aggregates metrics over the
    DISTINCT parents that have at least one child in it (a parent with
    three matching children counts once — ES joins back to the parent
    doc set).

    Scale shape: children reduce to DISTINCT (bucket, parent key) pairs
    first (map-side-combinable distinct — the only corpus-scale work),
    then one narrow join to the parent metric columns and one
    groupBy(bucket)."""
    pairs = children.select(
        F.col(bucket_col).alias("bucket"), F.col(child_key).alias("_k")
    ).distinct()
    pmetrics = parents.select(
        F.col(parent_key).alias("_k"), F.col(value_col).alias("_v")
    )
    return (
        pairs.join(pmetrics, "_k")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_parents"),
            F.sum("_v").alias("sum_value"),
            F.avg("_v").alias("avg_value"),
        )
    )
