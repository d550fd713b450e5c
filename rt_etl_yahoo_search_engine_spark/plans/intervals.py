"""Elasticsearch `intervals` query over the positional sidecar.

The intervals query matches documents by RULES over token positions and
composes them: a `match` rule finds spans of the analyzed text
(`ordered`, `max_gaps`), and `any_of` / `all_of` combine sub-rules.
This is the power-user proximity surface (ES docs: query-dsl-intervals);
the reference engine has no proximity operator at all (its read path is
exact-id Postgres lookups, ref src/services/daos/
extracted_search_results_dao.py:23-63).

Supported surface and its exact semantics:

* ``Match(text, ordered, max_gaps)`` — a doc matches iff its tokens
  contain an occurrence of every term of `text` (duplicates kept when
  ordered — "a a b" needs two a's before a b):
    - ordered:   positions p_1 < ... < p_n in query order with width
                 p_n - p_1 + 1 <= n + max_gaps (gaps = width - n, the ES
                 definition); max_gaps=-1 -> unbounded (just in order).
    - unordered: some window of n + max_gaps consecutive positions
                 covers all n DISTINCT terms; max_gaps=-1 -> containment
                 anywhere in the doc.
* ``AnyOf(sources)`` — minimal-interval union: a doc matches iff any
  child matches (exact, because any_of's interval set is the union).
* ``AllOf(sources)`` — unordered, unbounded combination: a doc matches
  iff EVERY child matches (ES all_of with ordered=false, max_gaps=-1,
  overlaps allowed — Lucene's `Intervals.unordered`).  When `ordered`
  or `max_gaps` is set, the node is supported ONLY if every child is a
  single-term Match — it then collapses to the equivalent Match leaf;
  cross-child gap/order constraints over multi-term children need full
  minimal-interval algebra and raise NotImplementedError (honest
  guardrail, not silent wrong answers).

Ranking: matched docs are ordered by disjunctive BM25 over the UNION of
the query's terms (score DESC, doc_id ASC), top-k — interval rules
decide MATCHING, the text statistics decide ORDER, the same contract as
the other positional plans.

Plan shape (all relational, zero Python):
  1. every Match leaf across the whole query batch becomes one entry of
     a conjunctive match_docs call (unit-local set algebra, narrow
     (leaf, doc) rows);
  2. leaves needing positional verify read the positions sidecar ONCE
     for the union of their terms (term-isin row-group pruned,
     O(sum df) bytes) — unordered leaves batch through a single
     anchor-window self-join with a per-leaf window column, ordered
     leaves through the span_near greedy join+min fold grouped by term
     count, with a per-leaf span bound column;
  3. the source tree combines leaf match sets driver-side as DataFrame
     unions / inner joins (trees are tiny; sets are narrow);
  4. one score_docs pass over the union terms + the top-k window.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from ..operators.positions import read_positions
from .stats import match_docs, score_docs

_UNBOUNDED = 1 << 62


@dataclass(frozen=True)
class Match:
    text: str
    ordered: bool = False
    max_gaps: int = -1


@dataclass(frozen=True)
class AnyOf:
    sources: tuple


@dataclass(frozen=True)
class AllOf:
    sources: tuple
    ordered: bool = False
    max_gaps: int = -1


Source = Union[Match, AnyOf, AllOf]


def _normalize(node: Source) -> Source:
    """Collapse constrained AllOf-of-single-terms into a Match leaf;
    reject constrained AllOf over anything wider."""
    if isinstance(node, Match):
        return node
    if isinstance(node, AnyOf):
        return AnyOf(tuple(_normalize(s) for s in node.sources))
    kids = tuple(_normalize(s) for s in node.sources)
    if not node.ordered and node.max_gaps < 0:
        return AllOf(kids)
    texts = []
    for s in kids:
        if not isinstance(s, Match) or len(spec.tokenize(s.text)) != 1:
            raise NotImplementedError(
                "all_of with ordered/max_gaps needs single-term children "
                "(cross-child interval algebra is not implemented)"
            )
        texts.append(spec.tokenize(s.text)[0])
    return Match(" ".join(texts), ordered=node.ordered,
                 max_gaps=node.max_gaps)


def _leaves(node: Source, path: str, out: dict) -> None:
    if isinstance(node, Match):
        out[path] = node
    else:
        for i, s in enumerate(node.sources):
            _leaves(s, f"{path}.{i}", out)


def _terms(node: Source) -> set:
    if isinstance(node, Match):
        return set(spec.tokenize(node.text))
    return set().union(*(_terms(s) for s in node.sources))


def _leaf_matches(
    spark: SparkSession, index_root: str, leaves: dict[str, Match]
) -> DataFrame:
    """(lkey, doc_id) match relation for every Match leaf, batched."""
    seqs = {k: spec.tokenize(m.text) for k, m in leaves.items()}
    live = {k: ts for k, ts in seqs.items() if ts}
    cand = match_docs(
        spark,
        index_root,
        {k: " ".join(sorted(set(ts))) for k, ts in live.items()},
        mode=spec.MODE_CONJUNCTIVE,
    ).select(F.col("query_id").alias("lkey"), "doc_id")

    trivial = [
        k for k, ts in live.items()
        if len(ts) < 2 or (not leaves[k].ordered and leaves[k].max_gaps < 0)
    ]
    unord = {
        k: ts for k, ts in live.items()
        if k not in trivial and not leaves[k].ordered
    }
    order = {
        k: ts for k, ts in live.items()
        if k not in trivial and leaves[k].ordered
    }
    parts = []
    if trivial:
        parts.append(cand.filter(F.col("lkey").isin(trivial)))

    need = sorted(
        {t for k in list(unord) + list(order) for t in live[k]}
    )
    if need:
        pos = read_positions(spark, index_root, need)

    if unord:
        # one anchor-window join for every unordered leaf: W rides a
        # per-leaf column so leaves of different widths batch together
        qt = spark.createDataFrame(
            [
                (k, t, len(set(ts)), len(set(ts)) + leaves[k].max_gaps)
                for k, ts in unord.items()
                for t in set(ts)
            ],
            "lkey string, term string, n_terms int, win int",
        )
        ex = (
            pos.join(F.broadcast(qt), "term")
            .join(
                cand.filter(F.col("lkey").isin(list(unord))),
                ["lkey", "doc_id"],
            )
            .select(
                "lkey", "doc_id", "term", "n_terms", "win",
                F.explode("positions").alias("p"),
            )
        )
        a = ex.select(
            "lkey", "doc_id", "n_terms", "win", F.col("p").alias("anchor")
        )
        b = ex.select(
            "lkey", "doc_id",
            F.col("term").alias("b_term"), F.col("p").alias("b_p"),
        )
        parts.append(
            a.join(b, ["lkey", "doc_id"])
            .filter(
                (F.col("b_p") >= F.col("anchor"))
                & (F.col("b_p") < F.col("anchor") + F.col("win"))
            )
            .groupBy("lkey", "doc_id", "anchor", "n_terms")
            .agg(F.count_distinct("b_term").alias("hit"))
            .filter(F.col("hit") == F.col("n_terms"))
            .select("lkey", "doc_id")
            .distinct()
        )

    if order:
        # span_near's greedy join+min fold, grouped by sequence length,
        # with a per-leaf span bound column (unbounded -> huge sentinel)
        seq_rows = [
            (
                k, i, t, len(ts),
                len(ts) - 1 + leaves[k].max_gaps
                if leaves[k].max_gaps >= 0 else _UNBOUNDED,
            )
            for k, ts in order.items()
            for i, t in enumerate(ts)
        ]
        qt = spark.createDataFrame(
            seq_rows,
            "lkey string, idx int, term string, n_terms int, bound long",
        )
        ex = (
            pos.join(F.broadcast(qt), "term")
            .join(
                cand.filter(F.col("lkey").isin(list(order))),
                ["lkey", "doc_id"],
            )
            .select(
                "lkey", "doc_id", "idx", "n_terms", "bound",
                F.explode("positions").alias("p"),
            )
        )
        for n in sorted({len(ts) for ts in order.values()}):
            exn = ex.filter(F.col("n_terms") == n)
            m = exn.filter(F.col("idx") == 0).select(
                "lkey", "doc_id", "bound",
                F.col("p").alias("start"), F.col("p").alias("cur"),
            )
            for i in range(1, n):
                nxt = exn.filter(F.col("idx") == i).select(
                    "lkey", "doc_id", "p"
                )
                m = (
                    m.join(nxt, ["lkey", "doc_id"])
                    .filter(
                        (F.col("p") > F.col("cur"))
                        & (F.col("p") <= F.col("start") + F.col("bound"))
                    )
                    .groupBy("lkey", "doc_id", "start", "bound")
                    .agg(F.min("p").alias("cur"))
                )
            parts.append(m.select("lkey", "doc_id").distinct())

    if not parts:
        return spark.createDataFrame([], "lkey string, doc_id long")
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


def _eval(node: Source, leaf_df: DataFrame, path: str) -> DataFrame:
    if isinstance(node, Match):
        return leaf_df.filter(F.col("lkey") == path).select("doc_id")
    kids = [
        _eval(s, leaf_df, f"{path}.{i}") for i, s in enumerate(node.sources)
    ]
    if isinstance(node, AnyOf):
        out = kids[0]
        for kdf in kids[1:]:
            out = out.unionByName(kdf)
        return out.distinct()
    out = kids[0]
    for kdf in kids[1:]:
        out = out.join(kdf, "doc_id", "left_semi")
    return out


def intervals_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, Source],
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """(query_id, rank, doc_id, score): top-k BM25 (disjunctive over the
    union of each query's terms) among docs matching the query's
    intervals source tree (module docstring)."""
    norm = {qid: _normalize(src) for qid, src in queries.items()}
    leaves: dict[str, Match] = {}
    for qid, src in norm.items():
        _leaves(src, qid, leaves)
    leaf_df = _leaf_matches(spark, index_root, leaves)

    score_q = {
        qid: " ".join(sorted(_terms(src)))
        for qid, src in norm.items()
        if _terms(src)
    }
    scores = score_docs(
        spark, index_root, score_q, mode=spec.MODE_DISJUNCTIVE
    )
    parts = []
    for qid, src in norm.items():
        if qid not in score_q:
            continue
        matched = _eval(src, leaf_df, qid)
        parts.append(
            scores.filter(F.col("query_id") == qid)
            .join(matched, "doc_id", "left_semi")
        )
    if not parts:
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double"
        )
    rel = parts[0]
    for p_ in parts[1:]:
        rel = rel.unionByName(p_)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        rel.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
