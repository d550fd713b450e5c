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
  overlaps allowed — Lucene's `Intervals.unordered`).  When every
  child is a single-term Match, a constrained node collapses to the
  equivalent Match leaf (cheap path).  Constrained nodes over
  ARBITRARY children (any_of, multi-term match, nested all_of) run
  the full minimal-interval algebra (r3; Lucene-parity gap accounting
  since the r3 review): each node contributes an interval RELATION
  (doc_id, s, e) of its MINIMAL match intervals — intervals
  containing another match interval are suppressed (_minimal), which
  is exactly Lucene's minimal-interval iteration and is load-bearing
  under bounded gaps (a non-minimal child interval could fake a
  smaller between-gap).  Parent ``max_gaps`` counts ONLY the
  positions BETWEEN the matching rules (ES docs: "maximum number of
  positions between the matching rules"; child-internal gaps are
  governed by the child's own max_gaps):
    - ordered:   children chained with strictly-after starts
      (s_{i+1} > e_i, Lucene Intervals.ordered non-overlap);
      accumulated gaps g = Σ (s_{i+1} - e_i - 1); DP frontier keeps
      min g per (doc, chain-start, chain-end) — future gaps depend
      only on the chain end, so the frontier is exact; match iff some
      final state has g <= max_gaps.
    - unordered: one interval per child in any arrangement (overlaps
      allowed); gaps g = envelope width - Σ child spans (negative
      under overlap — overlap can only help); DP frontier keeps MAX
      Σ-spans per (doc, envelope) — for a fixed envelope more covered
      span is always weakly better.
  For single-term children both definitions coincide with the Match-
  leaf window semantics (each child spans one position, so between-
  rules gaps == width - n).

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
    """Collapse constrained AllOf-of-single-terms into a Match leaf
    (cheap path, identical semantics); keep every other constrained
    AllOf — ordered or unordered — for the minimal-interval DP."""
    if isinstance(node, Match):
        return node
    if isinstance(node, AnyOf):
        return AnyOf(tuple(_normalize(s) for s in node.sources))
    kids = tuple(_normalize(s) for s in node.sources)
    if not node.ordered and node.max_gaps < 0:
        return AllOf(kids)
    if all(
        isinstance(s, Match) and len(spec.tokenize(s.text)) == 1
        for s in kids
    ):
        return Match(
            " ".join(spec.tokenize(s.text)[0] for s in kids),
            ordered=node.ordered, max_gaps=node.max_gaps,
        )
    return AllOf(kids, ordered=node.ordered, max_gaps=node.max_gaps)


def _is_complex(node: Source) -> bool:
    """An AllOf that needs the minimal-interval DP: any constrained
    node (ordered and/or max_gaps >= 0) _normalize kept because some
    child is wider than a single term."""
    return isinstance(node, AllOf) and (node.ordered or node.max_gaps >= 0)


def _leaves(node: Source, path: str, out: dict, complex_out: dict) -> None:
    if isinstance(node, Match):
        out[path] = node
    elif _is_complex(node):
        complex_out[path] = node
    else:
        for i, s in enumerate(node.sources):
            _leaves(s, f"{path}.{i}", out, complex_out)


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


def _required(node: Source) -> set:
    """Terms every matching doc MUST contain (any_of children can't
    require anything; all_of/match require all theirs)."""
    if isinstance(node, Match):
        return set(spec.tokenize(node.text))
    if isinstance(node, AnyOf):
        return set()
    return set().union(*(_required(s) for s in node.sources))


def _minimal(iv: DataFrame) -> DataFrame:
    """Suppress non-minimal intervals: drop every (s, e) that contains
    another interval of the same doc (Lucene's minimal-interval
    iteration).  Load-bearing under bounded parent gaps — a non-minimal
    child interval would fake a smaller between-rules gap.  One
    doc-keyed window over the df-bounded interval relation: keep the
    min end per start, then keep (s, e) iff e < min end over any
    strictly-larger start."""
    from pyspark.sql import Window

    per_start = iv.groupBy("doc_id", "s").agg(F.min("e").alias("e"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy(F.desc("s"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    suffix_min = F.min("e").over(w)
    return (
        per_start.withColumn("_sm", suffix_min)
        .filter(F.col("_sm").isNull() | (F.col("e") < F.col("_sm")))
        .drop("_sm")
    )


def _node_intervals(
    node: Source, pos: DataFrame, cdocs: DataFrame | None
) -> DataFrame:
    """(doc_id, s, e) MINIMAL match-interval relation for a source node
    (module docstring: Lucene-parity between-rules gap accounting).
    `pos` is the positions sidecar relation restricted to the needed
    terms; `cdocs` an optional (doc_id) candidate prefilter (docs
    containing every required term of the enclosing complex node).
    All relations are doc-keyed and O(sum df)-bounded; the DPs are
    chains of doc-equi-joins with per-(doc, start/envelope) frontiers —
    never a corpus-scale window or cross join."""
    if isinstance(node, Match):
        ts = spec.tokenize(node.text)
        if not ts:
            # an empty-analyzed rule can never match (same as the
            # top-level leaf path's `live` guard)
            return pos.sparkSession.createDataFrame(
                [], "doc_id long, s long, e long"
            )
        ex = pos.filter(F.col("term").isin(sorted(set(ts))))
        if cdocs is not None:
            ex = ex.join(cdocs, "doc_id", "left_semi")
        ex = ex.select(
            "doc_id", "term", F.explode("positions").alias("p")
        )
        if len(ts) == 1:
            return ex.select(
                "doc_id", F.col("p").alias("s"), F.col("p").alias("e")
            )
        if node.ordered:
            # greedy per-start min fold (minimal end per start); own
            # width bound applied; _minimal then drops dominated starts
            m = ex.filter(F.col("term") == ts[0]).select(
                "doc_id", F.col("p").alias("s"), F.col("p").alias("cur")
            )
            bound = (
                len(ts) - 1 + node.max_gaps
                if node.max_gaps >= 0 else _UNBOUNDED
            )
            for t in ts[1:]:
                nxt = ex.filter(F.col("term") == t).select("doc_id", "p")
                m = (
                    m.join(nxt, "doc_id")
                    .filter(
                        (F.col("p") > F.col("cur"))
                        & (F.col("p") <= F.col("s") + bound)
                    )
                    .groupBy("doc_id", "s")
                    .agg(F.min("p").alias("cur"))
                )
            return _minimal(
                m.select("doc_id", "s", F.col("cur").alias("e"))
            )
        # unordered: anchor-window minimal intervals — for each anchor
        # position a, e(a) = max over DISTINCT terms of the term's
        # first occurrence in [a, a + win)
        nd = len(set(ts))
        win = nd + node.max_gaps if node.max_gaps >= 0 else _UNBOUNDED
        anchors = ex.select("doc_id", F.col("p").alias("a")).distinct()
        left_min = (
            anchors.join(ex, "doc_id")
            .filter(
                (F.col("p") >= F.col("a"))
                & (F.col("p") < F.col("a") + F.lit(win))
            )
            .groupBy("doc_id", "a", "term")
            .agg(F.min("p").alias("mn"))
            .groupBy("doc_id", "a")
            .agg(F.count("*").alias("hit"), F.max("mn").alias("e"))
            .filter(F.col("hit") == nd)
            .select("doc_id", F.col("a").alias("s"), "e")
        )
        return _minimal(left_min)
    if isinstance(node, AnyOf):
        kids = [_node_intervals(s, pos, cdocs) for s in node.sources]
        out = kids[0]
        for kdf in kids[1:]:
            out = out.unionByName(kdf)
        # Lucene disjunction also suppresses intervals that contain a
        # match from another alternative
        return _minimal(out)
    if node.ordered:
        # ordered DP over minimal child intervals: chain left to right
        # with strictly-after starts; g accumulates the BETWEEN-rules
        # gaps; frontier = min g per (doc, chain-start, chain-end)
        # (future gaps depend only on the chain end)
        first = _node_intervals(node.sources[0], pos, cdocs)
        m = first.select(
            "doc_id", "s", F.col("e").alias("cur"), F.lit(0).alias("g")
        )
        for child in node.sources[1:]:
            kid = _node_intervals(child, pos, cdocs).select(
                "doc_id", F.col("s").alias("s2"), F.col("e").alias("e2")
            )
            m = (
                m.join(kid, "doc_id")
                .filter(F.col("s2") > F.col("cur"))
                .groupBy("doc_id", "s", F.col("e2").alias("cur"))
                .agg(
                    F.min(
                        F.col("g") + F.col("s2") - F.col("cur") - 1
                    ).alias("g")
                )
            )
    else:
        # unordered ENVELOPE DP over minimal child intervals: any
        # arrangement, overlaps allowed; frontier = max Σ child spans
        # per (doc, envelope) — more covered span is weakly better
        first = _node_intervals(node.sources[0], pos, cdocs)
        m = first.select(
            "doc_id", "s", F.col("e").alias("cur"),
            (F.col("e") - F.col("s") + 1).alias("sw"),
        )
        for child in node.sources[1:]:
            kid = _node_intervals(child, pos, cdocs).select(
                "doc_id", F.col("s").alias("s2"), F.col("e").alias("e2")
            )
            m = (
                m.join(kid, "doc_id")
                .groupBy(
                    "doc_id",
                    F.least("s", F.col("s2")).alias("s"),
                    F.greatest("cur", F.col("e2")).alias("cur"),
                )
                .agg(
                    F.max(
                        F.col("sw") + F.col("e2") - F.col("s2") + 1
                    ).alias("sw")
                )
            )
        m = m.withColumn(
            "g", F.col("cur") - F.col("s") + 1 - F.col("sw")
        )
    if node.max_gaps >= 0:
        m = m.filter(F.col("g") <= node.max_gaps)
    return _minimal(m.select("doc_id", "s", F.col("cur").alias("e")))


def _complex_matches(
    spark: SparkSession, index_root: str, nodes: dict[str, "AllOf"]
) -> DataFrame:
    """(lkey, doc_id) match relation for constrained-ordered AllOf
    nodes: one positions read for the union of their terms, a
    conjunctive match_docs prefilter on each node's required terms,
    then the minimal-interval DP per node."""
    need = sorted(set().union(*(_terms(n) for n in nodes.values())))
    pos = read_positions(spark, index_root, need)
    req = {
        k: " ".join(sorted(_required(n)))
        for k, n in nodes.items() if _required(n)
    }
    parts = []
    for k, n in nodes.items():
        # per-node match_docs (not one shared all-nodes relation
        # filtered per branch): the shared form's scan read the UNION
        # of every node's terms in each of the N branches — N× the
        # posting bytes; the per-node call isin-prunes each branch's
        # scan to its OWN terms, keeping total read work linear (r4)
        cdocs = (
            match_docs(
                spark, index_root, {k: req[k]},
                mode=spec.MODE_CONJUNCTIVE,
            ).select("doc_id")
            if k in req else None
        )
        iv = _node_intervals(n, pos, cdocs)
        parts.append(
            iv.select(F.lit(k).alias("lkey"), "doc_id").distinct()
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


def _eval(node: Source, leaf_df: DataFrame, path: str) -> DataFrame:
    if isinstance(node, Match) or _is_complex(node):
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
    complex_nodes: dict[str, AllOf] = {}
    for qid, src in norm.items():
        _leaves(src, qid, leaves, complex_nodes)
    leaf_df = _leaf_matches(spark, index_root, leaves)
    if complex_nodes:
        leaf_df = leaf_df.unionByName(
            _complex_matches(spark, index_root, complex_nodes)
        )

    score_q = {
        qid: " ".join(sorted(_terms(src)))
        for qid, src in norm.items()
        if _terms(src)
    }
    scores = score_docs(
        spark, index_root, score_q, mode=spec.MODE_DISJUNCTIVE
    )
    # one (query_id, doc_id) matched relation + ONE semi join: the
    # per-query `scores.filter(qid).join(...)` branch form duplicated
    # the whole scoring subtree per query (no ReusedExchange — the
    # branch filters break canonical equality; measured 18 vs 15
    # Python-boundary stages and 81 vs 69 exchanges at Q=2), i.e.
    # plan size and scan work LINEAR IN Q.  The tagged union +
    # two-key semi join keeps the scoring relation single-evaluation
    # at any batch size; at tiny Q the old form's redundant branches
    # ran concurrently and could wall-clock slightly faster on an
    # idle box (A/B at sf0.1, Q=2: 4.7 s vs 5.5 s warm) — the wrong
    # trade at every larger Q (r4).
    parts = []
    for qid, src in norm.items():
        if qid not in score_q:
            continue
        parts.append(
            _eval(src, leaf_df, qid).select(
                F.lit(qid).alias("query_id"), "doc_id"
            )
        )
    if not parts:
        return spark.createDataFrame(
            [], "query_id string, rank int, doc_id long, score double"
        )
    matched = parts[0]
    for p_ in parts[1:]:
        matched = matched.unionByName(p_)
    rel = scores.join(matched, ["query_id", "doc_id"], "left_semi")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        rel.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
