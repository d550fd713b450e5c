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


def span_near_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    slop: int = 0,
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """ORDERED proximity — Lucene SpanNearQuery(in_order=true, slop):
    a doc matches iff its tokens contain occurrences p_1 < p_2 < ... <
    p_n of the query's terms IN QUERY ORDER with total span width
    p_n - p_1 <= slop + n - 1 (slop = extra positions allowed between
    the ordered terms; slop=0 is exactly the quoted phrase).  Matched
    docs are ranked by conjunctive BM25, top-k per query — near_topk's
    contract with order enforced.

    Verify plan (relational; positions sidecar required): per query
    length n the ordered-match decision folds n-1 GREEDY join+min
    rounds — from each occurrence `start` of the first term, chain the
    SMALLEST next-term position > the current end (min-aggregated per
    start, so each round's rows stay one-per-start).  Greedy minimality
    makes the fold exact: a feasible ordered assignment within the span
    bound exists iff the greedy chain stays within it.  Every round
    shuffles only (query, doc, start, cur) int rows for conjunctively
    pre-filtered candidates — the same O(sum df) economics as
    near_topk, times the (tiny, fixed) query length.
    """
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    empty = spark.createDataFrame(
        [], "query_id string, rank int, doc_id long, score double"
    )
    qseq = {qid: spec.tokenize(t) for qid, t in queries.items()}
    live = {qid: ts for qid, ts in qseq.items() if ts}
    if not live:
        return empty

    reg = Catalog(index_root).read_registry()
    n_docs = int(reg["n_docs"])
    candidates = bm25.topk(
        spark,
        index_root,
        {qid: " ".join(sorted(set(ts))) for qid, ts in live.items()},
        mode=spec.MODE_CONJUNCTIVE,
        k=max(n_docs, 1),
    ).drop("rank")

    seq_rows = [
        (qid, i, t, len(ts))
        for qid, ts in live.items()
        for i, t in enumerate(ts)
    ]
    qt = spark.createDataFrame(
        seq_rows, "query_id string, idx int, term string, n_terms int"
    )
    terms = sorted({t for ts in live.values() for t in ts})
    pos = read_positions(spark, index_root, terms)
    ex = (
        pos.join(F.broadcast(qt), "term")
        .join(candidates.select("query_id", "doc_id"), ["query_id", "doc_id"])
        .select(
            "query_id", "doc_id", "idx", "n_terms",
            F.explode("positions").alias("p"),
        )
    )
    parts = []
    for n in sorted({len(ts) for ts in live.values()}):
        exn = ex.filter(F.col("n_terms") == n)
        m = exn.filter(F.col("idx") == 0).select(
            "query_id", "doc_id",
            F.col("p").alias("start"), F.col("p").alias("cur"),
        )
        bound = slop + n - 1
        for i in range(1, n):
            nxt = exn.filter(F.col("idx") == i).select(
                "query_id", "doc_id", "p"
            )
            m = (
                m.join(nxt, ["query_id", "doc_id"])
                .filter(
                    (F.col("p") > F.col("cur"))
                    & (F.col("p") <= F.col("start") + F.lit(bound))
                )
                .groupBy("query_id", "doc_id", "start")
                .agg(F.min("p").alias("cur"))
            )
        parts.append(m.select("query_id", "doc_id").distinct())
    matched = parts[0]
    for p_ in parts[1:]:
        matched = matched.unionByName(p_)
    verified = candidates.join(matched, ["query_id", "doc_id"])

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        verified.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def span_not_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, tuple[str, str]],
    pre: int = 0,
    post: int = 0,
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """Lucene/ES SpanNotQuery: ``queries`` maps qid -> (include_term,
    exclude_term); a doc matches iff SOME occurrence p of the include
    term has NO exclude-term occurrence within [p - pre, p + post]
    (ES span_not's pre/post margins; pre=post=0 is same-position
    overlap only).  Surviving docs rank by the include term's BM25,
    top-k, score DESC / doc_id ASC — the span family's contract.

    Verify plan: include occurrences for candidate docs (the include
    term's match set) LEFT ANTI join exclude occurrences on (query,
    doc) + the position window — one shuffle of int occurrence rows,
    O(df_include + df_exclude) per query, never corpus-scale.  An
    exclude term absent from a doc excludes nothing (anti join keeps
    all its include occurrences), matching ES."""
    if pre < 0 or post < 0:
        raise ValueError(f"pre/post must be >= 0, got {pre}/{post}")
    empty = spark.createDataFrame(
        [], "query_id string, rank int, doc_id long, score double"
    )
    live = {
        qid: (spec.tokenize(inc), spec.tokenize(exc))
        for qid, (inc, exc) in queries.items()
    }
    live = {
        qid: (inc[0], exc[0])
        for qid, (inc, exc) in live.items()
        if len(inc) == 1 and len(exc) == 1
    }
    if not live:
        return empty

    reg = Catalog(index_root).read_registry()
    n_docs = int(reg["n_docs"])
    candidates = bm25.topk(
        spark,
        index_root,
        {qid: inc for qid, (inc, _) in live.items()},
        mode=spec.MODE_CONJUNCTIVE,
        k=max(n_docs, 1),
    ).drop("rank")

    qinc = spark.createDataFrame(
        [(qid, inc) for qid, (inc, _) in live.items()],
        "query_id string, term string",
    )
    qexc = spark.createDataFrame(
        [(qid, exc) for qid, (_, exc) in live.items()],
        "query_id string, term string",
    )
    terms = sorted(
        {t for pair in live.values() for t in pair}
    )
    pos = read_positions(spark, index_root, terms)
    inc_occ = (
        pos.join(F.broadcast(qinc), "term")
        .join(candidates.select("query_id", "doc_id"), ["query_id", "doc_id"])
        .select("query_id", "doc_id", F.explode("positions").alias("p"))
    )
    exc_occ = (
        pos.join(F.broadcast(qexc), "term")
        .select(
            "query_id", "doc_id", F.explode("positions").alias("e_p")
        )
    )
    surviving = inc_occ.join(
        exc_occ,
        (inc_occ["query_id"] == exc_occ["query_id"])
        & (inc_occ["doc_id"] == exc_occ["doc_id"])
        & (exc_occ["e_p"] >= inc_occ["p"] - F.lit(pre))
        & (exc_occ["e_p"] <= inc_occ["p"] + F.lit(post)),
        "left_anti",
    )
    matched = surviving.select("query_id", "doc_id").distinct()
    verified = candidates.join(matched, ["query_id", "doc_id"])

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        verified.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def span_first_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    end: int = 10,
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """Lucene/ES SpanFirstQuery: a doc matches iff the (single-term)
    query has an occurrence whose span ends at or before token position
    `end` — with 0-based positions and single-term spans, some
    occurrence p with p + 1 <= end.  "Term in the title/lead" without a
    separate title field.  Matching docs rank by the term's plain BM25
    (score DESC, doc_id ASC), top-k.

    Scale shape: candidates + exact scores from the index match set,
    then ONE sidecar verify that never explodes positions — the
    boundary test is min(positions) < end, a codegen array_min over the
    term's own (query-pruned, row-group-pruned) sidecar rows.  O(df)
    narrow rows per query end to end."""
    if end <= 0:
        raise ValueError(f"end must be > 0, got {end}")
    empty = spark.createDataFrame(
        [], "query_id string, rank int, doc_id long, score double"
    )
    live = {
        qid: toks[0]
        for qid, toks in (
            (qid, spec.tokenize(text)) for qid, text in queries.items()
        )
        if len(toks) == 1
    }
    if not live:
        return empty

    reg = Catalog(index_root).read_registry()
    n_docs = int(reg["n_docs"])
    candidates = bm25.topk(
        spark,
        index_root,
        live,
        mode=spec.MODE_CONJUNCTIVE,
        k=max(n_docs, 1),
    ).drop("rank")

    qt = spark.createDataFrame(
        list(live.items()), "query_id string, term string"
    )
    pos = read_positions(spark, index_root, sorted(set(live.values())))
    matched = (
        pos.filter(F.array_min("positions") < F.lit(end))
        .join(F.broadcast(qt), "term")
        .select("query_id", "doc_id")
    )
    verified = candidates.join(matched, ["query_id", "doc_id"])

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        verified.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def _span_pair_containing(
    spark: SparkSession,
    index_root: str,
    live: dict[str, tuple[str, str, str]],
    slop: int,
    candidates: DataFrame,
) -> DataFrame:
    """(query_id, doc_id) docs where some ORDERED (t1, t2) big span of
    width <= slop+1 (span_near_topk's 2-clause bound) encloses a t3
    (little) occurrence: exists p1 < p3' <= p2 with p2 - p1 <= slop + 1
    and p1 <= p3 <= p2.  Shared verify core of span_containing_topk /
    span_within_topk — the doc-level match set is the same for both (a
    big-enclosing-little witness IS a little-within-big witness)."""
    rows = [
        (qid, role, t)
        for qid, trip in live.items()
        for role, t in zip(("a", "b", "c"), trip)
    ]
    qt = spark.createDataFrame(rows, "query_id string, role string, term string")
    terms = sorted({t for trip in live.values() for t in trip})
    pos = read_positions(spark, index_root, terms)
    occ = (
        pos.join(F.broadcast(qt), "term")
        .join(candidates.select("query_id", "doc_id"), ["query_id", "doc_id"])
        .select("query_id", "doc_id", "role", F.explode("positions").alias("p"))
    )
    a = occ.filter(F.col("role") == "a").select(
        "query_id", "doc_id", F.col("p").alias("p1")
    )
    b = occ.filter(F.col("role") == "b").select(
        "query_id", "doc_id", F.col("p").alias("p2")
    )
    c = occ.filter(F.col("role") == "c").select(
        "query_id", "doc_id", F.col("p").alias("p3")
    )
    pairs = a.join(b, ["query_id", "doc_id"]).filter(
        (F.col("p2") > F.col("p1"))
        & (F.col("p2") <= F.col("p1") + F.lit(int(slop) + 1))
    )
    return (
        pairs.join(c, ["query_id", "doc_id"])
        .filter((F.col("p3") >= F.col("p1")) & (F.col("p3") <= F.col("p2")))
        .select("query_id", "doc_id")
        .distinct()
    )


def _span_big_little(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, tuple[str, str, str]],
    slop: int,
    k: int,
    score_terms,
) -> DataFrame:
    """Shared driver for span_containing_topk / span_within_topk:
    verify big-encloses-little, then rank by BM25 over
    ``score_terms(trip)`` (Lucene scores span_containing by `big` and
    span_within by `little`; the match sets are identical).

    Verify plan: all three occurrence relations are candidate-pruned
    (conjunctive over t1 ∧ t2 ∧ t3) BEFORE the position joins, so the
    pair join's blowup is occurrences² of docs already known to hold
    all three terms — the near_topk economics; only (query, doc, p)
    int rows shuffle, O(sum df) per query."""
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    empty = spark.createDataFrame(
        [], "query_id string, rank int, doc_id long, score double"
    )
    live = {}
    for qid, trip in queries.items():
        toks = [spec.tokenize(t) for t in trip]
        if all(len(ts) == 1 for ts in toks):
            live[qid] = tuple(ts[0] for ts in toks)
    if not live:
        return empty

    reg = Catalog(index_root).read_registry()
    n_docs = int(reg["n_docs"])
    candidates = bm25.topk(
        spark,
        index_root,
        {qid: " ".join(sorted(set(trip))) for qid, trip in live.items()},
        mode=spec.MODE_CONJUNCTIVE,
        k=max(n_docs, 1),
    ).drop("rank")
    matched = _span_pair_containing(spark, index_root, live, slop, candidates)

    scores = bm25.topk(
        spark,
        index_root,
        {
            qid: " ".join(sorted(set(score_terms(trip))))
            for qid, trip in live.items()
        },
        mode=spec.MODE_CONJUNCTIVE,
        k=max(n_docs, 1),
    ).drop("rank")
    verified = scores.join(matched, ["query_id", "doc_id"])

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        verified.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def span_containing_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, tuple[str, str, str]],
    slop: int = 4,
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """Lucene/ES SpanContainingQuery: ``queries`` maps qid ->
    (big_first, big_second, little); a doc matches iff some ORDERED
    big span (big_first .. big_second, width <= slop+1) encloses an
    occurrence of `little`.  Ranked by the BIG pair's conjunctive BM25
    (Lucene scores span_containing from the big clause), score DESC /
    doc_id ASC, top-k."""
    return _span_big_little(
        spark, index_root, queries, slop, k, lambda trip: trip[:2]
    )


def span_within_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, tuple[str, str, str]],
    slop: int = 4,
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """Lucene/ES SpanWithinQuery: same (big_first, big_second, little)
    triples and the same doc-level match set as span_containing_topk —
    but ranked by the LITTLE clause's BM25 (Lucene scores span_within
    from the little clause)."""
    return _span_big_little(
        spark, index_root, queries, slop, k, lambda trip: trip[2:]
    )


def span_or_near_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, list[list[str]]],
    slop: int = 0,
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """Ordered proximity with OR-clauses — Lucene SpanNearQuery whose
    clauses are SpanOrQuery over term alternatives: each query is a
    SEQUENCE of clauses, each clause a non-empty list of alternative
    terms; a doc matches iff positions p_1 < ... < p_n exist, p_i
    drawn from clause i's alternatives' occurrences, with span width
    p_n - p_1 <= slop + n - 1.

    The greedy chain of span_near_topk carries over unchanged: a
    clause's occurrence list is the UNION of its alternatives'
    position lists (disjoint by construction — one term per position),
    and greedy minimality is clause-agnostic, so feasibility is still
    exact.  Ranking contract: matched docs ordered by disjunctive BM25
    over the union of all the query's alternative terms (score DESC,
    doc_id ASC) — the deterministic stand-in for Lucene's sloppy-freq
    span scoring, same choice span_near_topk makes for plain terms.

    Scale shape: identical to span_near_topk — positions are read
    term-pruned from the sidecar, the chain shuffles only (query, doc,
    start, cur) int rows for candidate docs, one round per clause.
    """
    from .stats import score_docs

    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    empty = spark.createDataFrame(
        [], "query_id string, rank int, doc_id long, score double"
    )
    live = {
        qid: [sorted(set(c)) for c in clauses]
        for qid, clauses in queries.items()
        if clauses and all(c for c in clauses)
    }
    if not live:
        return empty

    union_q = {
        qid: " ".join(sorted({t for c in cl for t in c}))
        for qid, cl in live.items()
    }
    scores = score_docs(spark, index_root, union_q, spec.MODE_DISJUNCTIVE)

    seq_rows = [
        (qid, i, t, len(cl))
        for qid, cl in live.items()
        for i, c in enumerate(cl)
        for t in c
    ]
    qt = spark.createDataFrame(
        seq_rows, "query_id string, idx int, term string, n_clauses int"
    )
    terms = sorted({r[2] for r in seq_rows})
    pos = read_positions(spark, index_root, terms)
    ex = (
        pos.join(F.broadcast(qt), "term")
        .join(scores.select("query_id", "doc_id"), ["query_id", "doc_id"])
        .select(
            "query_id", "doc_id", "idx", "n_clauses",
            F.explode("positions").alias("p"),
        )
    )
    parts = []
    for n in sorted({len(cl) for cl in live.values()}):
        bound = slop + n - 1
        exn = ex.filter(F.col("n_clauses") == n)
        m = exn.filter(F.col("idx") == 0).select(
            "query_id", "doc_id",
            F.col("p").alias("start"), F.col("p").alias("cur"),
        )
        for i in range(1, n):
            nxt = exn.filter(F.col("idx") == i).select(
                "query_id", "doc_id", "p"
            )
            m = (
                m.join(nxt, ["query_id", "doc_id"])
                .filter(
                    (F.col("p") > F.col("cur"))
                    & (F.col("p") <= F.col("start") + F.lit(bound))
                )
                .groupBy("query_id", "doc_id", "start")
                .agg(F.min("p").alias("cur"))
            )
        parts.append(m.select("query_id", "doc_id").distinct())
    matched = parts[0]
    for p_ in parts[1:]:
        matched = matched.unionByName(p_)
    verified = scores.join(matched, ["query_id", "doc_id"])

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        verified.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def span_multi_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, list[str]],
    slop: int = 0,
    max_expand: int | None = None,
    k: int = spec.TOP_K_DEFAULT,
) -> DataFrame:
    """Lucene `SpanMultiTermQueryWrapper` inside `SpanNearQuery` (ES
    `span_multi` clause in `span_near`): each clause is either a literal
    term or a ``pre*`` prefix pattern; prefix clauses expand against the
    term-sorted lexicon (plans/bm25.expand_prefix — a driver-side range
    read of a few row groups, df-desc capped by ``max_expand``) into a
    SpanOr alternative list, then the whole query delegates to
    span_or_near_topk's greedy positional chain.  A prefix with zero
    lexicon matches kills its query (a span clause that can never match),
    same as Lucene.

    Scale shape: expansion is lexicon-metadata work on the driver; the
    positional verify inherits span_or_near_topk's term-pruned sidecar
    reads and (query, doc, start, cur) int-row chain."""
    from ..sources.catalog import Catalog
    from .bm25 import expand_prefix

    cat = Catalog(index_root)
    reg = cat.read_registry()
    expanded: dict[str, list[list[str]]] = {}
    for qid, clauses in queries.items():
        cl = []
        for c in clauses:
            if c.endswith("*"):
                cl.append(expand_prefix(cat, reg, c[:-1], max_expand))
            else:
                cl.append([c])
        expanded[qid] = cl
    return span_or_near_topk(spark, index_root, expanded, slop=slop, k=k)
