"""Phrase queries: BM25 top-k over documents containing an exact token phrase.

The reference engine matches bag-of-words only (its Yahoo result rows are
ranked by the upstream engine; ref src/services/yahoo_search_service.py), but
any fulltext user of a search engine expects quoted-phrase semantics, so the
engine exposes them as a first-class plan.  Semantics:

    phrase "t1 t2 ... tm"  matches doc D  iff  tokenize(D.text) contains the
    CONTIGUOUS subsequence [t1..tm] (spec.tokenize on both sides);
    matching docs are ranked by the ordinary conjunctive BM25 score of the
    phrase's distinct terms (score DESC, doc_id ASC — the engine-wide
    tie-break contract).

Plan (two phases, both relational):

  1. CANDIDATES — the existing scan-side conjunctive plan (plans.bm25.topk)
     with k = corpus size, i.e. ALL docs containing every phrase term, with
     their exact BM25 scores.  Candidate retrieval therefore inherits the
     document-partitioned, payload-shuffle-free index path unchanged.
  2. VERIFY — token-sequence containment, evaluated JVM-side with zero
     Python: because tokens are maximal [a-z0-9]+ runs, the token sequence
     of a doc contains [t1..tm] contiguously  iff  the single-space-joined
     token string ' t1 t2 ... ' appears in ' ' || join(tokens, ' ') || ' '.
     The (needle, candidate) set — k' rows per query, metadata-scale — is
     BROADCAST onto ONE scan of the (url, text) table; `contains()` runs
     inside whole-stage codegen.  Re-rank is a window over the surviving
     ≤ candidates rows.

100 TB note: for selective phrases (the realistic case) the candidate set is
small and phase 2 touches one pruned scan.  A phrase made ONLY of stop-words
degenerates (candidates ~ corpus); the escape hatch is the POSITIONAL verify
(verify="positions"): when the index carries the positional sidecar
(operators/positions.py), containment is decided from the phrase terms'
position lists alone — O(sum df(term)) bytes read, term-isin row-group
pruned, independent of corpus text size — with zero Python:

      occurrence i of the phrase contributes (occ=i, term=t_i); a doc
      matches iff some start p has p+i in positions(t_i) for EVERY i, i.e.
      iff after shifting each occurrence's positions by -i, some value is
      hit by ALL occurrences: explode shifted positions -> group by
      (query, doc, start) -> count(distinct occ) == phrase length.

Both verifies implement the same contract and are asserted identical
(tests/test_positions.py); verify="auto" picks positions when the sidecar
exists and is fresh, else the text scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from ..sources.catalog import Catalog
from .bm25 import expand_prefix, topk

# tokens of a text column, as a JVM expression (same regex as spec.tokenize)
_TOKENS_EXPR = r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)"


def phrase_needle(phrase: str) -> str | None:
    """' t1 t2 ... tm ' for the phrase's full token sequence (order and
    multiplicity preserved), or None for a token-free phrase."""
    toks = spec.tokenize(phrase)
    if not toks:
        return None
    return " " + " ".join(toks) + " "


def _verify_phrases(
    candidates: DataFrame, docs_text: DataFrame, needles: DataFrame
) -> DataFrame:
    """Keep candidate (query_id, doc_id) pairs whose doc token sequence
    contains the query's phrase.  candidates carry url; docs_text is
    (url, text); needles is (query_id, needle).  One scan of docs_text,
    candidates broadcast, containment in codegen."""
    cand = candidates.join(F.broadcast(needles), "query_id")
    seq = F.concat(
        F.lit(" "), F.array_join(F.expr(_TOKENS_EXPR), " "), F.lit(" ")
    ).alias("seq")
    return (
        docs_text.select("url", seq)
        .join(F.broadcast(cand), "url")
        .filter(F.contains(F.col("seq"), F.col("needle")))
        .drop("seq", "needle")
    )


def _verify_phrases_positional(
    spark: SparkSession,
    index_root: str,
    candidates: DataFrame,
    phrases: dict[str, str],
) -> DataFrame:
    """Keep candidate (query_id, doc_id) pairs whose doc contains the
    query's phrase, decided from the positional sidecar alone (module
    docstring).  All JVM: term-pruned positions scan, the metadata-scale
    occurrence table broadcast onto it, one explode + one aggregate.  The
    candidate join is deliberately UNHINTED: for selective phrases AQE
    broadcasts the k'-scale set; for a stop-word phrase (candidates ~
    corpus — the case this sidecar exists for) it must stay a shuffle
    join, and forcing a broadcast would OOM precisely then."""
    from ..operators.positions import read_positions

    occ_rows = []
    n_occ: dict[str, int] = {}
    for qid, phrase in phrases.items():
        toks = spec.tokenize(phrase)
        n_occ[qid] = len(toks)
        occ_rows.extend((qid, i, t) for i, t in enumerate(toks))
    occ = spark.createDataFrame(
        [(q, i, t, n_occ[q]) for q, i, t in occ_rows],
        "query_id string, occ int, term string, n_occ int",
    )
    terms = sorted({t for _, _, t in occ_rows})
    pos = read_positions(spark, index_root, terms)
    matched = (
        pos.join(F.broadcast(occ), "term")
        .join(candidates.select("query_id", "doc_id"),
              ["query_id", "doc_id"])
        .select(
            "query_id", "doc_id", "occ", "n_occ",
            F.explode("positions").alias("p"),
        )
        .withColumn("start", F.col("p") - F.col("occ"))
        .groupBy("query_id", "doc_id", "start", "n_occ")
        .agg(F.count_distinct("occ").alias("hit"))
        .filter(F.col("hit") == F.col("n_occ"))
        .select("query_id", "doc_id")
        .distinct()
    )
    return candidates.join(matched, ["query_id", "doc_id"])


def phrase_topk(
    spark: SparkSession,
    index_root: str,
    phrases: dict[str, str],
    docs_text: DataFrame | None = None,
    k: int = spec.TOP_K_DEFAULT,
    with_url: bool = False,
    verify: str = "auto",
) -> DataFrame:
    """Top-k BM25 over docs containing each phrase as a contiguous token run.

    docs_text: (url, text) — the SAME text the index tokenized: raw tables
    pass themselves, HTML corpora pass functions.extract.page_text_df(pages)
    (the byte-identical extractor output).  Only consulted by the text
    verify; pass None when the index carries a positional sidecar.

    verify: "positions" (sidecar required; never touches text), "text"
    (docs_text required), or "auto" — positions when the sidecar exists and
    covers the current corpus, else text.
    """
    if verify == "auto":
        reg = Catalog(index_root).read_registry()
        verify = (
            "positions"
            if reg.get("positions_dir")
            and int(reg.get("positions_n_docs", -1)) == int(reg["n_docs"])
            else "text"
        )
    if verify == "text" and docs_text is None:
        raise ValueError(
            "phrase verify needs docs_text (no fresh positional sidecar on "
            "this index; build one with build_positions)"
        )
    empty = spark.createDataFrame(
        [], "query_id string, rank int, doc_id long, score double"
        + (", url string" if with_url else ""),
    )
    needle_rows = []
    for qid, phrase in phrases.items():
        needle = phrase_needle(phrase)
        if needle is not None:
            needle_rows.append((qid, needle))
    if not needle_rows:
        return empty

    cat = Catalog(index_root)
    n_docs = int(cat.read_registry()["n_docs"])
    # ALL conjunctive matches (k = corpus size), exact scores, url attached
    # for the verify join
    candidates = topk(
        spark,
        index_root,
        {qid: phrases[qid] for qid, _ in needle_rows},
        mode=spec.MODE_CONJUNCTIVE,
        k=max(n_docs, 1),
        with_url=True,
    ).drop("rank")
    live = {qid: phrases[qid] for qid, _ in needle_rows}
    if verify == "positions":
        verified = _verify_phrases_positional(spark, index_root, candidates, live)
    else:
        needles = spark.createDataFrame(
            needle_rows, "query_id string, needle string"
        )
        verified = _verify_phrases(candidates, docs_text, needles)

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    cols = ["query_id", "rank", "doc_id", "score"] + (["url"] if with_url else [])
    return (
        verified.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*cols)
    )


# ASCII unit separator: joins (query_id, expansion) into a sub-query key
# that cannot collide with user query ids or [a-z0-9]+ terms.
_MPP_SEP = "\x1f"


def match_phrase_prefix_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    max_expansions: int = 50,
    k: int = spec.TOP_K_DEFAULT,
    docs_text: DataFrame | None = None,
    verify: str = "auto",
) -> DataFrame:
    """Elasticsearch `match_phrase_prefix` — search-as-you-type: the
    query's last token is a PREFIX; each lexicon term completing it (the
    ``max_expansions`` highest-df, ES's cap) forms a candidate phrase,
    a doc matches if it contains ANY of them contiguously, and scores as
    the BEST matching expansion's phrase score (conjunctive BM25 over
    that phrase's distinct terms) — (query_id, rank, doc_id, score).

    Composition, not new machinery: prefix expansion is the lexicon
    range read of the `pre*` search operator (bm25.expand_prefix), each
    expanded phrase rides the ordinary phrase plan IN ONE BATCH, and the
    per-doc max over expansions is a result-scale groupBy.  Exactness of
    top-k from per-expansion top-k: if a doc is in the final top-k via
    expansion e, fewer than k docs outrank it within e (their final
    scores are >= their e-scores), so it is in e's top-k — the union of
    per-expansion top-k lists covers the final list.

    Queries whose prefix expands to nothing return no rows (ES: zero
    hits, not an error)."""
    empty = spark.createDataFrame(
        [], "query_id string, rank int, doc_id long, score double"
    )
    cat = Catalog(index_root)
    reg = cat.read_registry()
    expanded: dict[str, str] = {}
    for qid, text in queries.items():
        toks = spec.tokenize(text)
        if not toks:
            continue
        for e in expand_prefix(cat, reg, toks[-1], max_expansions):
            expanded[f"{qid}{_MPP_SEP}{e}"] = " ".join(toks[:-1] + [e])
    if not expanded:
        return empty
    sub = phrase_topk(
        spark, index_root, expanded, docs_text=docs_text, k=k, verify=verify
    )
    best = (
        sub.withColumn(
            "query_id", F.substring_index("query_id", _MPP_SEP, 1)
        )
        .groupBy("query_id", "doc_id")
        .agg(F.max("score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        best.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
