"""Unified search-syntax queries: plain terms, quoted phrases, minus-terms.

The reference exposes a single free-text search box (ref README.md:9-13,
src/router.py:91-127); real search boxes carry operators.  This plan
parses the classic syntax and composes the engine's existing primitives —
nothing here rescans or rescores:

    scan "join column" -filter -"table hash"

  * plain terms        -> BM25 contribution (mode-controlled matching)
  * "quoted phrase"    -> doc must contain the phrase (positional verify)
  * -term              -> doc must not contain the term (scorer mask,
                          applied BEFORE top-k: plans/bm25.topk(exclude=))
  * -"quoted phrase"   -> doc must not contain the phrase

Scoring: BM25 over ALL positive tokens (plain + required-phrase tokens) —
a doc matching the phrase scores its words too, exactly what a user
expects.  Matching: required phrases are conjunctive by construction;
plain terms follow `mode` (default disjunctive).  Phrase constraints are
decided from the positional sidecar only (operators/positions.py).

100 TB shape: one candidate retrieval (the existing scan-side TAAT path),
then per-phrase-slot positional verifies over candidate (query, doc)
pairs — O(sum df) sidecar reads, never text, never posting payloads in an
exchange; exclusion terms never leave their scan unit at all.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from ..sources.catalog import Catalog
from . import bm25
from .phrase import _verify_phrases_positional

_NEG_QUOTED = re.compile(r'-"([^"]*)"')
_QUOTED = re.compile(r'"([^"]*)"')


@dataclass
class ParsedQuery:
    terms: list[str] = field(default_factory=list)     # plain tokens
    phrases: list[str] = field(default_factory=list)   # required, verbatim
    neg_phrases: list[str] = field(default_factory=list)
    neg_terms: list[str] = field(default_factory=list)

    @property
    def positive_tokens(self) -> list[str]:
        toks = list(self.terms)
        for p in self.phrases:
            toks.extend(spec.tokenize(p))
        return sorted(set(toks))


def parse_query(text: str) -> ParsedQuery:
    """Parse the search syntax (module docstring).  Quoting wins over
    minus-splitting; a quoted group with no tokens is dropped; a bare '-'
    is ignored."""
    q = ParsedQuery()

    def _neg(m: re.Match) -> str:
        if spec.tokenize(m.group(1)):
            q.neg_phrases.append(m.group(1))
        return " "

    def _pos(m: re.Match) -> str:
        if spec.tokenize(m.group(1)):
            q.phrases.append(m.group(1))
        return " "

    rest = _QUOTED.sub(_pos, _NEG_QUOTED.sub(_neg, text))
    for w in rest.split():
        if w.startswith("-"):
            q.neg_terms.extend(spec.tokenize(w[1:]))
        else:
            q.terms.extend(spec.tokenize(w))
    return q


def search_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    mode: str = spec.MODE_DISJUNCTIVE,
    k: int = spec.TOP_K_DEFAULT,
    with_url: bool = False,
) -> DataFrame:
    """Top-k for search-syntax queries (module docstring).

    mode applies to the PLAIN terms ("should" vs "must"); phrase tokens
    are implicitly required via the phrase constraint itself.  A query
    with no positive tokens (pure negation) returns no rows.
    """
    parsed = {qid: parse_query(text) for qid, text in queries.items()}
    live = {qid: p for qid, p in parsed.items() if p.positive_tokens}
    empty = spark.createDataFrame(
        [], "query_id string, rank int, doc_id long, score double"
        + (", url string" if with_url else ""),
    )
    if not live:
        return empty

    any_phrase = any(p.phrases or p.neg_phrases for p in live.values())
    n_docs = int(Catalog(index_root).read_registry()["n_docs"])
    # conjunctive plain mode: every positive token is required, so the
    # canonical conjunctive retrieval applies as-is; disjunctive mode with
    # phrases still needs phrase tokens present -> retrieval stays
    # disjunctive (scoring wants every positive token's contribution) and
    # the phrase verify enforces containment, which implies presence
    base = bm25.topk(
        spark,
        index_root,
        {qid: " ".join(p.positive_tokens) for qid, p in live.items()},
        mode=mode,
        k=max(n_docs, 1) if any_phrase else k,
        with_url=True,
        exclude={
            qid: " ".join(p.neg_terms)
            for qid, p in live.items()
            if p.neg_terms
        } or None,
    ).drop("rank")

    cand = base
    max_req = max((len(p.phrases) for p in live.values()), default=0)
    for i in range(max_req):
        slot = {qid: p.phrases[i] for qid, p in live.items()
                if len(p.phrases) > i}
        others = cand.filter(~F.col("query_id").isin(list(slot)))
        mine = cand.filter(F.col("query_id").isin(list(slot)))
        kept = _verify_phrases_positional(spark, index_root, mine, slot)
        cand = kept.unionByName(others)
    max_neg = max((len(p.neg_phrases) for p in live.values()), default=0)
    for i in range(max_neg):
        slot = {qid: p.neg_phrases[i] for qid, p in live.items()
                if len(p.neg_phrases) > i}
        mine = cand.filter(F.col("query_id").isin(list(slot)))
        bad = _verify_phrases_positional(
            spark, index_root, mine, slot
        ).select("query_id", "doc_id")
        cand = cand.join(bad, ["query_id", "doc_id"], "left_anti")

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    cols = ["query_id", "rank", "doc_id", "score"] + (["url"] if with_url else [])
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*cols)
    )
