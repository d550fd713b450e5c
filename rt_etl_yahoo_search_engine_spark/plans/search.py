"""Unified search-syntax queries: plain terms, quoted phrases, minus-terms.

The reference exposes a single free-text search box (ref README.md:9-13,
src/router.py:91-127); real search boxes carry operators.  This plan
parses the classic syntax and composes the engine's existing primitives —
nothing here rescans or rescores:

    scan "join column" -filter -"table hash" quer*

  * plain terms        -> BM25 contribution (mode-controlled matching)
  * "quoted phrase"    -> doc must contain the phrase (positional verify)
  * -term              -> doc must not contain the term (scorer mask,
                          applied BEFORE top-k: plans/bm25.topk(exclude=))
  * -"quoted phrase"   -> doc must not contain the phrase
  * wor*               -> prefix: expands to the matching corpus terms
                          (lexicon range read), each scoring disjunctively
  * -wor*              -> the whole matching family is excluded
  * word~ / word~2     -> fuzzy: expands to corpus terms within 1 (or N)
                          edits (bm25.expand_fuzzy), scoring disjunctively
  * -word~             -> the fuzzy family is excluded

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
_FUZZY_TAIL = re.compile(r"~(\d?)$")


@dataclass
class ParsedQuery:
    terms: list[str] = field(default_factory=list)     # plain tokens
    phrases: list[str] = field(default_factory=list)   # required, verbatim
    neg_phrases: list[str] = field(default_factory=list)
    neg_terms: list[str] = field(default_factory=list)
    prefixes: list[str] = field(default_factory=list)      # trailing-* stems
    neg_prefixes: list[str] = field(default_factory=list)  # -stem*
    fuzzies: list[tuple[str, int]] = field(default_factory=list)      # stem~N
    neg_fuzzies: list[tuple[str, int]] = field(default_factory=list)  # -stem~N

    @property
    def positive_tokens(self) -> list[str]:
        toks = list(self.terms)
        for p in self.phrases:
            toks.extend(spec.tokenize(p))
        return sorted(set(toks))


def parse_query(text: str) -> ParsedQuery:
    """Parse the search syntax (module docstring).  Quoting wins over
    minus-splitting; a quoted group with no tokens is dropped; a bare '-'
    is ignored.  A word ending in `*` is a PREFIX term (`wor*` matches
    every corpus term starting with "wor"); `-wor*` excludes the whole
    family.  A multi-token star word keeps its leading tokens plain and
    the last becomes the prefix."""
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
        neg = w.startswith("-")
        body = w[1:] if neg else w
        star = body.endswith("*")
        fz = None if star else _FUZZY_TAIL.search(body)
        stem = body[:-1] if star else (body[: fz.start()] if fz else body)
        toks = spec.tokenize(stem)
        if not toks:
            continue
        terms, prefixes, fuzzies = (
            (q.neg_terms, q.neg_prefixes, q.neg_fuzzies)
            if neg
            else (q.terms, q.prefixes, q.fuzzies)
        )
        if star:
            prefixes.append(toks[-1])
            terms.extend(toks[:-1])
        elif fz:
            fuzzies.append((toks[-1], int(fz.group(1) or 1)))
            terms.extend(toks[:-1])
        else:
            terms.extend(toks)
    return q


def search_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    mode: str = spec.MODE_DISJUNCTIVE,
    k: int = spec.TOP_K_DEFAULT,
    with_url: bool = False,
    max_expand: int | None = None,
) -> DataFrame:
    """Top-k for search-syntax queries (module docstring).

    mode applies to the PLAIN terms ("should" vs "must"); phrase tokens
    are implicitly required via the phrase constraint itself.  A query
    with no positive tokens (pure negation) returns no rows.

    Prefix terms (`wor*`) expand to the matching corpus terms
    (bm25.expand_prefix: a driver-side lexicon range read) and fuzzy terms
    (`word~`, `word~2`) to corpus terms within the edit budget
    (bm25.expand_fuzzy); both capped at max_expand highest-df terms when
    set, both scoring as ordinary disjunctive contributions; the negated
    forms exclude the whole family.  Positive prefix/fuzzy terms are
    inherently "match ANY expansion", so they are rejected under
    conjunctive mode rather than silently requiring every expansion.
    """
    parsed = {qid: parse_query(text) for qid, text in queries.items()}
    live = {
        qid: p
        for qid, p in parsed.items()
        if p.positive_tokens or p.prefixes or p.fuzzies
    }
    empty = spark.createDataFrame(
        [], "query_id string, rank int, doc_id long, score double"
        + (", url string" if with_url else ""),
    )
    if not live:
        return empty
    if mode == spec.MODE_CONJUNCTIVE and any(
        p.prefixes or p.fuzzies for p in live.values()
    ):
        raise ValueError(
            "prefix (`wor*`) and fuzzy (`word~`) terms are any-of by "
            "definition and require disjunctive mode"
        )

    cat = Catalog(index_root)
    reg = cat.read_registry()
    n_docs = int(reg["n_docs"])
    # one lexicon read per DISTINCT prefix / fuzzy stem across the batch
    all_pre = sorted(
        {pre for p in live.values() for pre in (*p.prefixes, *p.neg_prefixes)}
    )
    all_fz = sorted(
        {fz for p in live.values() for fz in (*p.fuzzies, *p.neg_fuzzies)}
    )
    exp = {pre: bm25.expand_prefix(cat, reg, pre, max_expand) for pre in all_pre}
    fexp = {
        fz: bm25.expand_fuzzy(cat, reg, fz[0], fz[1], max_expand)
        for fz in all_fz
    }
    pos_toks = {
        qid: sorted(
            set(p.positive_tokens)
            | {t for pre in p.prefixes for t in exp[pre]}
            | {t for fz in p.fuzzies for t in fexp[fz]}
        )
        for qid, p in live.items()
    }
    excl_toks = {
        qid: sorted(
            set(p.neg_terms)
            | {t for pre in p.neg_prefixes for t in exp[pre]}
            | {t for fz in p.neg_fuzzies for t in fexp[fz]}
        )
        for qid, p in live.items()
    }
    # a query whose only positive content was a void expansion matches nothing
    live = {qid: p for qid, p in live.items() if pos_toks[qid]}
    if not live:
        return empty

    any_phrase = any(p.phrases or p.neg_phrases for p in live.values())
    # conjunctive plain mode: every positive token is required, so the
    # canonical conjunctive retrieval applies as-is; disjunctive mode with
    # phrases still needs phrase tokens present -> retrieval stays
    # disjunctive (scoring wants every positive token's contribution) and
    # the phrase verify enforces containment, which implies presence
    base = bm25.topk(
        spark,
        index_root,
        {qid: " ".join(pos_toks[qid]) for qid in live},
        mode=mode,
        k=max(n_docs, 1) if any_phrase else k,
        with_url=True,
        exclude={
            qid: " ".join(excl_toks[qid]) for qid in live if excl_toks[qid]
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
