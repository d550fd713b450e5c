"""Wildcard queries — Lucene WildcardQuery: ``*`` matches any run of
characters, ``?`` exactly one; the pattern applies to the WHOLE term
(``j*n`` matches "join", not "joint").  Each pattern expands to the
matching corpus terms and the expansions score as ordinary disjunctive
BM25 contributions — the same expand-then-score composition the prefix
and fuzzy operators use (plans/bm25.expand_prefix / expand_fuzzy), so
nothing rescans or rescores.

Expansion economics: a non-wildcard PREFIX narrows the lexicon read to
the [prefix, prefix+0x7f) range — Lucene's prefix-accelerated automaton
— which is a few row groups on the term-sorted files at any vocab size;
a leading-wildcard pattern scans the (term, df) columns once
(vocab-scale driver I/O, fine to ~10^7 terms; the 100 TB path for
suffix-heavy workloads is the reversed-term sidecar expand_fuzzy's
docstring describes, which turns ``*fix`` into a range read too).
``max_expand`` keeps the highest-df expansions (df desc, term asc —
the same production cap as expand_prefix); None expands fully
(oracle-checkable: the match set equals SQL ``LIKE`` with ``*``→``%``,
``?``→``_`` over the vocabulary).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .. import spec
from ..sources.catalog import Catalog
from . import bm25

_WILD = re.compile(r"[*?]")
_WORD = re.compile(r"[^a-z0-9*?]+")
_META = set(".[](){}*+?|^$\\")


def expand_wildcard(
    cat: Catalog, reg: dict, pattern: str, max_expand: int | None = None
) -> list[str]:
    """Corpus terms matching `pattern` (whole-term ``*``/``?`` glob),
    sorted; with max_expand, the highest-df ones (df desc, term asc)."""
    import pyarrow.dataset as ds

    m = _WILD.search(pattern)
    if m is None:  # no wildcard: the pattern is a literal term
        return [pattern] if pattern else []
    lex = ds.dataset(cat.path(reg["lexicon_dir"]))
    pre = pattern[: m.start()]
    flt = (
        (ds.field("term") >= pre) & (ds.field("term") < pre + "\x7f")
        if pre
        else None
    )
    rx = re.compile(
        "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c)
            for c in pattern
        )
    )
    tbl = lex.to_table(columns=["term", "df"], filter=flt)
    pairs = sorted(
        (
            (t, df)
            for t, df in zip(
                tbl.column("term").to_pylist(), tbl.column("df").to_pylist()
            )
            if rx.fullmatch(t)
        ),
        key=lambda p: (-p[1], p[0]),
    )
    if max_expand is not None:
        pairs = pairs[:max_expand]
    return sorted(t for t, _ in pairs)


def _regex_literal_prefix(pattern: str) -> str:
    """Longest literal prefix a regex is guaranteed to require — the
    Lucene RegexpQuery prefix acceleration: literal leading chars before
    the first metacharacter (backing off one char when the metachar is a
    quantifier, which makes the preceding char optional/repeated)."""
    pre: list[str] = []
    for c in pattern:
        if c in _META:
            if c in "*?{" and pre:
                pre.pop()
            break
        pre.append(c)
    return "".join(pre)


def expand_regexp(
    cat: Catalog, reg: dict, pattern: str, max_expand: int | None = None
) -> list[str]:
    """Corpus terms fully matching `pattern` (anchored regex over the
    whole term — Lucene/ES RegexpQuery semantics), sorted; with
    max_expand, the highest-df ones (df desc, term asc).  A literal
    prefix narrows the lexicon read to a range (row-group pruning on the
    term-sorted files); prefix-free patterns scan the (term, df) columns
    once — vocab-scale driver I/O, same economics as leading-wildcard
    (see module docstring for the reversed-term sidecar path)."""
    import pyarrow.dataset as ds

    rx = re.compile(pattern)
    lex = ds.dataset(cat.path(reg["lexicon_dir"]))
    pre = _regex_literal_prefix(pattern)
    flt = (
        (ds.field("term") >= pre) & (ds.field("term") < pre + "\x7f")
        if pre
        else None
    )
    tbl = lex.to_table(columns=["term", "df"], filter=flt)
    pairs = sorted(
        (
            (t, df)
            for t, df in zip(
                tbl.column("term").to_pylist(), tbl.column("df").to_pylist()
            )
            if rx.fullmatch(t)
        ),
        key=lambda p: (-p[1], p[0]),
    )
    if max_expand is not None:
        pairs = pairs[:max_expand]
    return sorted(t for t, _ in pairs)


def regexp_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    k: int = spec.TOP_K_DEFAULT,
    max_expand: int | None = None,
    with_url: bool = False,
) -> DataFrame:
    """(query_id, rank, doc_id [, url], score): disjunctive BM25 top-k
    where each whitespace-separated word of the query is an ANCHORED
    regex over whole terms (ES `regexp` query).  Same expand-then-score
    composition as wildcard_topk: expansions join the candidate term
    set, score as ordinary BM25 contributions, nothing rescans.  A
    pattern matching no corpus term contributes nothing; a query with no
    surviving terms returns no rows."""
    cat = Catalog(index_root)
    reg = cat.read_registry()
    expanded: dict[str, str] = {}
    for qid, text in queries.items():
        toks: set[str] = set()
        for w in text.split():
            toks.update(expand_regexp(cat, reg, w, max_expand))
        if toks:
            expanded[qid] = " ".join(sorted(toks))
    return bm25.topk(
        spark,
        index_root,
        expanded or {"_": ""},
        mode=spec.MODE_DISJUNCTIVE,
        k=k,
        with_url=with_url,
    )


def wildcard_topk(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    k: int = spec.TOP_K_DEFAULT,
    max_expand: int | None = None,
    with_url: bool = False,
) -> DataFrame:
    """(query_id, rank, doc_id [, url], score): disjunctive BM25 top-k
    where each whitespace word of the query is a wildcard pattern (plain
    words are patterns that match only themselves); a pattern matching
    nothing contributes no terms, a query with no surviving terms returns
    no rows.  Disjunctive only — Lucene's semantics for a multi-term
    clause is "matches if ANY expansion matches", which IS disjunctive."""
    cat = Catalog(index_root)
    reg = cat.read_registry()
    expanded: dict[str, str] = {}
    for qid, text in queries.items():
        toks: set[str] = set()
        for w in _WORD.split(text.lower()):
            if w:
                toks.update(expand_wildcard(cat, reg, w, max_expand))
        if toks:
            expanded[qid] = " ".join(sorted(toks))
    return bm25.topk(
        spark,
        index_root,
        expanded or {"_": ""},
        mode=spec.MODE_DISJUNCTIVE,
        k=k,
        with_url=with_url,
    )
