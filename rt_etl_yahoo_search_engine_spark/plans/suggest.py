"""Spell suggestion — "did you mean": for each query token ABSENT from
the corpus vocabulary, the closest in-vocabulary terms.

Lucene parity (org.apache.lucene.search.spell.DirectSpellChecker with
SUGGEST_WHEN_NOT_IN_INDEX): candidates are ranked by edit distance
ascending, then document frequency descending, then term ascending —
the nearest common word wins.  Tokens already in the lexicon get no
suggestions (they aren't misspelled).

Plan shape: one term-isin lexicon read decides which tokens are OOV;
then one (term, df) column read of the lexicon + banded Levenshtein DP
over the vocabulary — a driver-side vocab-scale scan, exactly
plans/bm25.expand_fuzzy's economics, and the same documented 100 TB
path applies (a SymSpell deletion-variant sidecar or the pigeonhole
prefix/suffix split — derived data with the positions-sidecar
lifecycle).  Distances are plain edit distance (sub=1), matching
DuckDB's levenshtein() so the oracle is bit-faithful.
"""

from __future__ import annotations

from .. import spec
from ..sources.catalog import Catalog


def _lev(a: str, b: str, cap: int) -> int:
    """levenshtein(a, b), or cap+1 once it provably exceeds cap (banded
    row-min early exit; plain edit distance, matching DuckDB)."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        if min(cur) > cap:
            return cap + 1
        prev = cur
    return prev[-1]


def suggest(
    index_root: str,
    text: str,
    max_dist: int = 2,
    per_term: int = 3,
) -> dict[str, list[tuple[str, int, int]]]:
    """token -> up to per_term (suggestion, df, dist) rows for each
    distinct tokenized word of `text` that is NOT in the lexicon; ranked
    (dist asc, df desc, term asc).  In-vocabulary tokens map to []."""
    import pyarrow.dataset as ds

    cat = Catalog(index_root)
    reg = cat.read_registry()
    lex = ds.dataset(cat.path(reg["lexicon_dir"]))
    toks = sorted(set(spec.tokenize(text)))
    if not toks:
        return {}
    present = set(
        lex.to_table(columns=["term"], filter=ds.field("term").isin(toks))
        .column("term")
        .to_pylist()
    )
    out: dict[str, list[tuple[str, int, int]]] = {t: [] for t in toks}
    oov = [t for t in toks if t not in present]
    if not oov:
        return out
    tbl = lex.to_table(columns=["term", "df"])
    vocab = list(
        zip(tbl.column("term").to_pylist(), tbl.column("df").to_pylist())
    )
    for q in oov:
        cand = []
        for term, df in vocab:
            d = _lev(q, term, max_dist)
            if d <= max_dist:
                cand.append((d, -int(df), term))
        cand.sort()
        out[q] = [(term, -ndf, d) for d, ndf, term in cand[:per_term]]
    return out


def phrase_suggest(
    index_root: str,
    queries: dict[str, str],
    max_dist: int = 2,
) -> list[tuple[str, str, int]]:
    """Whole-query "did you mean" — Elasticsearch's `phrase` suggester,
    deterministic direct-generator form: each tokenized word of each
    query is kept if in-vocabulary, else replaced by its best spelling
    candidate (dist asc, df desc, term asc — the term suggester's
    ranking); words with no candidate within ``max_dist`` stay verbatim.
    Returns [(query_id, corrected_text, n_corrected)] with tokens
    rejoined in their original order.

    ES re-scores whole candidate phrases with a word n-gram language
    model; this direct form is the deterministic subset an exact oracle
    can verify — per-word independence, corpus-frequency ranked.  The
    vocabulary-scan economics (and the SymSpell upgrade path at scale)
    are `suggest`'s, documented above."""
    out: list[tuple[str, str, int]] = []
    for qid, text in sorted(queries.items()):
        toks = spec.tokenize(text)
        per = suggest(index_root, text, max_dist=max_dist, per_term=1)
        fixed, n_corr = [], 0
        for t in toks:
            best = per.get(t) or []
            if best:
                fixed.append(best[0][0])
                n_corr += 1
            else:
                fixed.append(t)
        out.append((qid, " ".join(fixed), n_corr))
    return out


def completion_suggest(
    index_root: str,
    prefixes: dict[str, str],
    per_prefix: int = 5,
) -> list[tuple[str, int, str, int]]:
    """Elasticsearch `completion` suggester over the index vocabulary:
    for each input prefix, the top ``per_prefix`` completing lexicon
    terms ranked by document frequency desc (ES ranks by suggestion
    weight; df is the corpus-derived weight), term asc tie-break —
    [(prefix_id, rank, term, df)].  Prefixes completing nothing emit no
    rows.

    Economics: one term-sorted lexicon RANGE read per prefix
    ([pfx, pfx+0x7f), a few row groups regardless of vocabulary size —
    bm25.expand_prefix's read), driver-side like the other suggesters;
    the production-scale upgrade is the same FST/sidecar note."""
    import pyarrow.dataset as ds

    cat = Catalog(index_root)
    reg = cat.read_registry()
    lex = ds.dataset(cat.path(reg["lexicon_dir"]))
    out: list[tuple[str, int, str, int]] = []
    for pid, pfx in sorted(prefixes.items()):
        tbl = lex.to_table(
            columns=["term", "df"],
            filter=(ds.field("term") >= pfx)
            & (ds.field("term") < pfx + "\x7f"),
        )
        pairs = sorted(
            zip(tbl.column("term").to_pylist(), tbl.column("df").to_pylist()),
            key=lambda p: (-p[1], p[0]),
        )[:per_prefix]
        out.extend(
            (pid, i + 1, term, int(df)) for i, (term, df) in enumerate(pairs)
        )
    return out
