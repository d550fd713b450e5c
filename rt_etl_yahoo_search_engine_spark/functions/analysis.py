"""Analysis chains — ES/Lucene's analyzer layer (token filters) for
this engine: stopword removal, shingles, edge n-grams, and Porter
stemming, each as a column transformation over the spec tokenizer's
output, so an index can be built over ANY analyzed form of the text
(ES: per-field analyzers; here: analyze, then feed build_index).

JVM-side wherever the built-ins can express it (stopwords =
array_except, shingles = adjacent-slice transform, edge n-grams =
substring ladder — all codegen, no Python); the Porter stemmer is the
one genuinely algorithmic filter, applied as an Arrow-batched
mapInPandas over whole token arrays (never per-row Python UDF).

The stemmer is the classic Porter (1980) algorithm — the standard
public-domain formulation (same as Lucene's PorterStemFilter contract):
5 measure-gated suffix-rewrite steps over [C](VC)^m[V] word structure.
Deterministic, dependency-free, byte-stable, so stemmed indexes are
reproducible and query-time stemming matches index-time stemming
exactly.

Scale shape: all filters are scan-local projections (no shuffle, no
state); a stemmed index build has identical economics to a plain one —
the analyzer runs inside the same extraction/tokenize pass.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import STOPWORDS, with_tokens

_VOWELS = "aeiou"


def _cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in the [C](VC)^m[V] decomposition."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        v = not _cons(stem, i)
        if prev_vowel and not v:
            m += 1
        prev_vowel = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _cons(word, len(word) - 3)
        and not _cons(word, len(word) - 2)
        and _cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


def porter_stem(word: str) -> str:
    """Porter (1980), steps 1a-5b.  Lowercase ASCII input expected
    (the spec tokenizer's output); words of length <= 2 pass through."""
    w = word
    if len(w) <= 2:
        return w
    # --- 1a ---
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # --- 1b ---
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"
    # --- 1c ---
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # --- 2 ---
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # --- 3 ---
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # --- 4 ---
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
        "ize",
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break
    # --- 5a ---
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # --- 5b ---
    if _double_cons(w) and w.endswith("l") and _measure(w) > 1:
        w = w[:-1]
    return w


def stem_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace `text_col` with its token-wise Porter-stemmed form
    (tokens re-joined with single spaces) — the pre-pass that turns any
    corpus into a stemmed-index corpus.  Arrow-batched mapInPandas; the
    whole row set streams through, nothing shuffles."""
    import pandas as pd

    from .. import spec

    cols = docs.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )

    def stem_batch(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, str] = {}

        def stem_one(text):
            if text is None:
                return None
            out = []
            for t in spec.tokenize(text):
                s = cache.get(t)
                if s is None:
                    s = porter_stem(t)
                    cache[t] = s
                out.append(s)
            return " ".join(out)

        for pdf in pdfs:
            pdf = pdf.copy()
            pdf[text_col] = pdf[text_col].map(stem_one)
            yield pdf[cols]

    return docs.mapInPandas(stem_batch, schema)


def stem_query(text: str) -> str:
    """Query-time twin of stem_text: stem the query's tokens with the
    same stemmer so query terms hit the stemmed index's vocabulary."""
    from .. import spec

    return " ".join(porter_stem(t) for t in spec.tokenize(text))


def remove_stopwords(docs: DataFrame) -> DataFrame:
    """tokens minus the fixed STOPWORDS list (order-preserving) — ES
    `stop` filter; pure codegen (array-filter against a literal set)."""
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    return with_tokens(docs).withColumn(
        "tokens",
        F.filter("tokens", lambda t: ~F.array_contains(stops, t)),
    )


def shingles(docs: DataFrame, n: int = 2, sep: str = "_") -> DataFrame:
    """(doc_id, shingle) — word n-grams over the token sequence (ES
    `shingle` filter; the index form behind fast phrase queries).
    Codegen: a transform over a sequence of slices, no UDF."""
    return (
        with_tokens(docs)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"if(size(tokens) >= {n},"
                    f" transform(sequence(1, size(tokens) - {n - 1}),"
                    f" i -> array_join(slice(tokens, i, {n}), '{sep}')),"
                    " array())"
                )
            ).alias("shingle"),
        )
    )


def edge_ngrams(docs: DataFrame, min_gram: int = 2,
                max_gram: int = 5) -> DataFrame:
    """(doc_id, term, gram) — leading prefixes of each token between
    min_gram and max_gram chars (ES `edge_ngram` filter; the
    search-as-you-type index form).  Codegen substring ladder."""
    return (
        with_tokens(docs)
        .select("doc_id", F.explode("tokens").alias("term"))
        .select(
            "doc_id", "term",
            F.explode(
                F.expr(
                    f"if(length(term) >= {min_gram},"
                    f" transform(sequence({min_gram},"
                    f" least(length(term), {max_gram})),"
                    " g -> substring(term, 1, g)), array())"
                )
            ).alias("gram"),
        )
    )
