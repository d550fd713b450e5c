"""Cavnar-Trenkle n-gram rank-profile language ID —
functions/text_analysis.ngram_lang_id — against a from-scratch Python
implementation of the exact docstring contract (boundary-padded char
trigrams, count-desc/gram-asc ranks, out-of-place distance with n_top
penalty, argmin with lang-asc tie-break)."""

import re
from collections import Counter

from rt_etl_yahoo_search_engine_spark.functions.text_analysis import (
    ngram_lang_id,
)


def _trigrams(text):
    grams = []
    for t in re.findall(r"[a-z0-9]+", text.lower()):
        p = f"_{t}_"
        grams += [p[i : i + 3] for i in range(len(p) - 2)]
    return grams


def _rank_profile(grams, k):
    c = Counter(grams)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {g: i + 1 for i, (g, _) in enumerate(ranked)}


def _py_langid(rows, k):
    by_lang = {}
    for _d, lang, text in rows:
        by_lang.setdefault(lang, []).extend(_trigrams(text))
    profs = {lang: _rank_profile(g, k) for lang, g in by_lang.items()}
    out = {}
    for doc_id, _lang, text in rows:
        dp = _rank_profile(_trigrams(text), k)
        if not dp:
            continue
        best = None
        for lang in sorted(profs):
            d = sum(
                abs(dr - profs[lang][g]) if g in profs[lang] else k
                for g, dr in dp.items()
            )
            if best is None or (d, lang) < best:
                best = (d, lang)
        out[doc_id] = (best[1], best[0])
    return out


ROWS = [
    (1, "en", "the quick brown fox jumps over the lazy dog near the river"),
    (2, "en", "a stitch in time saves nine and the early bird catches worms"),
    (3, "en", "rivers and mountains under the open northern sky tonight"),
    (4, "xx", "zuzu vexa qofi zuzu mira vexa lupo qofi zuzu vexa"),
    (5, "xx", "qofi lupo zuzu mira vexa lupo mira zuzu qofi lupo"),
    (6, "en", "the dog and the fox share the river bank in the morning"),
    (7, "xx", "mira zuzu lupo vexa qofi mira zuzu vexa lupo qofi mira"),
    (8, "en", ""),  # no tokens -> no output row
]


def test_matches_python_reimplementation(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, lang string, text string")
    got = {
        r.doc_id: (r.pred_lang, r.dist)
        for r in ngram_lang_id(df, n_top=20).collect()
    }
    assert got == _py_langid(ROWS, 20)


def test_self_classification_separates_languages(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, lang string, text string")
    got = {r.doc_id: r.pred_lang for r in ngram_lang_id(df, n_top=20).collect()}
    truth = {d: lang for d, lang, text in ROWS if text}
    assert got == truth  # the synthetic languages are trivially separable
    assert 8 not in got  # empty doc emits no row
