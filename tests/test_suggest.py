"""Spell suggestion (plans/suggest): OOV-only gating and the
(dist asc, df desc, term asc) ranking, against a pure-Python recompute
over the corpus vocabulary."""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.suggest import _lev, suggest

DOCS = [
    ("u0", "grape grape grape banana cherry"),
    ("u1", "apple banana banana fig"),
    ("u2", "apple cherry cherry grape"),
    ("u3", "banana banana date fig"),
    ("u4", "date egg egg grape"),
    ("u5", "cherry date apple egg"),
    ("u6", "fig grape fig banana"),
]


@pytest.fixture(scope="module")
def sidx(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t in DOCS], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("suggest") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    return root


def _python_suggest(q, max_dist, per_term):
    toks = [spec.tokenize(t) for _, t in DOCS]
    df = {}
    for ts in toks:
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    cand = sorted(
        (dist, -df[t], t)
        for t in df
        if (dist := _lev(q, t, max_dist)) <= max_dist
    )
    return [(t, -ndf, d) for d, ndf, t in cand[:per_term]]


def test_lev_is_plain_edit_distance():
    assert _lev("kitten", "sitting", 3) == 3
    assert _lev("abc", "acb", 2) == 2  # transposition costs 2 (no Damerau)
    assert _lev("same", "same", 2) == 0
    assert _lev("a", "abcdef", 2) == 3  # capped: returns cap+1


def test_suggest_ranks_by_dist_df_term(spark, sidx):
    # "grap" is 1 edit from grape(df=4); also within 2 of apple? no —
    # verify against the recompute rather than hand-derived sets
    got = suggest(sidx, "grap datx", max_dist=2, per_term=3)
    assert got["grap"] == _python_suggest("grap", 2, 3)
    assert got["datx"] == _python_suggest("datx", 2, 3)
    assert got["grap"][0][0] == "grape"
    # df breaks distance ties: "datx" is 1 edit from date(df=3); any other
    # 1-edit candidates must rank by df desc then term asc
    dists = [d for _, _, d in got["datx"]]
    assert dists == sorted(dists)


def test_serve_suggest_delegates(spark, sidx):
    from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher

    s = LocalSearcher(sidx)
    assert s.suggest("grap") == suggest(sidx, "grap")


def test_suggest_in_vocab_and_empty(spark, sidx):
    got = suggest(sidx, "grape zzzzzzzz", max_dist=2, per_term=3)
    assert got["grape"] == []  # in vocabulary: not misspelled
    assert got["zzzzzzzz"] == []  # nothing within 2 edits
    assert suggest(sidx, "  ", max_dist=2) == {}
