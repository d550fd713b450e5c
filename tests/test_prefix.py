"""Prefix operator (`wor*` / `-wor*`) — plans/bm25.expand_prefix +
plans/search.search_topk + LocalSearcher.search_query.

The expansion is a lexicon range read; everything downstream must behave
EXACTLY as if the user had typed the expanded terms: identical scores
(plain BM25 over the union), identical exclusion (family -> excluded term
set), identical serve-path ranking.
"""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans import bm25
from rt_etl_yahoo_search_engine_spark.plans.bm25 import expand_prefix
from rt_etl_yahoo_search_engine_spark.plans.search import parse_query, search_topk
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("d0", "alpha alphabet altitude beta", "en"),
    ("d1", "alpha beta gamma", "en"),
    ("d2", "alphabet delta", "en"),
    ("d3", "beta gamma delta", "en"),
    ("d4", "altitude epsilon alpha alpha", "en"),
]
TOKS = {u: t.split() for u, t, _ in DOCS}
VOCAB = sorted({t for seq in TOKS.values() for t in seq})


@pytest.fixture(scope="module")
def prefix_index(spark, tmp_path_factory):
    df = spark.createDataFrame(DOCS, "url string, text string, lang string")
    root = str(tmp_path_factory.mktemp("prefix") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


# -- parsing ------------------------------------------------------------------

def test_parse_star_forms():
    p = parse_query("al* beta -ga* -delta")
    assert p.prefixes == ["al"]
    assert p.terms == ["beta"]
    assert p.neg_prefixes == ["ga"]
    assert p.neg_terms == ["delta"]
    # multi-token star word: leading tokens stay plain, last is the prefix
    p = parse_query("data-base*")
    assert p.terms == ["data"] and p.prefixes == ["base"]
    # a bare star and an empty stem are ignored
    p = parse_query("* -* alpha")
    assert p.terms == ["alpha"] and not p.prefixes and not p.neg_prefixes


# -- expansion ----------------------------------------------------------------

def test_expand_prefix_matches_vocab(spark, prefix_index):
    root, _ = prefix_index
    cat = Catalog(root)
    reg = cat.read_registry()
    assert expand_prefix(cat, reg, "al") == ["alpha", "alphabet", "altitude"]
    assert expand_prefix(cat, reg, "alpha") == ["alpha", "alphabet"]
    assert expand_prefix(cat, reg, "zz") == []
    assert expand_prefix(cat, reg, "b") == ["beta"]


def test_expand_prefix_cap_keeps_highest_df(spark, prefix_index):
    root, _ = prefix_index
    cat = Catalog(root)
    reg = cat.read_registry()
    df = {t: sum(t in seq for seq in TOKS.values()) for t in VOCAB}
    want = sorted(
        sorted(
            [t for t in VOCAB if t.startswith("al")],
            key=lambda t: (-df[t], t),
        )[:2]
    )
    assert expand_prefix(cat, reg, "al", max_expand=2) == want


# -- end to end ----------------------------------------------------------------

def _expected_docs(query):
    """Pure-Python oracle: disjunctive over plain tokens + expansions,
    minus any doc containing an excluded token or excluded-family token."""
    p = parse_query(query)
    exp = {
        pre: {t for t in VOCAB if t.startswith(pre)}
        for pre in set(p.prefixes) | set(p.neg_prefixes)
    }
    pos = set(p.positive_tokens) | {t for pre in p.prefixes for t in exp[pre]}
    neg = set(p.neg_terms) | {t for pre in p.neg_prefixes for t in exp[pre]}
    return {
        u
        for u, seq in TOKS.items()
        if (set(seq) & pos) and not (set(seq) & neg)
    }


CASES = [
    "al* delta",        # wide expansion + plain term
    "alpha*",           # expansion only
    "delta -al*",       # family exclusion
    "zz* delta",        # void prefix contributes nothing
    "zz*",              # void prefix alone: no positive tokens -> empty
    "b* -b*",           # self-cancelling family
]


@pytest.mark.parametrize("query", CASES)
def test_matches_python_oracle(spark, prefix_index, query):
    root, docmap = prefix_index
    out = search_topk(spark, root, {"q": query}, k=10)
    got = {r["doc_id"] for r in out.collect()}
    assert got == {docmap[u] for u in _expected_docs(query)}, query


def test_scores_equal_manually_expanded_query(spark, prefix_index):
    root, _ = prefix_index
    got = {
        (r["doc_id"]): (r["rank"], round(r["score"], 9))
        for r in search_topk(spark, root, {"q": "al* delta"}, k=10).collect()
    }
    want = {
        (r["doc_id"]): (r["rank"], round(r["score"], 9))
        for r in search_topk(
            spark, root, {"q": "alpha alphabet altitude delta"}, k=10
        ).collect()
    }
    assert got and got == want


def test_conjunctive_mode_rejects_prefixes(spark, prefix_index):
    root, _ = prefix_index
    with pytest.raises(ValueError, match="disjunctive"):
        search_topk(
            spark, root, {"q": "al* beta"},
            mode=spec.MODE_CONJUNCTIVE, k=10,
        ).collect()
    # negated families alone are mode-independent and allowed
    root_, docmap = prefix_index
    out = search_topk(
        spark, root, {"q": "beta delta -al*"},
        mode=spec.MODE_CONJUNCTIVE, k=10,
    )
    want = {
        docmap[u] for u, seq in TOKS.items()
        if {"beta", "delta"} <= set(seq)
        and not any(t.startswith("al") for t in seq)
    }
    assert {r["doc_id"] for r in out.collect()} == want and want


def test_serve_search_query_matches_distributed(spark, prefix_index):
    from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher

    root, _ = prefix_index
    searcher = LocalSearcher(root)
    for query in CASES:
        dist = [
            (r["rank"], r["doc_id"], round(r["score"], 9))
            for r in search_topk(spark, root, {"q": query}, k=10)
            .orderBy("rank").collect()
        ]
        serve = [
            (r, d, round(s, 9)) for r, d, s in searcher.search_query(query, k=10)
        ]
        assert serve == dist, query
    with pytest.raises(ValueError, match="disjunctive"):
        searcher.search_query("al*", mode=spec.MODE_CONJUNCTIVE)


def test_max_expand_restricts_scoring(spark, prefix_index):
    """With max_expand=1 only the highest-df 'al' term (alpha) scores."""
    root, _ = prefix_index
    got = {
        r["doc_id"]: round(r["score"], 9)
        for r in search_topk(
            spark, root, {"q": "al*"}, k=10, max_expand=1
        ).collect()
    }
    want = {
        r["doc_id"]: round(r["score"], 9)
        for r in bm25.topk(spark, root, {"q": "alpha"}, k=10).collect()
    }
    assert got == want and got
