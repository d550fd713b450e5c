"""Fuzzy operator (`word~` / `word~N` / `-word~`) — plans/bm25.expand_fuzzy
+ plans/search.search_topk + LocalSearcher.search_query.

Expansion semantics are plain levenshtein (transposition = 2 edits,
matching DuckDB's levenshtein() so the driver oracle is bit-faithful);
everything downstream must behave exactly as if the user had typed the
expanded terms.
"""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.bm25 import _lev_leq, expand_fuzzy
from rt_etl_yahoo_search_engine_spark.plans.search import parse_query, search_topk
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("d0", "color colour beta", "en"),
    ("d1", "color gamma", "en"),
    ("d2", "colour delta gamma", "en"),
    ("d3", "cooler beta delta", "en"),
    ("d4", "gamma epsilon color color", "en"),
]
TOKS = {u: t.split() for u, t, _ in DOCS}
VOCAB = sorted({t for seq in TOKS.values() for t in seq})


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def fuzzy_index(spark, tmp_path_factory):
    df = spark.createDataFrame(DOCS, "url string, text string, lang string")
    root = str(tmp_path_factory.mktemp("fuzzy") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


# -- parsing ------------------------------------------------------------------

def test_parse_fuzzy_forms():
    p = parse_query("color~ beta -gama~2 -delta colour~2")
    assert p.fuzzies == [("color", 1), ("colour", 2)]
    assert p.terms == ["beta"]
    assert p.neg_fuzzies == [("gama", 2)]
    assert p.neg_terms == ["delta"]
    # a bare tilde and an empty stem are ignored; star wins its own word
    p = parse_query("~ -~2 col*")
    assert not p.fuzzies and not p.neg_fuzzies and p.prefixes == ["col"]


def test_lev_leq_matches_reference():
    import itertools

    words = ["color", "colour", "cooler", "gamma", "a", "", "colro"]
    for a, b in itertools.product(words, repeat=2):
        for d in (0, 1, 2, 3):
            assert _lev_leq(a, b, d) == (_lev(a, b) <= d), (a, b, d)


# -- expansion ----------------------------------------------------------------

def test_expand_fuzzy_matches_vocab(spark, fuzzy_index):
    root, _ = fuzzy_index
    cat = Catalog(root)
    reg = cat.read_registry()
    for stem, d in (("color", 1), ("color", 2), ("colro", 1), ("zz", 1)):
        want = sorted(t for t in VOCAB if _lev(stem, t) <= d)
        assert expand_fuzzy(cat, reg, stem, d) == want, (stem, d)
    # transposition costs 2 in plain levenshtein: colro~1 must NOT match
    assert "color" not in expand_fuzzy(cat, reg, "colro", 1)
    assert "color" in expand_fuzzy(cat, reg, "colro", 2)


def test_expand_fuzzy_cap_keeps_highest_df(spark, fuzzy_index):
    root, _ = fuzzy_index
    cat = Catalog(root)
    reg = cat.read_registry()
    df = {t: sum(t in seq for seq in TOKS.values()) for t in VOCAB}
    full = [t for t in VOCAB if _lev("color", t) <= 2]
    want = sorted(sorted(full, key=lambda t: (-df[t], t))[:2])
    assert expand_fuzzy(cat, reg, "color", 2, max_expand=2) == want


# -- end to end ----------------------------------------------------------------

def _expected_docs(query):
    p = parse_query(query)
    pos = set(p.positive_tokens)
    neg = set(p.neg_terms)
    for stem, d in p.fuzzies:
        pos |= {t for t in VOCAB if _lev(stem, t) <= d}
    for stem, d in p.neg_fuzzies:
        neg |= {t for t in VOCAB if _lev(stem, t) <= d}
    return {
        u for u, seq in TOKS.items() if (set(seq) & pos) and not (set(seq) & neg)
    }


CASES = [
    "color~",            # color + colour (d1)
    "color~2 beta",      # + cooler at d2
    "delta -color~",     # family exclusion
    "zz~ gamma",         # void stem contributes nothing
    "zz~",               # void stem alone: empty
]


@pytest.mark.parametrize("query", CASES)
def test_matches_python_oracle(spark, fuzzy_index, query):
    root, docmap = fuzzy_index
    got = {r["doc_id"] for r in search_topk(spark, root, {"q": query}, k=10).collect()}
    assert got == {docmap[u] for u in _expected_docs(query)}, query


def test_scores_equal_manually_expanded_query(spark, fuzzy_index):
    root, _ = fuzzy_index
    got = {
        r["doc_id"]: (r["rank"], round(r["score"], 9))
        for r in search_topk(spark, root, {"q": "color~2 beta"}, k=10).collect()
    }
    want = {
        r["doc_id"]: (r["rank"], round(r["score"], 9))
        for r in search_topk(
            spark, root, {"q": "color colour cooler beta"}, k=10
        ).collect()
    }
    assert got and got == want


def test_conjunctive_mode_rejects_fuzzies(spark, fuzzy_index):
    root, _ = fuzzy_index
    with pytest.raises(ValueError, match="disjunctive"):
        search_topk(
            spark, root, {"q": "color~ beta"},
            mode=spec.MODE_CONJUNCTIVE, k=10,
        ).collect()


def test_serve_search_query_matches_distributed(spark, fuzzy_index):
    from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher

    root, _ = fuzzy_index
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
        searcher.search_query("color~", mode=spec.MODE_CONJUNCTIVE)
