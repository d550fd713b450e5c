"""Unified search syntax — plans/search.py (parse_query + search_topk).

parse_query is unit-tested pure-Python; search_topk is checked against a
hand-computed containment oracle on a crafted corpus, with scores asserted
equal to the plain BM25 path over the positive tokens (composition must
not rescore anything).
"""

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.operators.positions import build_positions
from rt_etl_yahoo_search_engine_spark.plans import bm25
from rt_etl_yahoo_search_engine_spark.plans.search import parse_query, search_topk
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog


# -- parser (no Spark) ------------------------------------------------------

def test_parse_plain_phrase_minus():
    q = parse_query('scan "join column" -filter -"table hash" fast')
    assert q.terms == ["scan", "fast"]
    assert q.phrases == ["join column"]
    assert q.neg_terms == ["filter"]
    assert q.neg_phrases == ["table hash"]
    assert q.positive_tokens == ["column", "fast", "join", "scan"]


def test_parse_edge_cases():
    assert parse_query("").positive_tokens == []
    assert parse_query("-only -negative").positive_tokens == []
    q = parse_query('"" - "a b" plain')
    assert q.phrases == ["a b"] and q.terms == ["plain"]
    assert parse_query('"one"').phrases == ["one"]
    # punctuation inside a phrase tokenizes like the engine does
    assert parse_query('"C++ fast!"').phrases == ["C++ fast!"]
    assert spec.tokenize("C++ fast!") == ["c", "fast"]


# -- end to end -------------------------------------------------------------

DOCS = [
    ("d0", "alpha beta gamma delta", "en"),
    ("d1", "alpha gamma beta", "en"),       # has all, 'alpha beta' NOT adjacent
    ("d2", "alpha beta epsilon", "en"),
    ("d3", "beta alpha", "en"),
    ("d4", "alpha epsilon zeta", "en"),
    ("d5", "gamma delta epsilon", "en"),
]
TOKS = {u: t.split() for u, t, _ in [(u, t, l) for u, t, l in DOCS]}


@pytest.fixture(scope="module")
def search_index(spark, tmp_path_factory):
    df = spark.createDataFrame(DOCS, "url string, text string, lang string")
    root = str(tmp_path_factory.mktemp("searchsyntax") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    build_positions(spark, df, root, tokenizer="text")
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


def _contains(seq, sub):
    m = len(sub)
    return any(seq[i : i + m] == sub for i in range(len(seq) - m + 1))


def _expected_docs(query, mode):
    p = parse_query(query)
    pos = p.positive_tokens
    if not pos:
        return set()  # pure negation returns no rows (documented)
    out = set()
    for u, seq in TOKS.items():
        present = set(seq)
        if mode == spec.MODE_CONJUNCTIVE:
            if not set(pos) <= present:
                continue
        else:
            if not (set(pos) & present):
                continue
        if any(not _contains(seq, spec.tokenize(ph)) for ph in p.phrases):
            continue
        if any(t in present for t in p.neg_terms):
            continue
        if any(_contains(seq, spec.tokenize(ph)) for ph in p.neg_phrases):
            continue
        out.add(u)
    return out


CASES = [
    'alpha "beta gamma"',            # d0 only (d1 has beta gamma? no: gamma beta)
    '"alpha beta" -epsilon',         # d0 (d2 excluded by epsilon)
    'epsilon -"alpha beta"',         # d4, d5 (d2 has the phrase)
    'alpha -gamma',                  # d2, d3, d4
    'delta epsilon',                 # disjunctive: d0, d2, d4, d5
    '"gamma beta"',                  # d1 only
    '"alpha beta" "gamma delta"',    # nobody has both adjacent... d0? alpha beta yes, gamma delta yes!
    '-everything',                   # pure negation: empty
    '"zzznope alpha"',               # unknown token in phrase: empty
]


@pytest.mark.parametrize("query", CASES)
@pytest.mark.parametrize("mode", [spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE])
def test_matches_containment_oracle(spark, search_index, query, mode):
    root, docmap = search_index
    out = search_topk(spark, root, {"q": query}, mode=mode, k=10)
    got = {r["doc_id"] for r in out.collect()}
    want = {docmap[u] for u in _expected_docs(query, mode)}
    assert got == want, (query, mode)


def test_es_bool_query_mapping(spark, search_index):
    """The Elasticsearch one-level bool query maps onto the search syntax
    with no new machinery: must -> quoted single terms (conjunctive by
    construction), should -> plain terms (scored when present), must_not
    -> minus terms.  {must: [alpha, beta], should: [epsilon], must_not:
    [delta]} == '"alpha" "beta" epsilon -delta', and the scores are the
    plain BM25 path over the positive tokens — ES's sum-of-matching-
    clauses semantics for term queries."""
    root, docmap = search_index
    got = {
        r["doc_id"]: r["score"]
        for r in search_topk(
            spark, root, {"q": '"alpha" "beta" epsilon -delta'}, k=10
        ).collect()
    }
    want_docs = {
        u for u, seq in TOKS.items()
        if {"alpha", "beta"} <= set(seq) and "delta" not in seq
    }
    assert set(got) == {docmap[u] for u in want_docs} and got  # d2, d3
    full = {
        r["doc_id"]: r["score"]
        for r in bm25.topk(
            spark, root, {"q": "alpha beta epsilon"}, k=len(DOCS)
        ).collect()
    }
    assert got == {d: full[d] for d in got}


def test_scores_equal_plain_bm25_over_positive_tokens(spark, search_index):
    root, _ = search_index
    query = 'alpha "beta gamma" -epsilon'
    pos_text = " ".join(parse_query(query).positive_tokens)
    got = {
        r["doc_id"]: round(r["score"], 9)
        for r in search_topk(spark, root, {"q": query}, k=10).collect()
    }
    assert got
    full = {
        r["doc_id"]: round(r["score"], 9)
        for r in bm25.topk(spark, root, {"q": pos_text},
                           k=len(DOCS) + 1).collect()
    }
    for doc, score in got.items():
        assert full[doc] == score


@pytest.mark.parametrize("mode", [spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE])
def test_serve_search_query_matches_distributed(spark, search_index, mode):
    from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher

    root, _ = search_index
    searcher = LocalSearcher(root)
    for query in CASES:
        dist = [
            (r["rank"], r["doc_id"], round(r["score"], 9))
            for r in search_topk(spark, root, {"q": query}, mode=mode, k=10)
            .orderBy("rank").collect()
        ]
        serve = [
            (r, d, round(s, 9))
            for r, d, s in searcher.search_query(query, mode=mode, k=10)
        ]
        assert serve == dist, (query, mode)


def test_ranks_dense_and_urls(spark, search_index):
    root, _ = search_index
    out = search_topk(
        spark, root, {"q": "alpha -gamma", "r": '"alpha beta"'},
        k=10, with_url=True,
    ).collect()
    assert {r["query_id"] for r in out} == {"q", "r"}
    for qid in ("q", "r"):
        ranks = sorted(r["rank"] for r in out if r["query_id"] == qid)
        assert ranks == list(range(1, len(ranks) + 1))
    assert all(r["url"] for r in out)
