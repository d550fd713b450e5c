"""More-Like-This (plans/mlt): interesting-term selection and seed-free
retrieval.

Term selection is checked against a pure-Python tf·idf recomputation from
the raw texts (same BM25 idf formula the lexicon stores); the retrieval
is checked against bm25.topk run on the same selected terms with the seed
dropped and ranks renumbered — so what's under test is the selection
ranking, the k+1 over-fetch, and the rank-shift join, not BM25 itself
(rank-exactness of plans/bm25.topk has its own suites)."""

import math

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans import bm25
from rt_etl_yahoo_search_engine_spark.plans.mlt import (
    interesting_terms,
    mlt_topk,
)
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("u0", "apple apple apple banana cherry"),
    ("u1", "apple banana banana fig"),
    ("u2", "apple cherry cherry grape"),
    ("u3", "banana banana date fig"),
    ("u4", "date egg egg grape"),
    ("u5", "cherry date apple egg"),
    ("u6", "fig grape fig banana"),
]


@pytest.fixture(scope="module")
def mlt_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t in DOCS], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("mlt") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


def _python_selection(seed_url, max_terms, min_tf=1, min_df=1):
    toks = {u: spec.tokenize(t) for u, t in DOCS}
    n = len(DOCS)
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    seed = toks[seed_url]
    tf = {t: seed.count(t) for t in set(seed)}
    idf = {t: math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0) for t in df}
    cand = [
        t for t in tf
        if tf[t] >= min_tf and df[t] >= min_df
    ]
    cand.sort(key=lambda t: (-(tf[t] * idf[t]), t))
    return cand[:max_terms]


def test_interesting_terms_match_python(spark, mlt_index):
    root, docmap = mlt_index
    for max_terms in (2, 3, 10):
        got = interesting_terms(
            root, {"q": docmap["u0"], "r": docmap["u3"]}, max_terms=max_terms
        )
        assert got["q"] == _python_selection("u0", max_terms)
        assert got["r"] == _python_selection("u3", max_terms)


def test_interesting_terms_gates(spark, mlt_index):
    root, docmap = mlt_index
    # min_tf=2: only the seed's repeated term survives
    got = interesting_terms(root, {"q": docmap["u0"]}, min_tf=2)
    assert got["q"] == _python_selection("u0", 10, min_tf=2) == ["apple"]
    # min_df gate drops corpus-rare terms from the selection
    got = interesting_terms(root, {"q": docmap["u0"]}, min_df=3)
    assert got["q"] == _python_selection("u0", 10, min_df=3)
    assert "cherry" in got["q"]  # df(cherry)=3 survives


def test_mlt_excludes_seed_and_reranks(spark, mlt_index):
    root, docmap = mlt_index
    seeds = {"q": docmap["u0"], "r": docmap["u4"]}
    k = 4
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in mlt_topk(spark, root, seeds, k=k, max_terms=3).collect()
    }
    # independent recompute: same terms through bm25.topk at exhaustive k,
    # seed dropped, ranks renumbered
    sel = interesting_terms(root, seeds, max_terms=3)
    queries = {qid: " ".join(ts) for qid, ts in sel.items()}
    full = bm25.topk(spark, root, queries, k=len(DOCS)).collect()
    want = {}
    for qid, seed in seeds.items():
        rows = sorted(
            (r["rank"], r["doc_id"], r["score"])
            for r in full
            if r["query_id"] == qid and r["doc_id"] != seed
        )
        for i, (_, d, s) in enumerate(rows[:k]):
            want[(qid, i + 1)] = (d, s)
    assert got == want
    assert all(d != seeds[q] for (q, _), (d, _) in got.items())


def test_serve_mlt_matches_distributed(spark, mlt_index):
    """LocalSearcher.more_like_this (Sparkless) is rank- and score-
    identical to plans/mlt.mlt_topk for the same seed/params."""
    from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher

    root, docmap = mlt_index
    seeds = {"q": docmap["u0"], "r": docmap["u4"]}
    want: dict = {}
    for r in mlt_topk(spark, root, seeds, k=4, max_terms=3).collect():
        want.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    s = LocalSearcher(root)
    for qid, seed in seeds.items():
        got = s.more_like_this(seed, k=4, max_terms=3)
        assert got == sorted(want.get(qid, []))
    assert s.more_like_this(10_000) == []  # absent seed


def test_mlt_with_url_and_absent_seed(spark, mlt_index):
    root, docmap = mlt_index
    out = mlt_topk(
        spark, root, {"q": docmap["u1"], "ghost": 10_000}, k=3, with_url=True
    ).collect()
    assert {r["query_id"] for r in out} == {"q"}
    assert set(out[0].asDict()) == {"query_id", "rank", "doc_id", "url", "score"}
    urls = {r["url"] for r in out}
    assert urls <= {u for u, _ in DOCS} and "u1" not in urls
