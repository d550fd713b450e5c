"""Score explanation (plans/explain): per-term BM25 breakdown whose total
is bit-identical to both search paths' score, with the non-match cases
(conjunctive miss, excluded token, tombstoned doc) returning None."""

import math

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.deletes import delete_docs
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans import bm25
from rt_etl_yahoo_search_engine_spark.plans.explain import explain
from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher
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
QUERY = "apple banana cherry"


@pytest.fixture(scope="module")
def xidx(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t in DOCS], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("explain") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


def test_explain_total_matches_both_search_paths(spark, xidx):
    root, _ = xidx
    hits = bm25.topk(spark, root, {"q": QUERY}, k=len(DOCS)).collect()
    assert hits
    searcher = LocalSearcher(root)
    serve = {d: s for _, d, s in searcher.search(QUERY, k=len(DOCS))}
    for r in hits:
        ex = explain(root, QUERY, r["doc_id"])
        assert ex is not None
        assert ex["score"] == r["score"] == serve[r["doc_id"]]  # bitwise
        assert ex["score"] == sum(t["weight"] for t in ex["terms"])
    # the searcher method delegates to the same implementation
    d0 = hits[0]["doc_id"]
    assert searcher.explain(QUERY, d0) == explain(root, QUERY, d0)


def test_explain_components(spark, xidx):
    root, docmap = xidx
    ex = explain(root, QUERY, docmap["u0"])
    toks = {u: spec.tokenize(t) for u, t in DOCS}
    n = len(DOCS)
    by_term = {t["term"]: t for t in ex["terms"]}
    assert sorted(by_term) == ["apple", "banana", "cherry"]
    assert ex["n_matched"] == 3 and ex["n_terms"] == 3
    assert ex["doc_len"] == len(toks["u0"]) == 5
    for term, row in by_term.items():
        tf = toks["u0"].count(term)
        df = sum(term in ts for ts in toks.values())
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        assert row["tf"] == tf and row["df"] == df
        assert row["idf"] == pytest.approx(idf, abs=1e-12)
        norm = (tf * (spec.K1 + 1.0)) / (
            tf + spec.K1 * (1.0 - spec.B + spec.B * 5 / ex["avgdl"])
        )
        assert row["tf_norm"] == pytest.approx(norm, rel=1e-12)
        assert row["weight"] == row["idf"] * row["tf_norm"]


def test_explain_non_match_cases(spark, xidx):
    root, docmap = xidx
    # u4 ("date egg egg grape") shares no token with QUERY
    assert explain(root, QUERY, docmap["u4"]) is None
    # u1 lacks "cherry": conjunctive miss, disjunctive partial match
    assert explain(root, QUERY, docmap["u1"], mode=spec.MODE_CONJUNCTIVE) is None
    part = explain(root, QUERY, docmap["u1"])
    assert part["n_matched"] == 2 < part["n_terms"]
    # conjunctive full match works
    full = explain(root, QUERY, docmap["u0"], mode=spec.MODE_CONJUNCTIVE)
    assert full is not None and full["n_matched"] == 3
    # a query term absent from the corpus: conjunctive can never match
    assert (
        explain(root, QUERY + " zzz", docmap["u0"], mode=spec.MODE_CONJUNCTIVE)
        is None
    )
    # excluded token present in the doc -> not a match
    assert explain(root, QUERY, docmap["u0"], exclude="cherry") is None
    assert explain(root, QUERY, docmap["u1"], exclude="cherry") is not None
    # out-of-range doc id
    assert explain(root, QUERY, 10_000) is None


def test_explain_deleted_doc_is_none(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t in DOCS], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("explain_del") / "idx")
    build_index(spark, df, root, n_shards=1, n_buckets=2, tokenizer="text")
    dm = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    assert explain(root, QUERY, dm["u0"]) is not None
    delete_docs(spark, root, doc_ids=[dm["u0"]])
    assert explain(root, QUERY, dm["u0"]) is None
    assert explain(root, QUERY, dm["u1"]) is not None
