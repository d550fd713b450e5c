"""span_or clauses inside ordered proximity (plans/near.
span_or_near_topk — Lucene SpanNearQuery over SpanOrQuery clauses):
python ordered-span oracle with alternatives, single-alternative
identity with span_near_topk, union property vs expanded queries, and
slop semantics."""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.positions import build_positions
from rt_etl_yahoo_search_engine_spark.plans.near import (
    span_near_topk, span_or_near_topk,
)
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("d0", "alpha beta gamma delta", "en"),
    ("d1", "alpha x beta y gamma", "en"),
    ("d2", "alpha x x zeta", "en"),
    ("d3", "beta alpha gamma", "en"),
    ("d4", "alpha zeta x x gamma", "en"),
    ("d5", "zeta beta alpha", "en"),
    ("d6", "alpha alpha zeta beta", "en"),
]


@pytest.fixture(scope="module")
def span_index(spark, tmp_path_factory):
    from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index

    df = spark.createDataFrame(DOCS, "url string, text string, lang string")
    root = str(tmp_path_factory.mktemp("spanor") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    build_positions(spark, df, root, tokenizer="text")
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    toks = {docmap[u]: spec.tokenize(t) for u, t, _ in DOCS}
    return root, toks


def _py_span_or(seq, clauses, slop):
    n = len(clauses)
    bound = slop + n - 1
    occ = [
        [p for p, t in enumerate(seq) if t in set(c)] for c in clauses
    ]
    for start in occ[0]:
        cur = start
        ok = True
        for i in range(1, n):
            nxts = [p for p in occ[i] if p > cur and p <= start + bound]
            if not nxts:
                ok = False
                break
            cur = min(nxts)
        if ok:
            return True
    return False


@pytest.mark.parametrize("slop", [0, 1, 3])
def test_matches_python_oracle(spark, span_index, slop):
    root, toks = span_index
    queries = {
        "q1": [["alpha"], ["beta", "zeta"]],
        "q2": [["alpha"], ["beta", "zeta"], ["gamma"]],
        "q3": [["beta", "gamma"], ["alpha"]],
        "q4": [["alpha"], ["missingterm", "beta"]],
    }
    out = span_or_near_topk(spark, root, queries, slop=slop, k=50)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["doc_id"])
    for qid, clauses in queries.items():
        want = {
            d for d, seq in toks.items() if _py_span_or(seq, clauses, slop)
        }
        assert got.get(qid, set()) == want, (qid, slop)


def test_single_alternative_identity(spark, span_index):
    root, _ = span_index
    or_q = {"s1": [["alpha"], ["beta"]], "s2": [["alpha"], ["gamma"]]}
    plain_q = {"s1": "alpha beta", "s2": "alpha gamma"}
    for slop in (0, 2):
        a = span_or_near_topk(spark, root, or_q, slop=slop, k=50).collect()
        b = span_near_topk(spark, root, plain_q, slop=slop, k=50).collect()
        da = {(r["query_id"], r["doc_id"]): (r["rank"], round(r["score"], 9))
              for r in a}
        db = {(r["query_id"], r["doc_id"]): (r["rank"], round(r["score"], 9))
              for r in b}
        assert da == db, slop


def test_or_clause_is_union_of_expansions(spark, span_index):
    root, _ = span_index
    or_out = span_or_near_topk(
        spark, root, {"q": [["alpha"], ["beta", "zeta"]]}, slop=1, k=50
    )
    e1 = span_near_topk(spark, root, {"q": "alpha beta"}, slop=1, k=50)
    e2 = span_near_topk(spark, root, {"q": "alpha zeta"}, slop=1, k=50)
    got = {r["doc_id"] for r in or_out.collect()}
    want = {r["doc_id"] for r in e1.collect()} | {
        r["doc_id"] for r in e2.collect()
    }
    assert got == want


def test_empty_clause_list_returns_empty(spark, span_index):
    root, _ = span_index
    out = span_or_near_topk(spark, root, {"q": []}, k=10)
    assert out.count() == 0
