"""span_containing / span_within (plans/near.py) — big-encloses-little
span queries against a pure-Python witness oracle, plus the Lucene
scoring split (containing scores big, within scores little) and the
match-set identity between the two."""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.positions import build_positions
from rt_etl_yahoo_search_engine_spark.plans import bm25
from rt_etl_yahoo_search_engine_spark.plans.near import (
    span_containing_topk,
    span_within_topk,
)
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    # big = alpha .. beta (ordered), little = mid
    ("d0", "alpha mid beta x x x", "en"),          # contained, width 2
    ("d1", "alpha x x x mid beta", "en"),          # width 5: slop >= 4 only
    ("d2", "mid alpha beta", "en"),                # little BEFORE big: no
    ("d3", "beta mid alpha", "en"),                # wrong order: no
    ("d4", "alpha beta x mid", "en"),              # little after big: no
    ("d5", "alpha mid x beta alpha", "en"),        # contained, width 3
    ("d6", "alpha beta mid alpha mid beta", "en"), # second big encloses
    ("d7", "alpha x beta", "en"),                  # no little occurrence
]
TOKS = {u: t.split() for u, t, _ in DOCS}

QUERIES = {
    "s1": ("alpha", "beta", "mid"),
    "s2": ("alpha", "zzznope", "mid"),  # OOV big clause: no matches
}


def _py_matched(slop):
    want = set()
    t1, t2, t3 = QUERIES["s1"]
    for u, seq in TOKS.items():
        ok = False
        for p1, a in enumerate(seq):
            if a != t1:
                continue
            for p2 in range(p1 + 1, min(p1 + slop + 1, len(seq) - 1) + 1):
                if seq[p2] != t2:
                    continue
                if any(
                    seq[p3] == t3 for p3 in range(p1, p2 + 1)
                ):
                    ok = True
        if ok:
            want.add(u)
    return want


@pytest.fixture(scope="module")
def span_index(spark, tmp_path_factory):
    from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index

    df = spark.createDataFrame(DOCS, "url string, text string, lang string")
    root = str(tmp_path_factory.mktemp("spanc") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    build_positions(spark, df, root, tokenizer="text")
    docmap = {
        r["doc_id"]: r["url"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


@pytest.mark.parametrize("slop", [1, 2, 4, 10])
def test_match_set_equals_python_witness(spark, span_index, slop):
    root, docmap = span_index
    out = span_containing_topk(spark, root, QUERIES, slop=slop, k=10)
    got = {qid: set() for qid in QUERIES}
    for r in out.collect():
        got[r["query_id"]].add(docmap[r["doc_id"]])
    assert got["s1"] == _py_matched(slop), (slop, got["s1"])
    assert got["s2"] == set()


def test_within_matches_same_docs_as_containing(spark, span_index):
    root, _ = span_index
    a = span_containing_topk(spark, root, QUERIES, slop=4, k=10)
    b = span_within_topk(spark, root, QUERIES, slop=4, k=10)
    sa = {(r["query_id"], r["doc_id"]) for r in a.collect()}
    sb = {(r["query_id"], r["doc_id"]) for r in b.collect()}
    assert sa == sb and sa


def test_scoring_split_big_vs_little(spark, span_index):
    root, _ = span_index
    cont = {
        r["doc_id"]: round(r["score"], 9)
        for r in span_containing_topk(
            spark, root, {"s1": QUERIES["s1"]}, slop=4, k=10
        ).collect()
    }
    within = {
        r["doc_id"]: round(r["score"], 9)
        for r in span_within_topk(
            spark, root, {"s1": QUERIES["s1"]}, slop=4, k=10
        ).collect()
    }
    big = {
        r["doc_id"]: round(r["score"], 9)
        for r in bm25.topk(
            spark, root, {"s1": "alpha beta"},
            mode=spec.MODE_CONJUNCTIVE, k=100,
        ).collect()
    }
    little = {
        r["doc_id"]: round(r["score"], 9)
        for r in bm25.topk(
            spark, root, {"s1": "mid"},
            mode=spec.MODE_DISJUNCTIVE, k=100,
        ).collect()
    }
    assert cont and set(cont) == set(within)
    for d, s in cont.items():
        assert s == big[d]
    for d, s in within.items():
        assert s == little[d]


def test_negative_slop_rejected(spark, span_index):
    root, _ = span_index
    with pytest.raises(ValueError):
        span_containing_topk(spark, root, QUERIES, slop=-1)
