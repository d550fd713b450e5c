"""terms_set retrieval (plans/msm.terms_set_topk — ES terms_set with
minimum_should_match_field) against a pure-Python oracle and its
reduction identity to msm_topk when every doc's required is constant."""

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.msm import msm_topk, terms_set_topk
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("d0", "alpha beta gamma"),
    ("d1", "alpha beta"),
    ("d2", "alpha delta"),
    ("d3", "beta delta epsilon"),
    ("d4", "gamma gamma epsilon"),
    ("d5", "alpha beta gamma delta"),
    ("d6", "alpha alpha alpha"),
]
TOKS = {u: t.split() for u, t in DOCS}
# per-doc minimum_should_match: d0..d6 -> 1,2,3,1,2,3,1
REQUIRED = {u: (i % 3) + 1 for i, (u, _t) in enumerate(DOCS)}

QUERIES = {
    "q1": "alpha beta gamma",  # 3 clauses
    "q2": "alpha beta",        # 2 clauses: required=3 docs can never match
    "q3": "gamma",             # 1 clause
}


def _py_terms_set():
    n_docs = len(DOCS)
    avgdl = sum(len(t) for t in TOKS.values()) / n_docs
    df = {}
    for seq in TOKS.values():
        for t in set(seq):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, text in QUERIES.items():
        terms = sorted(set(text.split()))
        for u, seq in TOKS.items():
            matched = [t for t in terms if t in seq]
            if len(matched) < REQUIRED[u]:
                continue
            s = sum(
                spec.bm25_term_score(
                    seq.count(t), len(seq), avgdl, spec.idf(n_docs, df[t])
                )
                for t in matched
            )
            out[(qid, u)] = (s, len(matched), REQUIRED[u])
    return out


@pytest.fixture(scope="module")
def ts_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t in DOCS], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("terms_set") / "idx")
    build_index(spark, df, root, n_shards=3, n_buckets=4, tokenizer="text")
    docmap = {
        r["doc_id"]: r["url"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    attrs = spark.createDataFrame(
        [(did, REQUIRED[url]) for did, url in docmap.items()],
        "doc_id long, required long",
    )
    return root, docmap, attrs


def test_terms_set_matches_python_oracle(spark, ts_index):
    root, docmap, attrs = ts_index
    got = {
        (r["query_id"], docmap[r["doc_id"]]): (
            r["score"], r["n_matched"], r["required"]
        )
        for r in terms_set_topk(spark, root, QUERIES, attrs).collect()
    }
    want = _py_terms_set()
    assert set(got) == set(want)
    for key, (s, m, req) in want.items():
        gs, gm, greq = got[key]
        assert gs == pytest.approx(s, abs=1e-12)
        assert (gm, greq) == (m, req)


def test_constant_required_reduces_to_msm(spark, ts_index):
    root, _docmap, attrs = ts_index
    const2 = attrs.select("doc_id", F.lit(2).cast("long").alias("required"))
    a = terms_set_topk(spark, root, QUERIES, const2, k=10).select(
        "query_id", "rank", "doc_id", "score"
    )
    b = msm_topk(spark, root, QUERIES, min_should_match=2, k=10)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_required_above_clause_count_never_matches(spark, ts_index):
    root, docmap, attrs = ts_index
    # q3 has one clause: docs with required >= 2 must be absent.
    out = terms_set_topk(spark, root, {"q3": QUERIES["q3"]}, attrs).collect()
    urls = {docmap[r["doc_id"]] for r in out}
    assert all(REQUIRED[u] == 1 for u in urls)
    # ...and at least one required=1 gamma doc IS present.
    assert "d0" in urls
