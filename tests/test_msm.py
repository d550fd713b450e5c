"""minimum_should_match retrieval (plans/msm.py) against a pure-Python
BM25 oracle, plus the reduction identities to the existing modes."""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
from rt_etl_yahoo_search_engine_spark.plans.msm import msm_topk
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

QUERIES = {
    "q1": "alpha beta gamma",   # 3 clauses
    "q2": "alpha beta",         # 2 clauses
    "q3": "gamma",              # 1 clause: m=2 -> MatchNoDocs
    "q4": "alpha zzznope",      # OOV clause can never match: m=2 -> none
}


def _py_msm(m):
    """(query_id, doc) -> score over matched terms, for docs with >= m
    matched clauses."""
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
            if len(matched) < m:
                continue
            s = sum(
                spec.bm25_term_score(
                    seq.count(t), len(seq), avgdl, spec.idf(n_docs, df[t])
                )
                for t in matched
            )
            out[(qid, u)] = s
    return out


@pytest.fixture(scope="module")
def msm_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t in DOCS], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("msm") / "idx")
    build_index(spark, df, root, n_shards=3, n_buckets=4, tokenizer="text")
    docmap = {
        r["doc_id"]: r["url"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


@pytest.mark.parametrize("m", [2, 3])
def test_msm_scores_match_python_oracle(spark, msm_index, m):
    root, docmap = msm_index
    got = {
        (r["query_id"], docmap[r["doc_id"]]): r["score"]
        for r in msm_topk(spark, root, QUERIES, min_should_match=m).collect()
    }
    want = _py_msm(m)
    assert set(got) == set(want)
    for key, s in want.items():
        assert got[key] == pytest.approx(s, abs=1e-12)


def test_msm_1_is_disjunctive(spark, msm_index):
    root, _ = msm_index
    a = msm_topk(spark, root, QUERIES, min_should_match=1, k=10)
    b = topk(spark, root, QUERIES, k=10, mode=spec.MODE_DISJUNCTIVE)
    assert sorted(map(tuple, a.collect())) == sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in b.collect()
    )


def test_msm_all_terms_is_conjunctive(spark, msm_index):
    root, _ = msm_index
    q = {"q2": QUERIES["q2"]}  # both terms in vocab
    a = msm_topk(spark, root, q, min_should_match=2, k=10)
    b = topk(spark, root, q, k=10, mode=spec.MODE_CONJUNCTIVE)
    assert sorted(map(tuple, a.collect())) == sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in b.collect()
    )


def test_msm_threshold_above_clause_count_matches_nothing(spark, msm_index):
    root, _ = msm_index
    out = msm_topk(
        spark, root, {"q3": QUERIES["q3"], "q4": QUERIES["q4"]},
        min_should_match=2,
    )
    assert out.count() == 0


def test_msm_ranks_are_dense_and_ordered(spark, msm_index):
    root, _ = msm_index
    rows = msm_topk(spark, root, QUERIES, min_should_match=2, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r["score"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys)
