"""dis_max (plans/dismax.py) and boosting (plans/boosting.py) queries
against pure-Python oracles, plus their reduction identities."""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
from rt_etl_yahoo_search_engine_spark.plans.boosting import boosting_topk
from rt_etl_yahoo_search_engine_spark.plans.dismax import dismax_topk
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
QUERIES = {"q1": "alpha beta gamma", "q2": "alpha beta", "q3": "gamma"}


def _weights():
    """(qid, url) -> list of matched-term BM25 weights."""
    n_docs = len(DOCS)
    avgdl = sum(len(t) for t in TOKS.values()) / n_docs
    df = {}
    for seq in TOKS.values():
        for t in set(seq):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, text in QUERIES.items():
        for u, seq in TOKS.items():
            ws = [
                spec.bm25_term_score(
                    seq.count(t), len(seq), avgdl, spec.idf(n_docs, df[t])
                )
                for t in sorted(set(text.split()))
                if t in seq
            ]
            if ws:
                out[(qid, u)] = ws
    return out


@pytest.fixture(scope="module")
def dx_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t in DOCS], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("dx") / "idx")
    build_index(spark, df, root, n_shards=3, n_buckets=4, tokenizer="text")
    docmap = {
        r["doc_id"]: r["url"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


@pytest.mark.parametrize("tie", [0.0, 0.3])
def test_dismax_matches_python_oracle(spark, dx_index, tie):
    root, docmap = dx_index
    got = {
        (r["query_id"], docmap[r["doc_id"]]): r["score"]
        for r in dismax_topk(spark, root, QUERIES, tie_breaker=tie).collect()
    }
    want = {
        key: max(ws) + tie * (sum(ws) - max(ws))
        for key, ws in _weights().items()
    }
    assert set(got) == set(want)
    for key, s in want.items():
        assert got[key] == pytest.approx(s, abs=1e-12)


def test_dismax_tie_1_is_disjunctive_sum(spark, dx_index):
    root, _ = dx_index
    a = dismax_topk(spark, root, QUERIES, tie_breaker=1.0)
    b = topk(spark, root, QUERIES, k=10, mode=spec.MODE_DISJUNCTIVE)
    got_a = {(r["query_id"], r["doc_id"]): r["score"] for r in a.collect()}
    got_b = {(r["query_id"], r["doc_id"]): r["score"] for r in b.collect()}
    assert set(got_a) == set(got_b)
    for k_, v in got_b.items():
        assert got_a[k_] == pytest.approx(v, abs=1e-12)


def test_boosting_matches_python_oracle(spark, dx_index):
    root, docmap = dx_index
    negative = {"q1": "delta", "q2": "gamma", "q3": "epsilon"}
    nb = 0.4
    got = {
        (r["query_id"], docmap[r["doc_id"]]): r["score"]
        for r in boosting_topk(
            spark, root, QUERIES, negative, negative_boost=nb
        ).collect()
    }
    want = {}
    for (qid, u), ws in _weights().items():
        s = sum(ws)
        if negative[qid] in TOKS[u]:
            s *= nb
        want[(qid, u)] = s
    assert set(got) == set(want)
    for key, s in want.items():
        assert got[key] == pytest.approx(s, abs=1e-12)


def test_boosting_demotes_not_excludes(spark, dx_index):
    root, docmap = dx_index
    # q3 "gamma": d4 ("gamma gamma epsilon") outranks d0/d5 undemoted;
    # negative "epsilon" demotes d4 below them but keeps it in results.
    plain = topk(spark, root, {"q3": "gamma"}, k=10)
    r_plain = {docmap[r["doc_id"]]: r["rank"] for r in plain.collect()}
    assert r_plain["d4"] == 1
    out = boosting_topk(
        spark, root, {"q3": "gamma"}, {"q3": "epsilon"}, negative_boost=0.1
    )
    r_boost = {docmap[r["doc_id"]]: r["rank"] for r in out.collect()}
    assert set(r_boost) == set(r_plain)          # demoted, never excluded
    assert r_boost["d4"] == len(r_plain)          # fell to the bottom
    # docs matching ONLY the negative query never appear
    only_neg = boosting_topk(
        spark, root, {"qx": "zzznope"}, {"qx": "epsilon"}
    )
    assert only_neg.count() == 0


def test_boosting_boost_1_is_identity(spark, dx_index):
    root, _ = dx_index
    negative = {"q1": "delta", "q2": "gamma", "q3": "epsilon"}
    a = boosting_topk(spark, root, QUERIES, negative, negative_boost=1.0)
    b = topk(spark, root, QUERIES, k=10, mode=spec.MODE_DISJUNCTIVE)
    assert sorted(map(tuple, a.collect())) == sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in b.collect()
    )
