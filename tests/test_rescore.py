"""Rescoring (plans/rescore.py) against a pure-Python oracle, plus its
ES-semantics edges: window cutoff, missing rescore clause, weights."""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
from rt_etl_yahoo_search_engine_spark.plans.rescore import rescore_topk
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
QUERIES = {"q1": "alpha", "q2": "beta gamma"}
RESCORE = {"q1": "delta epsilon", "q2": "epsilon"}


def _score(qtext, u):
    """Disjunctive BM25 sum of qtext's matched terms in doc u (or None)."""
    n_docs = len(DOCS)
    avgdl = sum(len(t) for t in TOKS.values()) / n_docs
    df = {}
    for seq in TOKS.values():
        for t in set(seq):
            df[t] = df.get(t, 0) + 1
    seq = TOKS[u]
    ws = [
        spec.bm25_term_score(
            seq.count(t), len(seq), avgdl, spec.idf(n_docs, df[t])
        )
        for t in sorted(set(qtext.split()))
        if t in seq
    ]
    return sum(ws) if ws else None


def _oracle(window_size, qw, rw, k):
    out = {}
    for qid, text in QUERIES.items():
        prim = [(u, _score(text, u)) for u in TOKS if _score(text, u)]
        prim.sort(key=lambda p: (-p[1], p[0]))
        win = prim[:window_size]
        tot = []
        for u, p in win:
            s = _score(RESCORE[qid], u) if qid in RESCORE else None
            tot.append((u, qw * p + rw * (s or 0.0)))
        tot.sort(key=lambda p: (-p[1], p[0]))
        out[qid] = tot[:k]
    return out


@pytest.fixture(scope="module")
def rs_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t in DOCS], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("rs") / "idx")
    build_index(spark, df, root, n_shards=3, n_buckets=4, tokenizer="text")
    docmap = {
        r["doc_id"]: r["url"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


@pytest.mark.parametrize("qw,rw", [(1.0, 1.0), (0.7, 2.0)])
def test_rescore_matches_python_oracle(spark, rs_index, qw, rw):
    root, docmap = rs_index
    got = {}
    rows = rescore_topk(
        spark, root, QUERIES, RESCORE, window_size=10,
        query_weight=qw, rescore_weight=rw, k=10,
    ).collect()
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], docmap[r["doc_id"]], r["score"])
        )
    want = _oracle(10, qw, rw, 10)
    for qid, ranked in want.items():
        got_q = sorted(got[qid])
        assert [(u, pytest.approx(s, abs=1e-12)) for _, u, s in got_q] == [
            (u, s) for u, s in ranked
        ]


def test_rescore_window_cuts_candidates(spark, rs_index):
    """Docs below the primary window never appear, even if the rescore
    query would have boosted them into the top-k (ES window semantics)."""
    root, docmap = rs_index
    # q1 "alpha": d6 (alpha alpha alpha) leads; window of 2 keeps the two
    # best primary docs only, so a huge rescore weight can't resurrect
    # anything below them.
    out = rescore_topk(
        spark, root, {"q1": "alpha"}, {"q1": "delta epsilon"},
        window_size=2, rescore_weight=100.0, k=2,
    )
    urls = {docmap[r["doc_id"]] for r in out.collect()}
    prim = [(u, _score("alpha", u)) for u in TOKS if _score("alpha", u)]
    prim.sort(key=lambda p: (-p[1], p[0]))
    assert urls == {u for u, _ in prim[:2]}


def test_rescore_without_clause_is_weighted_primary(spark, rs_index):
    root, _ = rs_index
    a = rescore_topk(spark, root, QUERIES, {}, window_size=10, k=10)
    b = topk(spark, root, QUERIES, k=10, mode=spec.MODE_DISJUNCTIVE)
    assert sorted(map(tuple, a.collect())) == sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in b.collect()
    )


def test_rescore_k_above_window_rejected(spark, rs_index):
    root, _ = rs_index
    with pytest.raises(ValueError):
        rescore_topk(spark, root, QUERIES, RESCORE, window_size=5, k=10)
