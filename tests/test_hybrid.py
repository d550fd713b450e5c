"""Hybrid RRF retrieval (plans/hybrid.rrf_topk): BM25 top-k_each fused
with embedding-cosine top-k_each by 1/(k0+rank).

The fusion is checked against a pure-Python recomputation that takes the
lexical ranks from bm25.topk (rank-exactness of that path is covered by
its own suites) and recomputes the dense ranks + RRF independently in
numpy — so the join/window/score logic of the fusion itself is what's
under test, including docs present on only one list.
"""

import numpy as np
import pytest

from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans import bm25
from rt_etl_yahoo_search_engine_spark.plans.hybrid import rrf_topk
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("d0", "alpha beta gamma", [1.0, 0.0, 0.0]),
    ("d1", "alpha beta", [0.9, 0.1, 0.0]),
    ("d2", "alpha delta", [0.0, 1.0, 0.0]),
    ("d3", "beta delta epsilon", [0.0, 0.9, 0.3]),
    ("d4", "gamma epsilon", [0.5, 0.5, 0.0]),
    ("d5", "zeta eta", [1.0, 0.1, 0.1]),   # lexical miss, dense hit
]
QUERIES = {"q1": "alpha beta", "q2": "delta"}
QVECS = {"q1": [1.0, 0.05, 0.0], "q2": [0.1, 1.0, 0.1]}
K0, K_EACH = 60, 4


@pytest.fixture(scope="module")
def hybrid_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t, _ in DOCS], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("hybrid") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


def _python_rrf(spark, root, docmap, k):
    emb = {docmap[u]: np.asarray(v, dtype=np.float64) for u, _, v in DOCS}
    lex_ranks = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in bm25.topk(spark, root, QUERIES, k=K_EACH).collect()
    }
    want = {}
    for qid, qv in QVECS.items():
        q = np.asarray(qv, dtype=np.float64)
        cos = {
            d: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
            for d, v in emb.items()
        }
        dense_order = sorted(cos, key=lambda d: (-cos[d], d))[:K_EACH]
        dense_ranks = {d: i + 1 for i, d in enumerate(dense_order)}
        rrf = {}
        for d in set(dense_ranks) | {d for (q_, d) in lex_ranks if q_ == qid}:
            s = 0.0
            if (qid, d) in lex_ranks:
                s += 1.0 / (K0 + lex_ranks[(qid, d)])
            if d in dense_ranks:
                s += 1.0 / (K0 + dense_ranks[d])
            rrf[d] = s
        for i, d in enumerate(sorted(rrf, key=lambda d: (-rrf[d], d))[:k]):
            want[(qid, i + 1)] = (d, round(rrf[d], 12))
    return want


def test_rrf_matches_python_oracle(spark, hybrid_index):
    root, docmap = hybrid_index
    emb_df = spark.createDataFrame(
        [(docmap[u], v) for u, _, v in DOCS], "doc_id long, embedding array<float>"
    )
    qv_df = spark.createDataFrame(
        list(QVECS.items()), "query_id string, qemb array<float>"
    )
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["rrf"], 12))
        for r in rrf_topk(
            spark, root, QUERIES, qv_df, emb_df, k=4, k_each=K_EACH
        ).collect()
    }
    want = _python_rrf(spark, root, docmap, k=4)
    assert got and got == want
    # d5 never matches lexically but must surface via the dense list for q1
    assert any(
        doc == docmap["d5"] for (qid, _), (doc, _) in got.items() if qid == "q1"
    )


def test_rrf_one_sided_queries(spark, hybrid_index):
    """A query with only a lexical side (no vector) and one with only a
    dense side (no text match) both degrade gracefully to the single
    list's ranking."""
    root, docmap = hybrid_index
    emb_df = spark.createDataFrame(
        [(docmap[u], v) for u, _, v in DOCS], "doc_id long, embedding array<float>"
    )
    qv_df = spark.createDataFrame(
        [("qdense", QVECS["q1"])], "query_id string, qemb array<float>"
    )
    out = rrf_topk(
        spark, root,
        {"qlex": "alpha", "qmiss": "zzznope"},
        qv_df, emb_df, k=3, k_each=K_EACH,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["rrf"]))
    # lexical-only query: ranks follow the BM25 list exactly
    lex = [
        (r["rank"], r["doc_id"])
        for r in bm25.topk(spark, root, {"qlex": "alpha"}, k=3).collect()
    ]
    assert [(rk, d) for rk, d, _ in sorted(by_q["qlex"])] == lex
    assert all(abs(s - 1.0 / (K0 + rk)) < 1e-12 for rk, _, s in by_q["qlex"])
    # dense-only query: top-3 follows the cosine order
    q = np.asarray(QVECS["q1"], dtype=np.float64)
    cos = {
        docmap[u]: float(
            np.asarray(v) @ q / (np.linalg.norm(v) * np.linalg.norm(q))
        )
        for u, _, v in DOCS
    }
    dense3 = sorted(cos, key=lambda d: (-cos[d], d))[:3]
    assert [d for _, d, _ in sorted(by_q["qdense"])] == dense3
    assert "qmiss" not in by_q  # no list at all -> no rows
