"""Federated search (plans/federate): exact combined statistics make
per-index scoring equal to one index built over the union corpus."""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
from rt_etl_yahoo_search_engine_spark.plans.federate import (
    federated_stats,
    federated_topk,
)
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("a0", "alpha beta gamma", "en"),
    ("a1", "alpha beta", "en"),
    ("a2", "alpha delta delta", "en"),
    ("a3", "beta delta epsilon", "en"),
    ("b0", "gamma gamma epsilon", "en"),
    ("b1", "alpha beta gamma delta", "en"),
    ("b2", "alpha alpha beta beta", "en"),
    ("b3", "delta epsilon epsilon zeta", "en"),
    ("b4", "zeta zeta alpha", "en"),
]
QUERIES = {
    "q1": "alpha beta",
    "q2": "gamma epsilon",
    "q3": "delta",
    "q4": "zeta alpha",
    "q5": "zzznope",
}


@pytest.fixture(scope="module")
def fed_indexes(spark, tmp_path_factory):
    """Two disjoint halves + the union index (ground truth)."""
    base = tmp_path_factory.mktemp("fed")
    roots = []
    for name, rows in (
        ("ia", DOCS[:4]),
        ("ib", DOCS[4:]),
        ("iu", DOCS),
    ):
        df = spark.createDataFrame(
            rows, "url string, text string, lang string"
        )
        root = str(base / name)
        build_index(spark, df, root, n_shards=2, n_buckets=4,
                    tokenizer="text")
        roots.append(root)
    return roots


def _scores_by_url(spark, df, root):
    cat = Catalog(root)
    dm = {r["doc_id"]: r["url"] for r in cat.read(spark, "docmap").collect()}
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], {})[dm[r["doc_id"]]] = r["score"]
    return out


@pytest.mark.parametrize("mode", [spec.MODE_DISJUNCTIVE,
                                  spec.MODE_CONJUNCTIVE])
def test_federated_equals_union_index(spark, fed_indexes, mode):
    """Every federated score EQUALS the union-index score for the same
    url, and the match sets are identical (k = corpus size)."""
    ia, ib, iu = fed_indexes
    fed = federated_topk(spark, [ia, ib], QUERIES, mode=mode, k=len(DOCS),
                         with_url=True)
    want = _scores_by_url(
        spark, topk(spark, iu, QUERIES, mode=mode, k=len(DOCS)), iu
    )
    got = {}
    for r in fed.collect():
        got.setdefault(r["query_id"], {})[r["url"]] = r["score"]
    assert set(got) == {q for q, hits in want.items() if hits}
    for qid, hits in got.items():
        assert set(hits) == set(want[qid]), qid
        for u, s in hits.items():
            assert s == pytest.approx(want[qid][u], rel=1e-12), (qid, u)


def test_federated_rank_order_matches_union(spark, fed_indexes):
    """Top-k rank order (by url) matches the union index wherever scores
    are distinct; ties may legitimately reorder across identities."""
    ia, ib, iu = fed_indexes
    fed = federated_topk(spark, [ia, ib], QUERIES, k=3, with_url=True)
    base = topk(spark, iu, QUERIES, k=3)
    dm = {
        r["doc_id"]: r["url"]
        for r in Catalog(iu).read(spark, "docmap").collect()
    }
    fed_ranked = {}
    for r in fed.collect():
        fed_ranked.setdefault(r["query_id"], []).append(
            (r["rank"], r["url"], r["score"])
        )
    base_ranked = {}
    for r in base.collect():
        base_ranked.setdefault(r["query_id"], []).append(
            (r["rank"], dm[r["doc_id"]], r["score"])
        )
    for qid, rows in base_ranked.items():
        f = sorted(fed_ranked[qid])
        b = sorted(rows)
        scores = [s for _, _, s in b]
        if len(set(scores)) == len(scores):  # no ties -> exact order
            assert [(rk, u) for rk, u, _ in f] == [
                (rk, u) for rk, u, _ in b
            ], qid


def test_federated_stats_combine(spark, fed_indexes):
    ia, ib, iu = fed_indexes
    n, avgdl, idf = federated_stats(
        [ia, ib], ["alpha", "zeta", "zzznope"]
    )
    reg = Catalog(iu).read_registry()
    assert n == int(reg["n_docs"])
    assert avgdl == pytest.approx(float(reg["avgdl"]), rel=1e-15)
    df_alpha = sum(
        1 for _, t, _ in DOCS if "alpha" in spec.tokenize(t)
    )
    assert idf["alpha"] == pytest.approx(
        spec.idf(n, df_alpha), rel=1e-15
    )
    assert "zzznope" not in idf


def test_federated_index_id_and_ties(spark, fed_indexes):
    """index_id reflects list position; out-of-vocab queries vanish."""
    ia, ib, _ = fed_indexes
    fed = federated_topk(spark, [ia, ib], QUERIES, k=20, with_url=True)
    rows = fed.collect()
    assert all(r["index_id"] in (0, 1) for r in rows)
    by_idx = {r["url"]: r["index_id"] for r in rows}
    for u, i in by_idx.items():
        assert i == (0 if u.startswith("a") else 1)
    assert not [r for r in rows if r["query_id"] == "q5"]


def test_federated_empty_roots_rejected(spark):
    with pytest.raises(ValueError, match="index root"):
        federated_topk(spark, [], QUERIES)
