"""Composed ES bool query (plans/boolquery.py) against a pure-Python
oracle, plus weighted_avg and moving_fn additions (plans/stats.py)."""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
from rt_etl_yahoo_search_engine_spark.plans.boolquery import bool_topk
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("d0", "alpha beta gamma", 10),
    ("d1", "alpha beta", 20),
    ("d2", "alpha delta", 30),
    ("d3", "beta delta epsilon", 40),
    ("d4", "gamma gamma epsilon", 50),
    ("d5", "alpha beta gamma delta", 60),
    ("d6", "alpha alpha alpha", 70),
]
TOKS = {u: t.split() for u, t, _ in DOCS}
NCH = {u: n for u, _, n in DOCS}


def _w(term, u):
    n_docs = len(DOCS)
    avgdl = sum(len(t) for t in TOKS.values()) / n_docs
    df = sum(1 for seq in TOKS.values() if term in seq)
    seq = TOKS[u]
    if term not in seq:
        return None
    return spec.bm25_term_score(
        seq.count(term), len(seq), avgdl, spec.idf(n_docs, df)
    )


@pytest.fixture(scope="module")
def bq_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t, _ in DOCS],
        "url string, text string, lang string",
    )
    root = str(tmp_path_factory.mktemp("bq") / "idx")
    build_index(spark, df, root, n_shards=3, n_buckets=4, tokenizer="text")
    docmap = {
        r["doc_id"]: r["url"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


def test_bool_all_clauses_compose(spark, bq_index):
    root, docmap = bq_index
    fwd = {u: d for d, u in docmap.items()}
    allowed = spark.createDataFrame(
        [(fwd[u],) for u in TOKS if NCH[u] >= 20], "doc_id long"
    )
    got = {
        docmap[r["doc_id"]]: r["score"]
        for r in bool_topk(
            spark, root,
            must={"q": "alpha"},
            should={"q": "gamma delta"},
            must_not={"q": "epsilon"},
            allowed=allowed,
        ).collect()
    }
    want = {}
    for u, seq in TOKS.items():
        if "alpha" not in seq:          # must
            continue
        if "epsilon" in seq:            # must_not
            continue
        if NCH[u] < 20:                 # filter
            continue
        s = _w("alpha", u)
        for t in ("gamma", "delta"):    # should boosts
            if _w(t, u):
                s += _w(t, u)
        want[u] = s
    assert set(got) == set(want) == {"d1", "d2", "d5", "d6"}
    for u, s in want.items():
        assert got[u] == pytest.approx(s, abs=1e-12)


def test_bool_should_reorders_must_matches(spark, bq_index):
    root, docmap = bq_index
    plain = topk(spark, root, {"q": "alpha"}, k=10, mode=spec.MODE_CONJUNCTIVE)
    boosted = bool_topk(
        spark, root, must={"q": "alpha"}, should={"q": "delta"}
    )
    assert plain.count() == boosted.count()     # should never filters
    rb = {docmap[r["doc_id"]]: r["rank"] for r in boosted.collect()}
    rp = {docmap[r["doc_id"]]: r["rank"] for r in plain.collect()}
    assert rb["d2"] < rp["d2"]                  # delta doc climbed


def test_bool_msm_with_must(spark, bq_index):
    root, docmap = bq_index
    got = {
        docmap[r["doc_id"]]
        for r in bool_topk(
            spark, root,
            must={"q": "alpha"},
            should={"q": "gamma delta"},
            min_should_match=2,
        ).collect()
    }
    assert got == {"d5"}    # only d5 has alpha AND both should terms


def test_bool_no_must_requires_one_should(spark, bq_index):
    root, docmap = bq_index
    a = bool_topk(spark, root, must={}, should={"q": "gamma delta"})
    b = topk(spark, root, {"q": "gamma delta"}, k=10,
             mode=spec.MODE_DISJUNCTIVE)
    assert sorted(map(tuple, a.collect())) == sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in b.collect()
    )
    assert bool_topk(spark, root, must={}, should={}).count() == 0


def test_weighted_avg_and_moving_fn(spark, bq_index):
    from rt_etl_yahoo_search_engine_spark.plans.stats import (
        histogram_pipeline,
        weighted_avg_agg,
    )

    root, docmap = bq_index
    fwd = {u: d for d, u in docmap.items()}
    attrs = spark.createDataFrame(
        [(fwd[u], NCH[u], len(TOKS[u])) for u in TOKS],
        "doc_id long, n_chars long, wt long",
    )
    q = {"q": "alpha"}
    hits = [u for u in TOKS if "alpha" in TOKS[u]]
    got = weighted_avg_agg(
        spark, root, q, attrs, "n_chars", "wt"
    ).collect()[0]["weighted_avg"]
    want = sum(NCH[u] * len(TOKS[u]) for u in hits) / sum(
        len(TOKS[u]) for u in hits
    )
    assert got == pytest.approx(want, abs=1e-12)

    rows = {
        r["bucket_key"]: r["moving_avg"]
        for r in histogram_pipeline(
            spark, root, q, attrs, "n_chars", interval=20.0,
            moving_window=2,
        ).collect()
    }
    # alpha hits: n_chars 10,20,30,60,70 -> buckets 0:1, 20:2, 60:2
    assert rows[0.0] is None                       # empty window
    assert rows[20.0] == pytest.approx(1.0)        # mean of [1]
    assert rows[60.0] == pytest.approx(1.5)        # mean of [1, 2]
