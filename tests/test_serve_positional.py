"""Serve-path phrase / NEAR parity — LocalSearcher.search_phrase and
.search_near must be rank-identical to the distributed positional plans
(plans/phrase verify="positions", plans/near) on the same index, including
duplicate-token phrases, single-token queries, and no-match controls.
Also: both raise the sidecar's absent error on an index without one.
"""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.operators.positions import build_positions
from rt_etl_yahoo_search_engine_spark.plans.near import near_topk
from rt_etl_yahoo_search_engine_spark.plans.phrase import phrase_topk
from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher

DOCS = [
    ("d0", "alpha beta alpha beta alpha", "en"),
    ("d1", "alpha alpha alpha", "en"),
    ("d2", "alpha beta gamma", "en"),
    ("d3", "delta alpha omega beta", "en"),
    ("d4", "beta x x x alpha gamma", "en"),
    ("d5", "gamma x beta", "en"),
]


@pytest.fixture(scope="module")
def srv_index(spark, tmp_path_factory):
    df = spark.createDataFrame(DOCS, "url string, text string, lang string")
    root = str(tmp_path_factory.mktemp("srvpos") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    build_positions(spark, df, root, tokenizer="text")
    return root


def _dist_rows(df):
    return [
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.orderBy("rank").collect()
    ]


PHRASES = ["alpha beta", "alpha beta alpha", "alpha alpha", "beta",
           "beta alpha gamma", "zzznope beta"]


@pytest.mark.parametrize("phrase", PHRASES)
def test_serve_phrase_equals_distributed(spark, srv_index, phrase):
    dist = _dist_rows(
        phrase_topk(spark, srv_index, {"q": phrase}, k=10, verify="positions")
    )
    serve = [
        (r, d, round(s, 9))
        for r, d, s in LocalSearcher(srv_index).search_phrase(phrase, k=10)
    ]
    assert serve == dist


@pytest.mark.parametrize("window", [1, 2, 3, 6])
def test_serve_near_equals_distributed(spark, srv_index, window):
    searcher = LocalSearcher(srv_index)
    for q in ["alpha beta", "alpha gamma", "beta gamma", "alpha",
              "alpha zzznope"]:
        dist = _dist_rows(
            near_topk(spark, srv_index, {"q": q}, window=window, k=10)
        )
        serve = [
            (r, d, round(s, 9))
            for r, d, s in searcher.search_near(q, window=window, k=10)
        ]
        assert serve == dist, (q, window)


def test_serve_positional_requires_sidecar(spark, tmp_path_factory):
    df = spark.createDataFrame(DOCS, "url string, text string, lang string")
    root = str(tmp_path_factory.mktemp("srvnopos") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    s = LocalSearcher(root)
    # the query terms DO match docs, so the failure is the missing sidecar,
    # not an empty candidate set
    with pytest.raises(ValueError, match="sidecar"):
        s.search_phrase("alpha beta")
    with pytest.raises(ValueError, match="sidecar"):
        s.search_near("alpha beta", window=3)


def test_serve_phrase_k_truncation(spark, srv_index):
    all_hits = LocalSearcher(srv_index).search_phrase("beta", k=10)
    one = LocalSearcher(srv_index).search_phrase("beta", k=1)
    assert len(all_hits) > 1
    assert one == all_hits[:1]
