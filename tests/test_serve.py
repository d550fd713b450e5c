"""Serving path (plans.serve.LocalSearcher) is rank- and score-identical to
the distributed path (plans.bm25.topk) — same index, same query set, both
modes — and prunes its reads to the queried terms' buckets."""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher


@pytest.fixture(scope="module")
def searcher(index_dir):
    return LocalSearcher(index_dir)


@pytest.mark.parametrize("mode", [spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE])
def test_serve_matches_distributed(spark, index_dir, searcher, mode):
    dist = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in topk(spark, index_dir, spec.REFERENCE_QUERIES, mode=mode, k=10).collect()
    }
    local = searcher.search_batch(spec.REFERENCE_QUERIES, mode=mode, k=10)
    got = {
        (q, int(rank)): (int(doc), float(score))
        for q, rank, doc, score in zip(
            local["query_id"], local["rank"], local["doc_id"], local["score"]
        )
    }
    assert set(got) == set(dist)
    for key, (doc, score) in got.items():
        ddoc, dscore = dist[key]
        assert doc == ddoc, f"{key}: doc {doc} != {ddoc}"
        assert score == pytest.approx(dscore, abs=1e-12), key


def test_serve_single_query_shapes(searcher):
    hits = searcher.search("Chicken Rice", mode=spec.MODE_DISJUNCTIVE, k=5)
    assert 0 < len(hits) <= 5
    ranks = [h[0] for h in hits]
    assert ranks == list(range(1, len(hits) + 1))
    scores = [h[2] for h in hits]
    assert scores == sorted(scores, reverse=True)


def test_serve_unknown_term(searcher):
    # conjunctive with an out-of-corpus term -> no doc can match all terms
    assert searcher.search("chicken zzzznotaword", mode=spec.MODE_CONJUNCTIVE) == []
    # disjunctive ignores the unknown term but still matches the known one
    assert len(searcher.search("chicken zzzznotaword", mode=spec.MODE_DISJUNCTIVE)) > 0
    # all-unknown and empty queries
    assert searcher.search("zzzznotaword") == []
    assert searcher.search("") == []


def test_serve_term_cache(searcher):
    searcher.search("Starbucks Coffee")
    assert searcher._term_cache.get("starbucks") is not None
    assert searcher._term_cache.get("coffee") is not None
    searcher.search("zzzznotaword")
    assert searcher._term_cache.get("zzzznotaword") is None  # negative-cached
