"""Composite aggregation (after-key pagination), pipeline aggs
(cumulative_sum / derivative), and adjacency_matrix (plans/stats.py)
against pure-Python oracles."""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.stats import (
    adjacency_matrix,
    composite_agg,
    histogram_pipeline,
)
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("d0", "alpha beta gamma", "web", 17),
    ("d1", "alpha beta", "web", 9),
    ("d2", "alpha delta", "wiki", 11),
    ("d3", "beta delta epsilon", "wiki", 18),
    ("d4", "gamma gamma epsilon", "news", 19),
    ("d5", "alpha beta gamma delta", "news", 22),
    ("d6", "alpha alpha alpha", "web", 17),
]
TOKS = {u: t.split() for u, t, _, _ in DOCS}
SRC = {u: s for u, _, s, _ in DOCS}
NCH = {u: n for u, _, _, n in DOCS}

QUERIES = {"q1": "alpha", "q2": "beta", "q3": "epsilon"}


def _hits(qid):
    toks = set(QUERIES[qid].split())
    return {u for u, seq in TOKS.items() if toks & set(seq)}


@pytest.fixture(scope="module")
def comp_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t, _, _ in DOCS],
        "url string, text string, lang string",
    )
    root = str(tmp_path_factory.mktemp("comp") / "idx")
    build_index(spark, df, root, n_shards=3, n_buckets=4, tokenizer="text")
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    attrs = spark.createDataFrame(
        [(docmap[u], SRC[u], NCH[u]) for u in TOKS],
        "doc_id long, source string, n_chars long",
    )
    return root, attrs


def _comp_oracle(qid, size, after):
    buckets = {}
    for u in _hits(qid):
        key = (SRC[u], float(NCH[u] // 10 * 10))
        buckets[key] = buckets.get(key, 0) + 1
    keys = sorted(buckets)
    if after is not None:
        keys = [k for k in keys if k > after]
    return [(k, buckets[k]) for k in keys[:size]]


@pytest.mark.parametrize("after", [None, ("web", 0.0), ("news", 19.0)])
def test_composite_pages(spark, comp_index, after):
    root, attrs = comp_index
    out = composite_agg(
        spark, root, QUERIES, attrs,
        [("terms", "source"), ("histogram", "n_chars", 10.0)],
        size=3, after=after,
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append(
            ((r["source"], r["n_chars"]), r["doc_count"])
        )
    for qid in QUERIES:
        want = _comp_oracle(qid, 3, after)
        assert sorted(got.get(qid, [])) == want, (qid, after)


def test_composite_pagination_covers_everything(spark, comp_index):
    """Walking pages by after-key enumerates every bucket exactly once —
    the invariant that makes composite THE scale agg."""
    root, attrs = comp_index
    seen, after = [], None
    for _ in range(10):
        page = composite_agg(
            spark, root, {"q1": "alpha"}, attrs,
            [("terms", "source"), ("histogram", "n_chars", 10.0)],
            size=2, after=after,
        ).collect()
        if not page:
            break
        rows = sorted((r["source"], r["n_chars"]) for r in page)
        seen.extend(rows)
        after = rows[-1]
    assert seen == sorted(set(seen))          # no dup, in order
    assert seen == [k for k, _ in _comp_oracle("q1", 99, None)]


def test_histogram_pipeline(spark, comp_index):
    root, attrs = comp_index
    out = histogram_pipeline(
        spark, root, QUERIES, attrs, "n_chars", interval=10.0
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append(
            (r["bucket_key"], r["n_hits"], r["cum_hits"], r["deriv"])
        )
    for qid in QUERIES:
        buckets = {}
        for u in _hits(qid):
            k = float(NCH[u] // 10 * 10)
            buckets[k] = buckets.get(k, 0) + 1
        want, cum, prev = [], 0, None
        for k in sorted(buckets):
            cum += buckets[k]
            want.append(
                (k, buckets[k], cum,
                 None if prev is None else buckets[k] - prev)
            )
            prev = buckets[k]
        assert sorted(got[qid]) == want, qid


def test_adjacency_matrix(spark, comp_index):
    root, _ = comp_index
    got = {
        (r["filter_a"], r["filter_b"]): r["doc_count"]
        for r in adjacency_matrix(spark, root, QUERIES).collect()
    }
    want = {}
    hits = {qid: _hits(qid) for qid in QUERIES}
    for a in QUERIES:
        for b in QUERIES:
            if a <= b and hits[a] & hits[b]:
                want[(a, b)] = len(hits[a] & hits[b])
    assert got == want
    # diagonal == each filter's own match count
    for qid in QUERIES:
        assert got[(qid, qid)] == len(hits[qid])


def test_adjacency_matrix_conjunctive_mode(spark, comp_index):
    root, _ = comp_index
    q = {"qa": "alpha beta", "qb": "gamma"}
    got = {
        (r["filter_a"], r["filter_b"]): r["doc_count"]
        for r in adjacency_matrix(
            spark, root, q, mode=spec.MODE_CONJUNCTIVE
        ).collect()
    }
    ha = {u for u, s in TOKS.items() if {"alpha", "beta"} <= set(s)}
    hb = {u for u, s in TOKS.items() if "gamma" in s}
    assert got == {
        ("qa", "qa"): len(ha),
        ("qa", "qb"): len(ha & hb),
        ("qb", "qb"): len(hb),
    }
