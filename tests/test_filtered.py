"""Attribute-filtered retrieval and sort-by-field (plans/filtered),
checked against a pure-Python recomputation."""

import math

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.filtered import (
    filtered_topk,
    sort_topk,
)
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("d0", "alpha beta gamma"),
    ("d1", "alpha beta"),
    ("d2", "alpha delta"),
    ("d3", "beta delta epsilon"),
    ("d4", "gamma gamma epsilon"),
    ("d5", "alpha beta gamma delta"),
    ("d6", "alpha alpha beta beta"),
    ("d7", "delta epsilon epsilon"),
]
TOKS = {u: t.split() for u, t in DOCS}
NCH = {u: len(t) for u, t in DOCS}
QUERIES = {"q1": "alpha beta", "q2": "gamma epsilon", "q3": "delta"}


def _python_scores():
    n = len(DOCS)
    df = {}
    for seq in TOKS.values():
        for t in set(seq):
            df[t] = df.get(t, 0) + 1
    avgdl = sum(len(s) for s in TOKS.values()) / n
    out = {}
    for qid, text in QUERIES.items():
        toks = sorted(set(spec.tokenize(text)))
        hits = {}
        for u, seq in TOKS.items():
            s = 0.0
            for t in toks:
                if t not in seq:
                    continue
                tf = seq.count(t)
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s += idf * (tf * (spec.K1 + 1.0)) / (
                    tf + spec.K1 * (1.0 - spec.B + spec.B * len(seq) / avgdl)
                )
            if s > 0.0:
                hits[u] = s
        out[qid] = hits
    return out


@pytest.fixture(scope="module")
def f_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t in DOCS], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("filt") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


def test_filtered_topk_exact_under_filter(spark, f_index):
    """Docs failing the predicate never appear, and the kth survivor is
    exact — including hits the unfiltered top-k would have hidden."""
    root, docmap = f_index
    rev = {d: u for u, d in docmap.items()}
    ok = {u for u in TOKS if NCH[u] >= 15}  # drops several top scorers
    allowed = spark.createDataFrame(
        [(docmap[u],) for u in ok], "doc_id long"
    )
    out = filtered_topk(spark, root, QUERIES, allowed, k=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], rev[r["doc_id"]])
        )
    for qid, hits in _python_scores().items():
        ranked = sorted(
            ((u, s) for u, s in hits.items() if u in ok),
            key=lambda p: (-p[1], docmap[p[0]]),
        )[:3]
        assert got.get(qid, []) == [
            (i + 1, u) for i, (u, _) in enumerate(ranked)
        ]


def test_filtered_topk_empty_filter(spark, f_index):
    root, _ = f_index
    allowed = spark.createDataFrame([], "doc_id long")
    assert filtered_topk(spark, root, QUERIES, allowed, k=5).count() == 0


@pytest.mark.parametrize("ascending", [True, False])
def test_sort_topk(spark, f_index, ascending):
    root, docmap = f_index
    rev = {d: u for u, d in docmap.items()}
    attrs = spark.createDataFrame(
        [(docmap[u], NCH[u]) for u in TOKS], "doc_id long, n_chars long"
    )
    out = sort_topk(
        spark, root, QUERIES, attrs, k=4, ascending=ascending
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], rev[r["doc_id"]], r["sort_value"])
        )
    for qid, hits in _python_scores().items():
        sign = 1 if ascending else -1
        ranked = sorted(
            hits, key=lambda u: (sign * NCH[u], docmap[u])
        )[:4]
        assert got.get(qid, []) == [
            (i + 1, u, NCH[u]) for i, u in enumerate(ranked)
        ]
