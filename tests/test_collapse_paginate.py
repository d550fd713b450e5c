"""Field collapsing (plans/collapse) and paging (plans/paginate), plus the
plans/stats.score_docs primitive they share, checked against a pure-Python
BM25 recomputation and against plans/bm25.topk's own ranking."""

import math

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans import bm25
from rt_etl_yahoo_search_engine_spark.plans.collapse import collapsed_topk
from rt_etl_yahoo_search_engine_spark.plans.paginate import (
    search_after,
    topk_page,
)
from rt_etl_yahoo_search_engine_spark.plans.stats import score_docs
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("d0", "alpha beta gamma", "web"),
    ("d1", "alpha beta", "web"),
    ("d2", "alpha delta", "wiki"),
    ("d3", "beta delta epsilon", "wiki"),
    ("d4", "gamma gamma epsilon", "news"),
    ("d5", "alpha beta gamma delta", "news"),
    ("d6", "alpha alpha beta beta", "web"),
    ("d7", "delta epsilon epsilon", "wiki"),
]
TOKS = {u: t.split() for u, t, _ in DOCS}
SRC = {u: s for u, _, s in DOCS}
QUERIES = {"q1": "alpha beta", "q2": "gamma epsilon", "q3": "delta"}


def _python_scores(mode):
    """query_id -> {url: exact BM25 score} over the full match set."""
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
            present = [t for t in toks if t in seq]
            if mode == spec.MODE_CONJUNCTIVE and len(present) < len(toks):
                continue
            if not present:
                continue
            s = 0.0
            for t in present:
                tf = seq.count(t)
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s += idf * (tf * (spec.K1 + 1.0)) / (
                    tf + spec.K1 * (1.0 - spec.B + spec.B * len(seq) / avgdl)
                )
            hits[u] = s
        out[qid] = hits
    return out


@pytest.fixture(scope="module")
def cp_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t, _ in DOCS],
        "url string, text string, lang string",
    )
    root = str(tmp_path_factory.mktemp("cp") / "idx")
    build_index(spark, df, root, n_shards=3, n_buckets=4, tokenizer="text")
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


@pytest.mark.parametrize(
    "mode", [spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE]
)
def test_score_docs_full_relation(spark, cp_index, mode):
    root, docmap = cp_index
    rev = {d: u for u, d in docmap.items()}
    got = {
        (r["query_id"], rev[r["doc_id"]]): r["score"]
        for r in score_docs(spark, root, QUERIES, mode=mode).collect()
    }
    want = {
        (qid, u): s
        for qid, hits in _python_scores(mode).items()
        for u, s in hits.items()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_score_docs_ranks_match_topk(spark, cp_index):
    """Sorting score_docs reproduces bm25.topk exactly (ranks AND docs) —
    the scorer and the full-relation path agree."""
    root, _ = cp_index
    want = {}
    for r in bm25.topk(spark, root, QUERIES, k=100).collect():
        want.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], pytest.approx(r["score"], rel=1e-12))
        )
    rel = score_docs(spark, root, QUERIES).collect()
    got = {}
    for qid in QUERIES:
        rows = sorted(
            ((r["doc_id"], r["score"]) for r in rel if r["query_id"] == qid),
            key=lambda p: (-p[1], p[0]),
        )
        got[qid] = [(i + 1, d, s) for i, (d, s) in enumerate(rows)]
    assert got == want


def test_collapsed_topk(spark, cp_index):
    root, docmap = cp_index
    rev = {d: u for u, d in docmap.items()}
    collapse = spark.createDataFrame(
        [(docmap[u], SRC[u]) for u in TOKS], "doc_id long, site string"
    )
    out = collapsed_topk(spark, root, QUERIES, collapse, k=10)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["key"], rev[r["doc_id"]])
        )
    for qid, hits in _python_scores(spec.MODE_DISJUNCTIVE).items():
        best = {}
        for u, s in hits.items():
            k = SRC[u]
            # higher score wins; ties -> lower doc_id
            cur = best.get(k)
            cand = (-s, docmap[u], u)
            if cur is None or cand < cur:
                best[k] = cand
        ranked = sorted(best.items(), key=lambda kv: kv[1])
        want = [
            (i + 1, k, u) for i, (k, (_, _, u)) in enumerate(ranked)
        ]
        assert got.get(qid, []) == want
    # exactly one row per (query, key)
    assert (
        out.groupBy("query_id", "key").count().filter("count > 1").count()
        == 0
    )


def test_topk_page_slices(spark, cp_index):
    root, _ = cp_index
    full = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in bm25.topk(spark, root, QUERIES, k=6).collect()
    }
    p2 = topk_page(spark, root, QUERIES, k=3, page_from=3)
    got = {(r["query_id"], r["rank"]): r["doc_id"] for r in p2.collect()}
    want = {k: v for k, v in full.items() if 3 < k[1] <= 6}
    assert got == want  # absolute ranks, exact page slice


def test_search_after_chains_whole_ranking(spark, cp_index):
    """Walking pages by cursor reproduces the complete ranking in order,
    with no overlap and no gaps."""
    root, _ = cp_index
    want = {}
    for r in bm25.topk(spark, root, QUERIES, k=100).collect():
        want.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    walked = {qid: [] for qid in QUERIES}
    cursors = None
    for _ in range(5):  # enough pages of 2 to exhaust every match set
        page = search_after(spark, root, QUERIES, cursors=cursors, k=2)
        rows = page.collect()
        if not rows:
            break
        nxt = dict(cursors or {})  # exhausted queries keep their cursor
        for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
            walked[r["query_id"]].append((r["doc_id"], r["score"]))
            nxt[r["query_id"]] = (r["score"], r["doc_id"])
        cursors = nxt
    for qid in QUERIES:
        assert [d for d, _ in walked[qid]] == [d for d, _ in want.get(qid, [])]
        for (_, a), (_, b) in zip(walked[qid], want[qid]):
            assert a == pytest.approx(b, rel=1e-12)


def test_search_after_no_cursor_is_page_one(spark, cp_index):
    root, _ = cp_index
    a = search_after(spark, root, QUERIES, k=3).collect()
    b = bm25.topk(spark, root, QUERIES, k=3).collect()
    assert {(r["query_id"], r["rank"], r["doc_id"]) for r in a} == {
        (r["query_id"], r["rank"], r["doc_id"]) for r in b
    }
