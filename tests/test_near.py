"""NEAR (unordered-window proximity) queries — plans/near.py.

Checks, on a crafted text-tokenizer corpus with a positional sidecar:
  * match sets equal the pure-Python window-containment oracle for several
    window widths (including W=1 single-term and unknown-term controls);
  * scores/ranks of matched docs equal the plain conjunctive BM25 path
    (NEAR re-ranks the same exact scores, it never rescores);
  * a window at least the longest doc degenerates to plain conjunctive;
  * absent sidecar raises loudly.
"""

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.positions import build_positions
from rt_etl_yahoo_search_engine_spark.plans import bm25
from rt_etl_yahoo_search_engine_spark.plans.near import near_topk
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def near_index(spark, tmp_path_factory):
    from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index

    docs = [
        ("d0", "alpha beta gamma delta epsilon zeta", "en"),
        ("d1", "alpha x x x beta", "en"),
        ("d2", "beta x alpha", "en"),
        ("d3", "alpha x x x x x x x beta x gamma", "en"),
        ("d4", "gamma gamma gamma", "en"),
        ("d5", "x alpha x", "en"),
    ]
    df = spark.createDataFrame(docs, "url string, text string, lang string")
    root = str(tmp_path_factory.mktemp("near") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    build_positions(spark, df, root, tokenizer="text")
    toks = {u: spec.tokenize(t) for u, t, _ in docs}
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, {docmap[u]: tk for u, tk in toks.items()}


def _oracle_match(toks_by_doc, terms, window):
    want = set()
    need = set(terms)
    for d, seq in toks_by_doc.items():
        if any(need <= set(seq[a : a + window]) for a in range(len(seq))):
            want.add(d)
    return want


@pytest.mark.parametrize("window", [1, 2, 3, 5])
def test_match_set_equals_window_oracle(spark, near_index, window):
    root, toks = near_index
    queries = {
        "ab": "alpha beta",
        "abg": "alpha beta gamma",
        "a": "alpha",
        "bg": "beta gamma",
        "unknown": "alpha zzznope",
    }
    out = near_topk(spark, root, queries, window=window, k=10)
    got = {qid: set() for qid in queries}
    for r in out.collect():
        got[r["query_id"]].add(r["doc_id"])
    for qid, text in queries.items():
        want = _oracle_match(toks, spec.tokenize(text), window)
        if qid == "unknown":
            want = set()  # conjunctive retrieval: unknown term kills it
        assert got[qid] == want, (qid, window, got[qid], want)


def test_scores_equal_conjunctive_bm25(spark, near_index):
    root, _ = near_index
    queries = {"ab": "alpha beta", "bg": "beta gamma"}
    near = {
        (r["query_id"], r["doc_id"]): round(r["score"], 9)
        for r in near_topk(spark, root, queries, window=3, k=10).collect()
    }
    full = {
        (r["query_id"], r["doc_id"]): round(r["score"], 9)
        for r in bm25.topk(
            spark, root, queries, mode=spec.MODE_CONJUNCTIVE, k=10
        ).collect()
    }
    assert near  # something matched at W=3
    for key, score in near.items():
        assert full[key] == score


def test_huge_window_is_plain_conjunctive(spark, near_index):
    root, toks = near_index
    w = max(len(tk) for tk in toks.values())
    queries = {"ab": "alpha beta", "abg": "alpha beta gamma"}
    near_rows = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in near_topk(spark, root, queries, window=w, k=10).collect()
    )
    conj_rows = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in bm25.topk(
            spark, root, queries, mode=spec.MODE_CONJUNCTIVE, k=10
        ).collect()
    )
    assert near_rows == conj_rows and near_rows


def test_rank_is_dense_per_query(spark, near_index):
    root, _ = near_index
    out = near_topk(spark, root, {"a": "alpha"}, window=1, k=10).collect()
    by_rank = sorted(r["rank"] for r in out)
    assert by_rank == list(range(1, len(out) + 1))


def test_requires_sidecar(spark, index_dir):
    with pytest.raises(ValueError, match="sidecar"):
        near_topk(spark, index_dir, {"q": "anything"}, window=3, k=5).collect()


def test_bad_window_rejected(spark, near_index):
    root, _ = near_index
    with pytest.raises(ValueError, match="window"):
        near_topk(spark, root, {"q": "alpha"}, window=0)


# --- ordered span-near (plans/near.span_near_topk) --------------------------


def _ordered_match(toks_by_doc, terms, slop):
    """Greedy ordered-assignment oracle: p_1 < ... < p_n in term order,
    p_n - p_1 <= slop + n - 1."""
    n = len(terms)
    want = set()
    for d, seq in toks_by_doc.items():
        hit = False
        for i, tok in enumerate(seq):
            if tok != terms[0]:
                continue
            cur, ok = i, True
            for t in terms[1:]:
                nxt = next(
                    (
                        j
                        for j in range(cur + 1, min(len(seq), i + slop + n))
                        if seq[j] == t
                    ),
                    None,
                )
                if nxt is None:
                    ok = False
                    break
                cur = nxt
            if ok:
                hit = True
                break
        if hit:
            want.add(d)
    return want


@pytest.mark.parametrize("slop", [0, 1, 3, 10])
def test_span_near_equals_ordered_oracle(spark, near_index, slop):
    from rt_etl_yahoo_search_engine_spark.plans.near import span_near_topk

    root, toks = near_index
    queries = {
        "ab": "alpha beta",
        "ba": "beta alpha",
        "abg": "alpha beta gamma",
        "a": "alpha",
        "unknown": "alpha zzznope",
    }
    out = span_near_topk(spark, root, queries, slop=slop, k=10)
    got = {qid: set() for qid in queries}
    for r in out.collect():
        got[r["query_id"]].add(r["doc_id"])
    for qid, text in queries.items():
        want = (
            set()
            if qid == "unknown"
            else _ordered_match(toks, spec.tokenize(text), slop)
        )
        assert got[qid] == want, (qid, slop, got[qid], want)


def test_span_near_slop0_equals_phrase(spark, near_index):
    """slop=0 IS the quoted phrase: same match set as the phrase plan."""
    from rt_etl_yahoo_search_engine_spark.plans.near import span_near_topk
    from rt_etl_yahoo_search_engine_spark.plans.phrase import phrase_topk

    root, _ = near_index
    queries = {"p1": "alpha beta", "p2": "gamma gamma"}
    spans = span_near_topk(spark, root, queries, slop=0, k=10)
    phrases = phrase_topk(spark, root, queries, k=10)
    s = {(r["query_id"], r["doc_id"]) for r in spans.collect()}
    p = {(r["query_id"], r["doc_id"]) for r in phrases.collect()}
    assert s == p


@pytest.mark.parametrize("end", [1, 2, 4, 100])
def test_span_first_equals_prefix_oracle(spark, near_index, end):
    """Match set == docs whose term occurs at 0-based position < end."""
    from rt_etl_yahoo_search_engine_spark.plans.near import span_first_topk

    root, toks = near_index
    queries = {"a": "alpha", "b": "beta", "g": "gamma", "z": "zzznope"}
    out = span_first_topk(spark, root, queries, end=end, k=10)
    got = {qid: set() for qid in queries}
    for r in out.collect():
        got[r["query_id"]].add(r["doc_id"])
    for qid, text in queries.items():
        term = spec.tokenize(text)[0]
        want = {d for d, seq in toks.items() if term in seq[:end]}
        assert got[qid] == want, (qid, end, got[qid], want)


def test_span_first_scores_are_plain_bm25(spark, near_index):
    """Surviving docs keep their plain single-term BM25 scores."""
    from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
    from rt_etl_yahoo_search_engine_spark.plans.near import span_first_topk

    root, _ = near_index
    out = span_first_topk(spark, root, {"a": "alpha"}, end=100, k=10)
    base = topk(spark, root, {"a": "alpha"}, k=10)
    assert {
        (r["doc_id"], round(r["score"], 12)) for r in out.collect()
    } == {(r["doc_id"], round(r["score"], 12)) for r in base.collect()}


def test_span_first_rejects_bad_end(spark, near_index):
    from rt_etl_yahoo_search_engine_spark.plans.near import span_first_topk

    root, _ = near_index
    with pytest.raises(ValueError, match="end"):
        span_first_topk(spark, root, {"a": "alpha"}, end=0)


def test_span_first_multiterm_query_skipped(spark, near_index):
    """Multi-term inputs are not single-term spans: they return nothing
    (same contract as span_not's tokenize gate)."""
    from rt_etl_yahoo_search_engine_spark.plans.near import span_first_topk

    root, _ = near_index
    out = span_first_topk(spark, root, {"ab": "alpha beta"}, end=5, k=10)
    assert out.count() == 0
