"""Minus-term (exclusion) queries — plans/bm25.topk(exclude=) and the
serving path (plans/serve.LocalSearcher.search(exclude=)).

Exactness contract: exclusion removes docs BEFORE top-k selection, so
topk(q, exclude=e, k) row-for-row equals "full unexcluded ranking, drop
docs containing any excluded token, take first k" — surviving docs keep
bit-identical scores.  Oracle below does exactly that from the staged
tokens table.  Also covers: exclusion sharing a distinct positive-term
set with an unexcluded query, unknown minus-terms as no-ops, minus-term
== positive term emptying conjunctive queries, and serve/distributed
parity.
"""

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.plans import bm25
from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def corpus_terms(spark, index_dir):
    """Three high-df terms + one mid-df term, lifted from the lexicon so
    the test tracks the synth corpus instead of hard-coding vocabulary."""
    lex = Catalog(index_dir).read(spark, "lexicon").orderBy(F.desc("df"))
    rows = lex.select("term", "df").collect()
    assert len(rows) >= 20
    return [rows[0]["term"], rows[1]["term"], rows[2]["term"], rows[15]["term"]]


def _rows(df):
    return [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    ]


def _oracle(spark, index_dir, queries, exclude, mode, k):
    """Full unexcluded ranking -> drop docs containing an excluded token ->
    first k, re-ranked dense.  Independent of the scorer's mask path."""
    from pyspark.sql import Window

    n_docs = int(Catalog(index_dir).read_registry()["n_docs"])
    full = bm25.topk(spark, index_dir, queries, mode=mode, k=max(n_docs, 1))
    tokens = Catalog(index_dir).read(spark, "tokens")
    out = []
    for qid in queries:
        hits = full.filter(F.col("query_id") == qid)
        etoks = sorted(set(spec.tokenize(exclude.get(qid, ""))))
        if etoks:
            bad = tokens.filter(F.col("term").isin(etoks)).select("doc_id").distinct()
            hits = hits.join(bad, "doc_id", "left_anti")
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        out.extend(
            _rows(
                hits.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "rank", "doc_id", "score")
            )
        )
    return sorted(out)


@pytest.mark.parametrize("mode", [spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE])
def test_exclusion_equals_filtered_full_ranking(spark, index_dir, corpus_terms, mode):
    t0, t1, t2, mid = corpus_terms
    queries = {"q1": f"{t0} {t1}", "q2": f"{t1} {t2}"}
    exclude = {"q1": mid, "q2": t0}
    got = sorted(_rows(bm25.topk(spark, index_dir, queries, mode=mode, k=10,
                                 exclude=exclude)))
    want = _oracle(spark, index_dir, queries, exclude, mode, 10)
    assert got == want
    assert got  # exclusions left survivors


def test_exclusion_changed_the_result(spark, index_dir, corpus_terms):
    """The parametrized identity above is vacuous if exclusion removed
    nothing: check the excluded runs differ from the unexcluded ones."""
    t0, t1, _, mid = corpus_terms
    queries = {"q1": f"{t0} {t1}"}
    plain = sorted(_rows(bm25.topk(spark, index_dir, queries, k=10)))
    excl = sorted(_rows(bm25.topk(spark, index_dir, queries, k=10,
                                  exclude={"q1": mid})))
    assert plain != excl


def test_unknown_minus_term_is_noop(spark, index_dir, corpus_terms):
    t0, t1, _, _ = corpus_terms
    queries = {"q": f"{t0} {t1}"}
    plain = _rows(bm25.topk(spark, index_dir, queries, k=10))
    noop = _rows(bm25.topk(spark, index_dir, queries, k=10,
                           exclude={"q": "zzznope qqqxx"}))
    assert plain == noop and plain


def test_minus_equals_positive_empties_conjunctive(spark, index_dir, corpus_terms):
    t0, t1, _, _ = corpus_terms
    out = bm25.topk(
        spark, index_dir, {"q": f"{t0} {t1}"}, mode=spec.MODE_CONJUNCTIVE,
        k=10, exclude={"q": t0},
    )
    assert out.collect() == []


def test_shared_positive_set_distinct_exclusions(spark, index_dir, corpus_terms):
    """Two queries with the SAME positive terms but different minus-terms
    must not collapse into one distinct set (regression: set key must
    include the exclusion tuple)."""
    t0, t1, _, mid = corpus_terms
    queries = {"plain": f"{t0} {t1}", "minus": f"{t0} {t1}"}
    out = bm25.topk(spark, index_dir, queries, k=10, exclude={"minus": mid})
    got = {qid: [] for qid in queries}
    for r in out.collect():
        got[r["query_id"]].append((r["rank"], r["doc_id"], round(r["score"], 9)))
    want_plain = [
        (r[1], r[2], r[3])
        for r in sorted(_rows(bm25.topk(spark, index_dir, {"plain": f"{t0} {t1}"}, k=10)))
    ]
    want_minus = [
        (r[1], r[2], r[3])
        for r in _oracle(spark, index_dir, {"minus": f"{t0} {t1}"},
                         {"minus": mid}, spec.MODE_DISJUNCTIVE, 10)
    ]
    assert sorted(got["plain"]) == sorted(want_plain)
    assert sorted(got["minus"]) == sorted(want_minus)
    assert got["plain"] != got["minus"]


def test_serve_matches_distributed(spark, index_dir, corpus_terms):
    t0, t1, _, mid = corpus_terms
    queries = {"q1": f"{t0} {t1}", "q2": f"{t1} {mid}"}
    exclude = {"q1": mid}
    dist = sorted(_rows(bm25.topk(spark, index_dir, queries, k=10,
                                  exclude=exclude)))
    searcher = LocalSearcher(index_dir)
    pdf = searcher.search_batch(queries, k=10, exclude=exclude)
    serve = sorted(
        (r.query_id, int(r.rank), int(r.doc_id), round(float(r.score), 9))
        for r in pdf.itertuples()
    )
    assert serve == dist and serve
