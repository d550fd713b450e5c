"""Result-set statistics (plans/stats.py): exact hit counts and facet
counts over the FULL match set, checked against a pure-Python oracle."""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.stats import (
    facet_counts,
    match_counts,
    match_docs,
)
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("d0", "alpha beta gamma", "web"),
    ("d1", "alpha beta", "web"),
    ("d2", "alpha delta", "wiki"),
    ("d3", "beta delta epsilon", "wiki"),
    ("d4", "gamma gamma epsilon", "news"),
    ("d5", "alpha beta gamma delta", "news"),
]
TOKS = {u: t.split() for u, t, _ in DOCS}
SRC = {u: s for u, _, s in DOCS}

QUERIES = {
    "q1": "alpha beta",
    "q2": "gamma",
    "q3": "delta epsilon",
    "q4": "zzznope",          # out of vocab: no row in either mode
    "q5": "alpha zzznope",    # conjunctive: impossible -> no row
}


def _want_counts(mode):
    out = {}
    for qid, text in QUERIES.items():
        toks = set(text.split())
        if mode == spec.MODE_CONJUNCTIVE:
            hits = {u for u, seq in TOKS.items() if toks <= set(seq)}
        else:
            hits = {u for u, seq in TOKS.items() if toks & set(seq)}
        if qid in ("q4",) or (mode == spec.MODE_CONJUNCTIVE and qid == "q5"):
            hits = set()
        elif qid == "q5" and mode == spec.MODE_DISJUNCTIVE:
            hits = {u for u, seq in TOKS.items() if "alpha" in seq}
        if hits:
            out[qid] = hits
    return out


@pytest.fixture(scope="module")
def stats_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t, _ in DOCS], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("stats") / "idx")
    build_index(spark, df, root, n_shards=3, n_buckets=4, tokenizer="text")
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


@pytest.mark.parametrize(
    "mode", [spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE]
)
def test_match_counts(spark, stats_index, mode):
    root, _ = stats_index
    got = {
        r["query_id"]: r["n_hits"]
        for r in match_counts(spark, root, QUERIES, mode=mode).collect()
    }
    want = {qid: len(hits) for qid, hits in _want_counts(mode).items()}
    assert got == want


@pytest.mark.parametrize(
    "mode", [spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE]
)
def test_match_docs_relation(spark, stats_index, mode):
    root, docmap = stats_index
    got = {
        (r["query_id"], r["doc_id"])
        for r in match_docs(spark, root, QUERIES, mode=mode).collect()
    }
    want = {
        (qid, docmap[u])
        for qid, hits in _want_counts(mode).items()
        for u in hits
    }
    assert got == want


def test_facet_counts(spark, stats_index):
    root, docmap = stats_index
    facets = spark.createDataFrame(
        [(docmap[u], SRC[u]) for u in TOKS], "doc_id long, source string"
    )
    got = {
        (r["query_id"], r["facet"]): r["n_hits"]
        for r in facet_counts(
            spark, root, QUERIES, facets, "source"
        ).collect()
    }
    want = {}
    for qid, hits in _want_counts(spec.MODE_DISJUNCTIVE).items():
        for u in hits:
            want[(qid, SRC[u])] = want.get((qid, SRC[u]), 0) + 1
    assert got == want


def test_facet_stats(spark, stats_index):
    from rt_etl_yahoo_search_engine_spark.plans.stats import facet_stats

    root, docmap = stats_index
    nchars = {u: len(t) for u, t, _ in DOCS}
    attrs = spark.createDataFrame(
        [(docmap[u], nchars[u], SRC[u]) for u in TOKS],
        "doc_id long, n_chars long, source string",
    )
    # bucketed by facet
    got = {
        (r["query_id"], r["source"]): (
            r["n"], r["min_v"], r["max_v"], r["sum_v"], r["avg_v"]
        )
        for r in facet_stats(
            spark, root, QUERIES, attrs, "n_chars", "source"
        ).collect()
    }
    want = {}
    for qid, hits in _want_counts(spec.MODE_DISJUNCTIVE).items():
        for u in hits:
            want.setdefault((qid, SRC[u]), []).append(nchars[u])
    assert got == {
        k: (len(v), min(v), max(v), sum(v), sum(v) / len(v))
        for k, v in want.items()
    }
    # unbucketed (one stats row per query)
    got1 = {
        r["query_id"]: (r["n"], r["min_v"], r["max_v"])
        for r in facet_stats(
            spark, root, QUERIES, attrs, "n_chars"
        ).collect()
    }
    for qid, hits in _want_counts(spec.MODE_DISJUNCTIVE).items():
        vals = [nchars[u] for u in hits]
        assert got1[qid] == (len(vals), min(vals), max(vals))


def test_counts_consistent_with_match_docs(spark, stats_index):
    root, _ = stats_index
    n = {
        r["query_id"]: r["n_hits"]
        for r in match_counts(spark, root, QUERIES).collect()
    }
    pairs = match_docs(spark, root, QUERIES).groupBy("query_id").count()
    assert {r["query_id"]: r["count"] for r in pairs.collect()} == n


def test_empty_query_batch(spark, stats_index):
    root, _ = stats_index
    assert match_counts(spark, root, {"q": "zzznope"}).count() == 0
    assert match_docs(spark, root, {}).count() == 0


def test_score_docs_with_matched(spark, stats_index):
    from rt_etl_yahoo_search_engine_spark.plans.stats import score_docs

    root, docmap = stats_index
    url_of = {v: k for k, v in docmap.items()}
    rel = score_docs(spark, root, QUERIES, with_matched=True)
    assert rel.columns == ["query_id", "doc_id", "score", "n_matched"]
    got = {
        (r["query_id"], url_of[r["doc_id"]]): r["n_matched"]
        for r in rel.collect()
    }
    want = {}
    for qid, hits in _want_counts(spec.MODE_DISJUNCTIVE).items():
        toks = set(QUERIES[qid].split())
        for u in hits:
            want[(qid, u)] = len(toks & set(TOKS[u]))
    assert got == want
    # conjunctive: n_matched is constant = clause count
    relc = score_docs(
        spark, root, QUERIES, spec.MODE_CONJUNCTIVE, with_matched=True
    )
    for r in relc.collect():
        assert r["n_matched"] == len(set(QUERIES[r["query_id"]].split()))


def test_range_counts(spark, stats_index):
    from rt_etl_yahoo_search_engine_spark.plans.stats import range_counts

    root, docmap = stats_index
    nchars = {u: len(t) for u, t, _ in DOCS}
    attrs = spark.createDataFrame(
        [(docmap[u], nchars[u]) for u in TOKS], "doc_id long, n_chars long"
    )
    bounds = [12, 18]
    out = range_counts(spark, root, QUERIES, attrs, "n_chars", bounds)
    got = {
        (r["query_id"], r["bucket_idx"], r["bucket"]): r["n_hits"]
        for r in out.collect()
    }
    labels = ["*-12.0", "12.0-18.0", "18.0-*"]
    want = {}
    for qid, hits in _want_counts(spec.MODE_DISJUNCTIVE).items():
        for u in hits:
            i = sum(nchars[u] >= b for b in bounds)
            key = (qid, i, labels[i])
            want[key] = want.get(key, 0) + 1
    assert got == want


def test_percentiles_agg(spark, stats_index):
    from rt_etl_yahoo_search_engine_spark.plans.stats import percentiles_agg

    root, docmap = stats_index
    nchars = {u: len(t) for u, t, _ in DOCS}
    attrs = spark.createDataFrame(
        [(docmap[u], nchars[u]) for u in TOKS], "doc_id long, n_chars long"
    )
    out = percentiles_agg(
        spark, root, QUERIES, attrs, "n_chars", [0.25, 0.5, 0.75]
    )
    assert out.columns == ["query_id", "p25", "p50", "p75"]

    def pct(vals, q):  # linear interpolation at q*(n-1)
        vals = sorted(vals)
        pos = q * (len(vals) - 1)
        lo, hi = int(pos), min(int(pos) + 1, len(vals) - 1)
        return vals[lo] + (pos - lo) * (vals[hi] - vals[lo])

    got = {r["query_id"]: (r["p25"], r["p50"], r["p75"]) for r in out.collect()}
    for qid, hits in _want_counts(spec.MODE_DISJUNCTIVE).items():
        vals = [nchars[u] for u in hits]
        for g, q in zip(got[qid], [0.25, 0.5, 0.75]):
            assert g == pytest.approx(pct(vals, q), abs=1e-9)


def test_histogram_counts(spark, stats_index):
    from rt_etl_yahoo_search_engine_spark.plans.stats import histogram_counts

    root, docmap = stats_index
    nchars = {u: len(t) for u, t, _ in DOCS}
    attrs = spark.createDataFrame(
        [(docmap[u], nchars[u]) for u in TOKS], "doc_id long, n_chars long"
    )
    out = histogram_counts(
        spark, root, QUERIES, attrs, "n_chars", interval=5.0
    )
    got = {
        (r["query_id"], r["bucket_key"]): r["n_hits"] for r in out.collect()
    }
    want = {}
    for qid, hits in _want_counts(spec.MODE_DISJUNCTIVE).items():
        for u in hits:
            key = (qid, (nchars[u] // 5) * 5.0)
            want[key] = want.get(key, 0) + 1
    assert got == want
    # offset shifts the grid: key = floor((v-2)/5)*5 + 2
    out2 = histogram_counts(
        spark, root, QUERIES, attrs, "n_chars", interval=5.0, offset=2.0
    )
    for r in out2.collect():
        assert (r["bucket_key"] - 2.0) % 5.0 == 0.0


def test_cardinality_agg(spark, stats_index):
    from rt_etl_yahoo_search_engine_spark.plans.stats import cardinality_agg

    root, docmap = stats_index
    attrs = spark.createDataFrame(
        [(docmap[u], SRC[u]) for u in TOKS], "doc_id long, source string"
    )
    got = {
        r["query_id"]: r["cardinality"]
        for r in cardinality_agg(
            spark, root, QUERIES, attrs, "source"
        ).collect()
    }
    want = {
        qid: len({SRC[u] for u in hits})
        for qid, hits in _want_counts(spec.MODE_DISJUNCTIVE).items()
    }
    assert got == want
    # the 100 TB knob: HLL++ estimate within rsd on this tiny set
    approx = {
        r["query_id"]: r["cardinality"]
        for r in cardinality_agg(
            spark, root, QUERIES, attrs, "source", exact=False, rsd=0.01
        ).collect()
    }
    assert approx == want
