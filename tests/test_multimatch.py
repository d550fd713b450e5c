"""multi_match (plans/multimatch): best_fields / most_fields /
cross_fields over two per-field indexes built from the same corpus.

Checked invariants:
  * single-field best_fields is rank- and score-identical to plain BM25
    top-k on that field's index;
  * tie_breaker=1.0 best_fields == most_fields (the dis_max combine's
    sum limit);
  * single-field cross_fields is score-identical to plain disjunctive
    BM25 (df_blend over one field is that field's own df);
  * two-field best_fields and cross_fields match an exhaustive pure-
    python reference on a handcrafted corpus (boosts and tie_breaker
    exercised);
  * conjunctive cross_fields keeps exactly the docs holding every query
    term in at least one field.
"""

import math

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
from rt_etl_yahoo_search_engine_spark.plans.multimatch import multi_match_topk
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    "spark joins shuffle data across executors",
    "broadcast joins avoid the shuffle entirely",
    "window functions rank rows within partitions",
    "the optimizer prunes partitions and pushes filters",
    "columnar parquet scans read only needed columns",
    "hash aggregation combines map side partials",
    "skewed keys salt the shuffle for balance",
    "sort merge joins handle the largest tables",
    "adaptive execution replans shuffles at runtime",
    "vectorized readers decode parquet in batches",
    "joins joins joins everywhere in this plan",
    "filters filters prune the scan early",
]
TITLE_K = 4  # title field = first 4 tokens of the text


def _title(text: str) -> str:
    return " ".join(spec.tokenize(text)[:TITLE_K])


QUERIES = {
    "q1": "shuffle joins",
    "q2": "parquet scans",
    "q3": "window rank",
    "q4": "joins filters prune",
}


@pytest.fixture(scope="module")
def field_roots(tmp_path_factory, spark):
    roots = {}
    for field, textfn in (("body", lambda t: t), ("title", _title)):
        rows = [
            (f"{i:06d}", textfn(t), "en") for i, t in enumerate(DOCS)
        ]
        df = spark.createDataFrame(rows, "url string, text string, lang string")
        root = str(tmp_path_factory.mktemp("mm") / f"idx_{field}")
        build_index(spark, df, root, n_shards=2, n_buckets=2,
                    tokenizer="text")
        roots[field] = root
    return roots


@pytest.fixture(scope="module")
def docmap(spark, field_roots):
    cat = Catalog(field_roots["body"])
    rows = cat.read(spark, "docmap").select("doc_id", "url").collect()
    return {int(r["doc_id"]): int(r["url"]) for r in rows}


def _py_field_stats(texts):
    toks = [spec.tokenize(t) for t in texts]
    n = len([t for t in toks if t])
    dl = [len(t) for t in toks]
    avgdl = sum(dl) / n
    df = {}
    for t in toks:
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    return toks, dl, avgdl, df


def _py_tfnorm(tf, dl, avgdl):
    return tf * (spec.K1 + 1.0) / (tf + spec.K1 * (1.0 - spec.B + spec.B * dl / avgdl))


def _py_multi_match(match_type, boosts, tie_breaker):
    """Exhaustive reference over DOCS: {qid: {orig_id: score}}."""
    fields = {
        "body": _py_field_stats(DOCS),
        "title": _py_field_stats([_title(t) for t in DOCS]),
    }
    n_docs = len(DOCS)
    out = {}
    for qid, qtext in QUERIES.items():
        terms = sorted(set(spec.tokenize(qtext)))
        scores = {}
        if match_type in ("best_fields", "most_fields"):
            per_field = {}
            for f, (toks, dl, avgdl, df) in fields.items():
                bf = boosts.get(f, 1.0)
                for i, tk in enumerate(toks):
                    s = 0.0
                    for term in terms:
                        tf = tk.count(term)
                        if tf and term in df:
                            s += spec.idf(n_docs, df[term]) * _py_tfnorm(
                                tf, dl[i], avgdl)
                    if s > 0:
                        per_field.setdefault(i, []).append(bf * s)
            for i, ws in per_field.items():
                if match_type == "most_fields":
                    scores[i] = sum(ws)
                else:
                    mx = max(ws)
                    scores[i] = mx + tie_breaker * (sum(ws) - mx)
        else:  # cross_fields
            df_blend = {}
            for term in terms:
                d = max(fields[f][3].get(term, 0) for f in fields)
                if d:
                    df_blend[term] = d
            for i in range(n_docs):
                s = 0.0
                matched = 0
                for term, d in df_blend.items():
                    ws = []
                    for f, (toks, dl, avgdl, _df) in fields.items():
                        tf = toks[i].count(term)
                        if tf:
                            ws.append(
                                boosts.get(f, 1.0)
                                * spec.idf(n_docs, d)
                                * _py_tfnorm(tf, dl[i], avgdl)
                            )
                    if ws:
                        matched += 1
                        mx = max(ws)
                        s += mx + tie_breaker * (sum(ws) - mx)
                if matched:
                    scores[i] = s
        out[qid] = scores
    return out


def _collect(df, docmap):
    return {
        (r["query_id"], docmap[int(r["doc_id"])]): r["score"]
        for r in df.collect()
    }


def test_single_field_best_equals_bm25(spark, field_roots, docmap):
    mm = multi_match_topk(
        spark, {"body": field_roots["body"]}, QUERIES, "best_fields", k=10
    )
    plain = topk(spark, field_roots["body"], QUERIES,
                 mode=spec.MODE_DISJUNCTIVE, k=10)
    a = _collect(mm, docmap)
    b = _collect(plain.select("query_id", "doc_id", "score"), docmap)
    assert set(a) == set(b)
    for key in a:
        assert a[key] == pytest.approx(b[key], abs=1e-12)


def test_tie_breaker_one_is_most_fields(spark, field_roots, docmap):
    best = multi_match_topk(
        spark, field_roots, QUERIES, "best_fields", tie_breaker=1.0, k=12
    )
    most = multi_match_topk(spark, field_roots, QUERIES, "most_fields", k=12)
    a, b = _collect(best, docmap), _collect(most, docmap)
    assert set(a) == set(b)
    for key in a:
        assert a[key] == pytest.approx(b[key], abs=1e-9)


def test_single_field_cross_equals_disjunctive(spark, field_roots, docmap):
    mm = multi_match_topk(
        spark, {"body": field_roots["body"]}, QUERIES, "cross_fields", k=10
    )
    plain = topk(spark, field_roots["body"], QUERIES,
                 mode=spec.MODE_DISJUNCTIVE, k=10)
    a = _collect(mm, docmap)
    b = _collect(plain.select("query_id", "doc_id", "score"), docmap)
    assert set(a) == set(b)
    for key in a:
        assert a[key] == pytest.approx(b[key], abs=1e-9)


@pytest.mark.parametrize("match_type,boosts,tb", [
    ("best_fields", {"title": 2.0, "body": 1.0}, 0.3),
    ("most_fields", {"title": 1.0, "body": 1.0}, 0.0),
    ("cross_fields", {"title": 1.5, "body": 1.0}, 0.25),
])
def test_matches_python_reference(spark, field_roots, docmap,
                                  match_type, boosts, tb):
    mm = multi_match_topk(
        spark, field_roots, QUERIES, match_type,
        boosts=boosts, tie_breaker=tb, k=len(DOCS)
    )
    got = _collect(mm, docmap)
    want = _py_multi_match(match_type, boosts, tb)
    flat = {
        (qid, i): s for qid, sc in want.items() for i, s in sc.items()
    }
    assert set(got) == set(flat)
    for key in got:
        assert got[key] == pytest.approx(flat[key], abs=1e-9), key


def test_conjunctive_cross_fields(spark, field_roots, docmap):
    mm = multi_match_topk(
        spark, field_roots, QUERIES, "cross_fields",
        mode=spec.MODE_CONJUNCTIVE, k=len(DOCS)
    )
    got = _collect(mm, docmap)
    for qid, qtext in QUERIES.items():
        terms = set(spec.tokenize(qtext))
        for i, text in enumerate(DOCS):
            both = set(spec.tokenize(text)) | set(spec.tokenize(_title(text)))
            if terms <= both:
                assert (qid, i) in got, (qid, i)
            else:
                assert (qid, i) not in got, (qid, i)


def _py_combined(weights):
    """Reference for combined_fields: weighted tf/dl sums, blended df."""
    fields = {
        "body": _py_field_stats(DOCS),
        "title": _py_field_stats([_title(t) for t in DOCS]),
    }
    n_docs = len(DOCS)
    avgdl_c = sum(
        weights[f] * fields[f][2] for f in sorted(fields)
    )
    out = {}
    for qid, qtext in QUERIES.items():
        terms = sorted(set(spec.tokenize(qtext)))
        scores = {}
        for i in range(n_docs):
            dl_c = sum(
                weights[f] * fields[f][1][i] for f in sorted(fields)
            )
            s, matched = 0.0, 0
            for term in terms:
                df_c = max(fields[f][3].get(term, 0) for f in fields)
                if not df_c:
                    continue
                tf_c = sum(
                    weights[f] * fields[f][0][i].count(term)
                    for f in sorted(fields)
                )
                if tf_c <= 0:
                    continue
                matched += 1
                s += spec.idf(n_docs, df_c) * (
                    tf_c * (spec.K1 + 1.0)
                    / (tf_c + spec.K1 * (1.0 - spec.B
                                         + spec.B * dl_c / avgdl_c))
                )
            if matched:
                scores[i] = (s, matched)
        out[qid] = scores
    return out


def test_combined_fields_single_field_is_bm25(spark, field_roots, docmap):
    from rt_etl_yahoo_search_engine_spark.plans.multimatch import (
        combined_fields_topk,
    )

    mm = combined_fields_topk(
        spark, {"body": field_roots["body"]}, QUERIES, k=len(DOCS)
    )
    plain = topk(spark, field_roots["body"], QUERIES,
                 mode=spec.MODE_DISJUNCTIVE, k=len(DOCS))
    a = _collect(mm, docmap)
    b = _collect(plain.select("query_id", "doc_id", "score"), docmap)
    assert set(a) == set(b)
    for key in a:
        assert a[key] == pytest.approx(b[key], abs=1e-9)


def test_combined_fields_matches_python(spark, field_roots, docmap):
    from rt_etl_yahoo_search_engine_spark.plans.multimatch import (
        combined_fields_topk,
    )

    weights = {"title": 2.0, "body": 1.0}
    mm = combined_fields_topk(
        spark, field_roots, QUERIES, weights=weights, k=len(DOCS)
    )
    got = _collect(mm, docmap)
    want = _py_combined(weights)
    flat = {(q, i): s for q, sc in want.items() for i, (s, _m) in sc.items()}
    assert set(got) == set(flat)
    for key in got:
        assert got[key] == pytest.approx(flat[key], abs=1e-9), key


def test_combined_fields_conjunctive(spark, field_roots, docmap):
    from rt_etl_yahoo_search_engine_spark.plans.multimatch import (
        combined_fields_topk,
    )

    weights = {"title": 1.0, "body": 1.0}
    mm = combined_fields_topk(
        spark, field_roots, QUERIES, weights=weights,
        mode=spec.MODE_CONJUNCTIVE, k=len(DOCS)
    )
    got = _collect(mm, docmap)
    want = _py_combined(weights)
    for qid, qtext in QUERIES.items():
        n_terms = len(set(spec.tokenize(qtext)))
        keep = {
            (qid, i) for i, (_s, m) in want[qid].items() if m == n_terms
        }
        assert {k for k in got if k[0] == qid} == keep
