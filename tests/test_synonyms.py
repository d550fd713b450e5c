"""Query-time synonym expansion (plans/synonyms.py) vs a pure-Python
Lucene-SynonymQuery oracle, plus the no-synonyms reduction identity."""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
from rt_etl_yahoo_search_engine_spark.plans.synonyms import synonym_topk
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("d0", "tv news tonight"),
    ("d1", "television schedule television news"),
    ("d2", "telly listings and news"),
    ("d3", "radio schedule"),
    ("d4", "tv television telly"),
    ("d5", "sports schedule update"),
]
TOKS = {u: t.split() for u, t in DOCS}
SYNONYMS = {"tv": ["television", "telly"]}
QUERIES = {"q1": "tv schedule", "q2": "news"}


def _oracle():
    n_docs = len(DOCS)
    avgdl = sum(len(t) for t in TOKS.values()) / n_docs
    df = {}
    for seq in TOKS.values():
        for t in set(seq):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, text in QUERIES.items():
        clauses = [
            sorted({t, *SYNONYMS.get(t, [])})
            for t in sorted(set(spec.tokenize(text)))
        ]
        for u, seq in TOKS.items():
            s = 0.0
            hit = False
            for group in clauses:
                present = [m for m in group if m in df]
                if not present:
                    continue
                tf_sum = sum(seq.count(m) for m in present)
                if tf_sum == 0:
                    continue
                hit = True
                c_idf = min(spec.idf(n_docs, df[m]) for m in present)
                dl = len(seq)
                s += c_idf * (
                    tf_sum * (spec.K1 + 1.0)
                    / (tf_sum + spec.K1 * (1.0 - spec.B + spec.B * dl / avgdl))
                )
            if hit:
                out[(qid, u)] = s
    return out


@pytest.fixture(scope="module")
def syn_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t in DOCS], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("syn") / "idx")
    build_index(spark, df, root, n_shards=3, n_buckets=4, tokenizer="text")
    docmap = {
        r["doc_id"]: r["url"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


def test_synonym_scores_match_lucene_blend_oracle(spark, syn_index):
    root, docmap = syn_index
    got = {
        (r["query_id"], docmap[r["doc_id"]]): r["score"]
        for r in synonym_topk(spark, root, QUERIES, SYNONYMS, k=10).collect()
    }
    want = _oracle()
    assert set(got) == set(want)
    for key, s in want.items():
        assert got[key] == pytest.approx(s, abs=1e-12)


def test_blend_pools_tf_and_takes_max_df(spark, syn_index):
    """d4 has tf=1 of each spelling: pooled tf_clause=3 under one clause
    — strictly better than any single spelling's weight, but ONE clause,
    not three summed clauses."""
    root, docmap = syn_index
    out = {
        docmap[r["doc_id"]]: r["score"]
        for r in synonym_topk(
            spark, root, {"q": "tv"}, SYNONYMS, k=10
        ).collect()
    }
    assert set(out) == {"d0", "d1", "d2", "d4"}     # any spelling matches
    assert out["d4"] == max(out.values())           # pooled tf wins


def test_no_synonyms_reduces_to_disjunctive_bm25(spark, syn_index):
    root, _ = syn_index
    a = synonym_topk(spark, root, QUERIES, {}, k=10)
    b = topk(spark, root, QUERIES, k=10, mode=spec.MODE_DISJUNCTIVE)
    assert sorted(map(tuple, a.collect())) == sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in b.collect()
    )


def test_all_absent_clause_matches_nothing(spark, syn_index):
    root, _ = syn_index
    assert synonym_topk(
        spark, root, {"q": "zzznope"}, {"zzznope": ["qqqnada"]}
    ).count() == 0
