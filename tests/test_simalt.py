"""Alternative similarities (plans/simalt.alt_topk) — rank identity vs a
from-scratch Python scorer over the shared index's own corpus, for both
the LM-Dirichlet and classic TF-IDF contracts (module docstring), plus
the per-term clamp edge case."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.functions.extract import page_text_df
from rt_etl_yahoo_search_engine_spark.plans.simalt import alt_topk
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def corpus_stats(spark, corpus_dir):
    pages = spark.read.parquet(corpus_dir).filter("lang = 'en'")  # indexed slice
    texts = {r["url"]: r["text"] for r in page_text_df(pages).collect()}
    toks = {u: re.findall(r"[a-z0-9]+", t.lower()) for u, t in texts.items()}
    df, cf = Counter(), Counter()
    for ts in toks.values():
        cf.update(ts)
        df.update(set(ts))
    total = sum(len(ts) for ts in toks.values())
    return toks, df, cf, total


def _py_alt_topk(corpus, queries, sim, k=10, mu=2000.0):
    toks, df, cf, total = corpus
    n = len(toks)
    out = {}
    for qid, text in queries.items():
        terms = sorted(set(spec.tokenize(text)))
        scores = {}
        for url, ts in toks.items():
            c = Counter(ts)
            dl = len(ts)
            s, matched = 0.0, False
            for t in terms:
                if c.get(t, 0) == 0 or df.get(t, 0) == 0:
                    continue
                matched = True
                if sim == "dirichlet":
                    w = math.log(1 + c[t] / (mu * (cf[t] / total)))
                    w += math.log(mu / (dl + mu))
                    w = max(0.0, w)
                else:
                    idf_c = 1 + math.log(n / (df[t] + 1.0))
                    w = math.sqrt(c[t]) * idf_c * idf_c / math.sqrt(dl)
                s += w
            if matched:
                scores[url] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = ranked
    return out


@pytest.mark.parametrize("sim", ["dirichlet", "tfidf"])
def test_rank_identity_vs_python(spark, index_dir, corpus_stats, sim):
    lex = Catalog(index_dir).read(spark, "lexicon").orderBy(F.desc("df"))
    t = [r["term"] for r in lex.select("term").limit(4).collect()]
    queries = {"q1": f"{t[0]} {t[1]}", "q2": f"{t[2]} {t[3]} {t[0]}"}
    got_rows = alt_topk(spark, index_dir, queries, similarity=sim, k=10)
    dm = spark.read.parquet(f"{index_dir}/docmap").select("doc_id", "url")
    got = {}
    for r in got_rows.join(dm, "doc_id").collect():
        got.setdefault(r.query_id, []).append((r.rank, r.url, r.score))
    want = _py_alt_topk(corpus_stats, queries, sim)
    for qid in queries:
        g = sorted(got[qid])
        w = want[qid]
        assert [u for _, u, _ in g] == [u for u, _ in w], (sim, qid)
        for (_, _, gs), (_, ws) in zip(g, w):
            assert abs(gs - ws) < 1e-9, (sim, qid, gs, ws)


def test_dirichlet_clamp_keeps_scores_nonnegative(spark, index_dir):
    lex = Catalog(index_dir).read(spark, "lexicon").orderBy(F.desc("df"))
    t = [r["term"] for r in lex.select("term").limit(2).collect()]
    rows = alt_topk(
        spark, index_dir, {"q": f"{t[0]} {t[1]}"}, similarity="dirichlet"
    ).collect()
    assert rows
    assert all(r.score >= 0.0 for r in rows)


def test_unknown_similarity_raises(spark, index_dir):
    with pytest.raises(ValueError):
        alt_topk(spark, index_dir, {"q": "x"}, similarity="bm42")


@pytest.mark.parametrize("sim", ["dirichlet", "tfidf"])
def test_serve_alt_matches_distributed(spark, index_dir, sim):
    """LocalSearcher.search_alt is rank- and float-identical to the
    distributed alt_topk (same accumulation order, same expressions)."""
    from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher

    lex = Catalog(index_dir).read(spark, "lexicon").orderBy(F.desc("df"))
    t = [r["term"] for r in lex.select("term").limit(3).collect()]
    queries = {"q1": f"{t[0]} {t[1]}", "q2": f"{t[2]} {t[0]}"}
    dist = {}
    for r in alt_topk(spark, index_dir, queries, similarity=sim, k=10).collect():
        dist.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    srv = LocalSearcher(index_dir)
    for qid, text in queries.items():
        got = srv.search_alt(text, similarity=sim, k=10)
        assert got == sorted(dist[qid]), (sim, qid)
