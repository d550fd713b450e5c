"""Function scoring (plans/funcscore), bucketed top-hits
(plans/collapse.grouped_top_hits) and regexp queries
(plans/wildcard.regexp_topk), each against a pure-Python recompute."""

import math
import re

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.collapse import grouped_top_hits
from rt_etl_yahoo_search_engine_spark.plans.funcscore import (
    function_score_topk,
)
from rt_etl_yahoo_search_engine_spark.plans.wildcard import (
    expand_regexp,
    regexp_topk,
    wildcard_topk,
)
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("d0", "alpha beta gamma", "s1"),
    ("d1", "alpha beta", "s1"),
    ("d2", "alpha delta", "s2"),
    ("d3", "beta delta epsilon", "s2"),
    ("d4", "gamma gamma epsilon", "s3"),
    ("d5", "alpha beta gamma delta", "s3"),
    ("d6", "alpha alpha beta beta", "s1"),
    ("d7", "delta epsilon epsilon", "s2"),
]
TOKS = {u: t.split() for u, t, _ in DOCS}
SRC = {u: s for u, _, s in DOCS}
NCH = {u: len(t) for u, t, _ in DOCS}
QUERIES = {"q1": "alpha beta", "q2": "gamma epsilon", "q3": "delta"}
VOCAB = sorted({t for seq in TOKS.values() for t in seq})


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
def fs_index(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t, _ in DOCS],
        "url string, text string, lang string",
    )
    root = str(tmp_path_factory.mktemp("fsc") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


@pytest.mark.parametrize("boost_mode", ["multiply", "sum"])
def test_function_score_reranks(spark, fs_index, boost_mode):
    """Combined order == python (bm25 ∘ factor); the factor is chosen to
    INVERT the pure-relevance order so the test can't pass by accident."""
    root, docmap = fs_index
    rev = {d: u for u, d in docmap.items()}
    fac = {u: 1.0 / (1.0 + NCH[u]) for u in TOKS}  # short docs boosted
    factors = spark.createDataFrame(
        [(docmap[u], f) for u, f in fac.items()], "doc_id long, f double"
    )
    out = function_score_topk(
        spark, root, QUERIES, factors, k=4, boost_mode=boost_mode
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], rev[r["doc_id"]], r["score"])
        )
    for qid, hits in _python_scores().items():
        comb = {
            u: (s * fac[u] if boost_mode == "multiply" else s + fac[u])
            for u, s in hits.items()
        }
        ranked = sorted(comb.items(), key=lambda p: (-p[1], docmap[p[0]]))[:4]
        want = [(i + 1, u) for i, (u, _) in enumerate(ranked)]
        assert [(rk, u) for rk, u, _ in got.get(qid, [])] == want
        for (_, u, s_got), (_, s_want) in zip(got[qid], ranked):
            assert s_got == pytest.approx(s_want, rel=1e-12)


def test_function_score_missing_default(spark, fs_index):
    """Docs absent from the factor table take `missing` (here 0.0 under
    multiply -> they sink to the bottom but keep competing)."""
    root, docmap = fs_index
    rev = {d: u for u, d in docmap.items()}
    factors = spark.createDataFrame(
        [(docmap["d5"], 100.0)], "doc_id long, f double"
    )
    out = function_score_topk(
        spark, root, {"q1": "alpha"}, factors, k=3, missing=0.0
    )
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert rev[rows[0]["doc_id"]] == "d5" and rows[0]["score"] > 0.0
    assert all(r["score"] == 0.0 for r in rows[1:])


def test_function_score_bad_boost_mode(spark, fs_index):
    root, _ = fs_index
    factors = spark.createDataFrame([(0, 1.0)], "doc_id long, f double")
    with pytest.raises(ValueError, match="boost_mode"):
        function_score_topk(
            spark, root, QUERIES, factors, boost_mode="replace"
        )


def test_grouped_top_hits(spark, fs_index):
    """Bucket order, per-bucket hit order, and both caps match python."""
    root, docmap = fs_index
    rev = {d: u for u, d in docmap.items()}
    group = spark.createDataFrame(
        [(docmap[u], SRC[u]) for u in TOKS], "doc_id long, source string"
    )
    out = grouped_top_hits(
        spark, root, QUERIES, group, k_groups=2, per_group=2
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["group_rank"], r["key"], r["hit_rank"], rev[r["doc_id"]])
        )
    for qid, hits in _python_scores().items():
        per = {}
        for u, s in hits.items():
            per.setdefault(SRC[u], []).append((u, s))
        for key in per:
            per[key] = sorted(
                per[key], key=lambda p: (-p[1], docmap[p[0]])
            )[:2]
        buckets = sorted(
            per.items(),
            key=lambda kv: (-kv[1][0][1], docmap[kv[1][0][0]]),
        )[:2]
        want = sorted(
            (gr + 1, key, hr + 1, u)
            for gr, (key, us) in enumerate(buckets)
            for hr, (u, _) in enumerate(us)
        )
        assert sorted(got.get(qid, [])) == want


@pytest.mark.parametrize(
    "pat",
    [
        "al[a-z]+a",          # literal prefix + class
        "(beta|gamma)",       # alternation, prefix-free
        "[a-z]*ta",           # leading metachar (vocab scan path)
        "delta",              # pure literal
        "ep.il.n",            # dots
        "zz+",                # matches nothing
        "alpha?",             # quantifier cancels last prefix char
    ],
)
def test_expand_regexp_matches_python(spark, fs_index, pat):
    root, _ = fs_index
    cat = Catalog(root)
    rx = re.compile(pat)
    want = sorted(t for t in VOCAB if rx.fullmatch(t))
    assert expand_regexp(cat, cat.read_registry(), pat) == want


def test_expand_regexp_cap_keeps_highest_df(spark, fs_index):
    root, _ = fs_index
    cat = Catalog(root)
    df = {}
    for seq in TOKS.values():
        for t in set(seq):
            df[t] = df.get(t, 0) + 1
    full = sorted(t for t in VOCAB if re.fullmatch("[a-z]*a", t))
    capped = expand_regexp(cat, cat.read_registry(), "[a-z]*a", max_expand=2)
    want = sorted(sorted(full, key=lambda t: (-df[t], t))[:2])
    assert capped == want and len(full) > 2


def test_regexp_topk_equals_wildcard_on_equivalent_pattern(spark, fs_index):
    """`al.*` (regex) and `al*` (glob) expand identically, so the ranked
    lists are identical — score identity via the shared bm25.topk path."""
    root, _ = fs_index
    rx = regexp_topk(spark, root, {"q": "al.*"}, k=10).collect()
    wc = wildcard_topk(spark, root, {"q": "al*"}, k=10).collect()
    key = lambda r: (r["rank"], r["doc_id"], r["score"])
    assert sorted(map(key, rx)) == sorted(map(key, wc)) and rx


def test_regexp_topk_no_match_no_rows(spark, fs_index):
    root, _ = fs_index
    assert regexp_topk(spark, root, {"q": "zz+"}, k=5).count() == 0


@pytest.mark.parametrize("function", ["saturation", "log", "sigmoid"])
def test_rank_feature_functions(spark, fs_index, function):
    """final = bm25 + boost * f(feature) for all three ES rank_feature
    functions, vs a python recompute; the feature (doc length) is chosen
    so the boost reshuffles the pure-relevance order."""
    from rt_etl_yahoo_search_engine_spark.plans.funcscore import (
        rank_feature_topk,
    )

    root, docmap = fs_index
    rev = {d: u for u, d in docmap.items()}
    pivot, scale, exponent, boost = 3.0, 2.0, 2.0, 5.0
    feats = spark.createDataFrame(
        [(docmap[u], float(NCH[u])) for u in TOKS], "doc_id long, f double"
    )
    out = rank_feature_topk(
        spark, root, QUERIES, feats, k=4, function=function,
        pivot=pivot, scale=scale, exponent=exponent, boost=boost,
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], rev[r["doc_id"]], r["score"])
        )

    def f(v: float) -> float:
        if function == "saturation":
            return v / (v + pivot)
        if function == "log":
            return math.log(1.0 + scale * v)
        return v ** exponent / (v ** exponent + pivot ** exponent)

    for qid, hits in _python_scores().items():
        comb = {u: s + boost * f(float(NCH[u])) for u, s in hits.items()}
        ranked = sorted(comb.items(), key=lambda p: (-p[1], docmap[p[0]]))[:4]
        assert [(rk, u) for rk, u, _ in got.get(qid, [])] == [
            (i + 1, u) for i, (u, _) in enumerate(ranked)
        ]
        for (_, u, s_got), (_, s_want) in zip(got[qid], ranked):
            assert s_got == pytest.approx(s_want, rel=1e-12)


def test_rank_feature_missing_contributes_zero(spark, fs_index):
    """Docs absent from the feature table keep their plain BM25 (the
    rank_feature clause simply doesn't match, per ES bool-should)."""
    from rt_etl_yahoo_search_engine_spark.plans.funcscore import (
        rank_feature_topk,
    )

    root, docmap = fs_index
    feats = spark.createDataFrame(
        [(docmap["d1"], 100.0)], "doc_id long, f double"
    )
    out = rank_feature_topk(
        spark, root, {"q1": "alpha"}, feats, k=8, boost=10.0, pivot=1.0
    )
    rows = {r["doc_id"]: r["score"] for r in out.collect()}
    n = len(DOCS)
    df_alpha = sum(1 for seq in TOKS.values() if "alpha" in seq)
    avgdl = sum(len(s) for s in TOKS.values()) / n
    idf = math.log((n - df_alpha + 0.5) / (df_alpha + 0.5) + 1.0)
    base = {}
    for u, seq in TOKS.items():
        tf = seq.count("alpha")
        if tf:
            base[u] = idf * (tf * (spec.K1 + 1.0)) / (
                tf
                + spec.K1
                * (1.0 - spec.B + spec.B * len(seq) / avgdl)
            )
    for u, s in base.items():
        want = s + (10.0 * 100.0 / 101.0 if u == "d1" else 0.0)
        assert rows[docmap[u]] == pytest.approx(want, rel=1e-12)


def test_rank_feature_bad_function(spark, fs_index):
    from rt_etl_yahoo_search_engine_spark.plans.funcscore import (
        rank_feature_topk,
    )

    root, _ = fs_index
    feats = spark.createDataFrame([(0, 1.0)], "doc_id long, f double")
    with pytest.raises(ValueError, match="rank_feature"):
        rank_feature_topk(spark, root, QUERIES, feats, function="linear")


def test_distance_feature_reranks(spark, fs_index):
    """final = bm25 + boost * pivot/(pivot + |v - origin|) vs a python
    recompute; origin sits at a mid doc-length so the boost inverts the
    pure-relevance order for at least one query."""
    from rt_etl_yahoo_search_engine_spark.plans.funcscore import (
        distance_feature_topk,
    )

    root, docmap = fs_index
    rev = {d: u for u, d in docmap.items()}
    origin, pivot, boost = 3.0, 1.0, 5.0
    vals = spark.createDataFrame(
        [(docmap[u], float(NCH[u])) for u in TOKS], "doc_id long, v double"
    )
    out = distance_feature_topk(
        spark, root, QUERIES, vals, origin=origin, pivot=pivot,
        boost=boost, k=4,
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], rev[r["doc_id"]], r["score"])
        )
    for qid, hits in _python_scores().items():
        comb = {
            u: s + boost * pivot / (pivot + abs(float(NCH[u]) - origin))
            for u, s in hits.items()
        }
        ranked = sorted(comb.items(), key=lambda p: (-p[1], docmap[p[0]]))[:4]
        assert [(rk, u) for rk, u, _ in got.get(qid, [])] == [
            (i + 1, u) for i, (u, _) in enumerate(ranked)
        ]
        for (_, u, s_got), (_, s_want) in zip(got[qid], ranked):
            assert s_got == pytest.approx(s_want, rel=1e-12)


def test_distance_feature_missing_contributes_zero(spark, fs_index):
    """Docs absent from the value table keep plain BM25 (ES bool-should
    missing-field behaviour); present docs at origin gain exactly boost."""
    from rt_etl_yahoo_search_engine_spark.plans.funcscore import (
        distance_feature_topk,
    )

    root, docmap = fs_index
    vals = spark.createDataFrame(
        [(docmap["d1"], 7.0)], "doc_id long, v double"
    )
    out = distance_feature_topk(
        spark, root, {"q1": "alpha"}, vals, origin=7.0, pivot=2.0,
        boost=10.0, k=8,
    )
    rows = {r["doc_id"]: r["score"] for r in out.collect()}
    n = len(DOCS)
    df_alpha = sum(1 for seq in TOKS.values() if "alpha" in seq)
    avgdl = sum(len(s) for s in TOKS.values()) / n
    idf = math.log((n - df_alpha + 0.5) / (df_alpha + 0.5) + 1.0)
    for u, seq in TOKS.items():
        tf = seq.count("alpha")
        if not tf:
            continue
        base = idf * (tf * (spec.K1 + 1.0)) / (
            tf + spec.K1 * (1.0 - spec.B + spec.B * len(seq) / avgdl)
        )
        want = base + (10.0 if u == "d1" else 0.0)
        assert rows[docmap[u]] == pytest.approx(want, rel=1e-12)


def test_distance_feature_bad_pivot(spark, fs_index):
    from rt_etl_yahoo_search_engine_spark.plans.funcscore import (
        distance_feature_topk,
    )

    root, _ = fs_index
    vals = spark.createDataFrame([(0, 1.0)], "doc_id long, v double")
    with pytest.raises(ValueError, match="pivot"):
        distance_feature_topk(
            spark, root, QUERIES, vals, origin=0.0, pivot=0.0
        )
