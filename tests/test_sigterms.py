"""Significant terms (plans/sigterms): JLH scoring over the exact match
relation, against a pure-Python recompute from the raw texts."""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.sigterms import significant_terms
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("u0", "apple apple banana cherry kiwi"),
    ("u1", "apple banana banana fig kiwi"),
    ("u2", "apple cherry cherry grape"),
    ("u3", "banana banana date fig"),
    ("u4", "date egg egg grape"),
    ("u5", "cherry date apple egg"),
    ("u6", "fig grape fig banana"),
    ("u7", "egg grape date fig"),
]
QUERIES = {"q1": "apple", "q2": "banana fig"}


@pytest.fixture(scope="module")
def gidx(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t in DOCS], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("sig") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, docmap


def _python_sig(query, mode, k, min_hits_df):
    toks = {u: spec.tokenize(t) for u, t in DOCS}
    n = len(DOCS)
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    qt = set(spec.tokenize(query))
    if mode == spec.MODE_CONJUNCTIVE:
        hits = [u for u, ts in toks.items() if qt <= set(ts)]
    else:
        hits = [u for u, ts in toks.items() if qt & set(ts)]
    n_hits = len(hits)
    fg = {}
    for u in hits:
        for t in set(toks[u]):
            fg[t] = fg.get(t, 0) + 1
    rows = []
    for t, dh in fg.items():
        if dh < min_hits_df:
            continue
        fgs, bgs = dh / n_hits, df[t] / n
        rows.append((t, dh, df[t], (fgs - bgs) * (fgs / bgs)))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:k]


@pytest.mark.parametrize("mode", [spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE])
def test_sigterms_match_python(spark, gidx, mode):
    root, _ = gidx
    got = significant_terms(
        spark, root, QUERIES, k=5, mode=mode, min_hits_df=2
    ).collect()
    by_q: dict = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        assert r["rank"] == len(by_q.setdefault(r["query_id"], [])) + 1
        by_q[r["query_id"]].append(
            (r["term"], r["df_hits"], r["df_corpus"], r["jlh"])
        )
    for qid, text in QUERIES.items():
        want = _python_sig(text, mode, 5, 2)
        gotq = by_q.get(qid, [])
        assert [(t, dh, dc) for t, dh, dc, _ in gotq] == [
            (t, dh, dc) for t, dh, dc, _ in want
        ], (qid, mode)
        for (_, _, _, gj), (_, _, _, wj) in zip(gotq, want):
            assert gj == pytest.approx(wj, rel=1e-12)


def test_sigterms_gate_and_signal(spark, gidx):
    root, _ = gidx
    out = {
        r["term"]: r
        for r in significant_terms(
            spark, root, {"q": "apple"}, k=10, min_hits_df=2
        ).collect()
    }
    # kiwi appears ONLY in apple-docs (df_corpus == df_hits == 2):
    # maximal lift, the signature term of this match set
    assert "kiwi" in out
    top = min(out.values(), key=lambda r: r["rank"])
    assert top["term"] in ("apple", "kiwi")
    # every reported term clears the gate
    assert all(r["df_hits"] >= 2 for r in out.values())


@pytest.fixture(scope="module")
def dup_idx(spark, tmp_path_factory):
    """Corpus with exact leading-prefix duplicates among the apple hits."""
    docs = DOCS + [
        ("u8", "apple apple banana cherry kiwi"),   # prefix-dup of u0
        ("u9", "apple apple banana cherry melon"),  # dup at prefix<=4 only
    ]
    df = spark.createDataFrame(
        [(u, t, "en") for u, t in docs], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("sigtx") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    dm = Catalog(root).read(spark, "docmap")
    return root, dm, docs


@pytest.mark.parametrize("dedup,prefix_n", [(False, 64), (True, 64), (True, 4)])
def test_significant_text_matches_python(spark, dup_idx, dedup, prefix_n):
    from rt_etl_yahoo_search_engine_spark.plans.sigterms import (
        significant_text,
    )

    root, dm, docs = dup_idx
    txt = spark.createDataFrame(
        [(u, t) for u, t in docs], "url string, text string"
    )
    doc_text = dm.join(txt, "url").select("doc_id", "text")
    got = significant_text(
        spark, root, QUERIES, doc_text, k=5, min_hits_df=2,
        filter_duplicate_text=dedup, dup_prefix_tokens=prefix_n,
    ).collect()
    by_q: dict = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(
            (r["term"], r["df_hits"], r["df_corpus"], r["jlh"])
        )

    toks = {u: spec.tokenize(t) for u, t in docs}
    n = len(docs)
    dfc = {}
    for ts in toks.values():
        for t in set(ts):
            dfc[t] = dfc.get(t, 0) + 1
    for qid, text in QUERIES.items():
        qt = set(spec.tokenize(text))
        hits = sorted(u for u, ts in toks.items() if qt & set(ts))
        if dedup:
            seen, kept = set(), []
            for u in hits:
                key = " ".join(toks[u][:prefix_n])
                if key not in seen:
                    seen.add(key)
                    kept.append(u)
            hits = kept
        n_hits = len(hits)
        fg = {}
        for u in hits:
            for t in set(toks[u]):
                fg[t] = fg.get(t, 0) + 1
        rows = []
        for t, dh in fg.items():
            if dh < 2:
                continue
            fgs, bgs = dh / n_hits, dfc[t] / n
            rows.append((t, dh, dfc[t], (fgs - bgs) * (fgs / bgs)))
        rows.sort(key=lambda r: (-r[3], r[0]))
        want = rows[:5]
        gotq = by_q.get(qid, [])
        assert [(t, dh, dc) for t, dh, dc, _ in gotq] == [
            (t, dh, dc) for t, dh, dc, _ in want
        ]
        for (_, _, _, jg), (_, _, _, jw) in zip(gotq, want):
            assert jg == pytest.approx(jw, rel=1e-12)
