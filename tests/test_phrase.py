"""Phrase queries (plans.phrase.phrase_topk) against a pure-Python oracle.

The oracle shares only spec.py with the engine: it re-tokenizes every
indexed doc's extracted text, checks CONTIGUOUS subsequence containment
directly on the token lists, and scores BM25 from first principles — so it
exercises the whole chain (conjunctive candidate retrieval, JVM-side
token-string containment, re-rank) independently.
"""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.functions.extract import page_text_df
from rt_etl_yahoo_search_engine_spark.plans.phrase import phrase_needle, phrase_topk
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def corpus_texts(spark, corpus_dir, index_dir):
    """doc_id -> token list for every INDEXED doc (docmap ⋈ extracted text),
    plus the (url, text) frame the verify phase scans."""
    texts_df = page_text_df(spark.read.parquet(corpus_dir))
    docmap = Catalog(index_dir).read(spark, "docmap")
    joined = docmap.join(texts_df, "url").select("doc_id", "text").collect()
    toks = {r["doc_id"]: spec.tokenize(r["text"]) for r in joined}
    reg = Catalog(index_dir).read_registry()
    assert len(toks) == reg["n_docs"]
    return toks, texts_df, reg


def _contains(seq: list[str], sub: list[str]) -> bool:
    m = len(sub)
    return any(seq[i : i + m] == sub for i in range(len(seq) - m + 1))


def _oracle(toks_by_doc, n_docs, avgdl, phrase, k=10):
    ptoks = spec.tokenize(phrase)
    if not ptoks:
        return []
    dterms = sorted(set(ptoks))
    df = {
        t: sum(1 for tk in toks_by_doc.values() if t in tk) for t in dterms
    }
    hits = []
    for doc_id, tk in toks_by_doc.items():
        if not _contains(tk, ptoks):
            continue
        dl = len(tk)
        score = sum(
            spec.bm25_term_score(tk.count(t), dl, avgdl, spec.idf(n_docs, df[t]))
            for t in dterms
        )
        hits.append((doc_id, score))
    hits.sort(key=lambda x: (-x[1], x[0]))
    return hits[:k]


def _run(spark, index_dir, texts_df, phrases, k=10):
    out = phrase_topk(spark, index_dir, phrases, texts_df, k=k)
    res: dict[str, list] = {qid: [] for qid in phrases}
    for r in sorted(out.collect(), key=lambda r: (r["query_id"], r["rank"])):
        assert r["rank"] == len(res[r["query_id"]]) + 1  # dense ranks
        res[r["query_id"]].append((r["doc_id"], r["score"]))
    return res


def _pick_phrase(toks_by_doc, length: int, min_tokens: int = 8) -> str:
    """A phrase guaranteed to occur: a token run lifted from a real doc."""
    for doc_id in sorted(toks_by_doc):
        tk = toks_by_doc[doc_id]
        if len(tk) >= min_tokens:
            return " ".join(tk[3 : 3 + length])
    raise AssertionError("no doc long enough")


def test_phrase_matches_python_oracle(spark, index_dir, corpus_texts):
    toks, texts_df, reg = corpus_texts
    phrases = {
        "bigram": _pick_phrase(toks, 2),
        "trigram": _pick_phrase(toks, 3),
        "single": _pick_phrase(toks, 1),
        "ref_q1": spec.REFERENCE_QUERIES["q1"],  # may or may not be adjacent
    }
    got = _run(spark, index_dir, texts_df, phrases)
    n_docs, avgdl = reg["n_docs"], reg["avgdl"]
    matched_any = 0
    for qid, phrase in phrases.items():
        want = _oracle(toks, n_docs, avgdl, phrase)
        assert [d for d, _ in got[qid]] == [d for d, _ in want], (qid, phrase)
        for (gd, gs), (wd, ws) in zip(got[qid], want):
            assert gs == pytest.approx(ws, abs=1e-9), (qid, gd)
        matched_any += bool(want)
    assert matched_any >= 3  # the lifted phrases really matched


def test_phrase_stricter_than_conjunctive(spark, index_dir, corpus_texts):
    """Some doc contains both bigram terms NON-adjacently somewhere in the
    corpus — phrase matches must be a strict subset of conjunctive matches
    whenever that happens; verify the engine's phrase set equals the
    oracle-verified subset."""
    toks, texts_df, reg = corpus_texts
    phrase = _pick_phrase(toks, 2)
    ptoks = spec.tokenize(phrase)
    conj = {
        d for d, tk in toks.items() if all(t in tk for t in set(ptoks))
    }
    phr = {d for d, tk in toks.items() if _contains(tk, ptoks)}
    assert phr <= conj and phr
    got = _run(spark, index_dir, texts_df, {"p": phrase}, k=len(conj) + 10)
    assert {d for d, _ in got["p"]} == phr


def test_phrase_edge_cases(spark, index_dir, corpus_texts):
    toks, texts_df, _ = corpus_texts
    got = _run(
        spark,
        index_dir,
        texts_df,
        {
            "unknown": "zzzzqqqxx yyyyzzzww",
            "empty": "",
            "punct_only": "!!! ???",
            # known terms in an order that never occurs adjacently
            "reversed": " ".join(reversed(spec.tokenize(_pick_phrase(toks, 2)))),
        },
    )
    assert got["unknown"] == [] and got["empty"] == [] and got["punct_only"] == []
    rev = spec.tokenize(" ".join(reversed(spec.tokenize(_pick_phrase(toks, 2)))))
    want_rev = {d for d, tk in toks.items() if _contains(tk, rev)}
    assert {d for d, _ in got["reversed"]} <= want_rev


def test_phrase_needle_normalization():
    assert phrase_needle("Starbucks  Coffee!") == " starbucks coffee "
    assert phrase_needle("...") is None
    assert phrase_needle("") is None
