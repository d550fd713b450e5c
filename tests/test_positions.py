"""Positional sidecar (operators.positions) + positional phrase verify.

Three independent checks:
  * the positional verify equals the text-scan verify row-for-row on the
    shared html corpus (same contract, different evidence);
  * a crafted text-tokenizer corpus with adjacency traps (repeated tokens,
    interleaved runs, non-adjacent conjunctive matches) scores exactly the
    pure-Python containment oracle;
  * the freshness guard: a sidecar built before an extension is refused
    loudly, and verify="auto" falls back to the text scan.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.functions.extract import page_text_df
from rt_etl_yahoo_search_engine_spark.operators.positions import build_positions
from rt_etl_yahoo_search_engine_spark.plans.phrase import phrase_topk
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def pos_index(spark, index_dir, corpus_dir, tmp_path_factory):
    """COPY of the shared index with a positional sidecar: the registry
    mutation (positions_dir) must not flip other modules' verify='auto'."""
    root = str(tmp_path_factory.mktemp("posidx") / "idx")
    shutil.copytree(index_dir, root)
    build_positions(spark, corpus_dir, root, tokenizer="html")
    return root


@pytest.fixture(scope="module")
def texts(spark, corpus_dir, pos_index):
    """(url, text) verify table + doc_id -> token list oracle map."""
    texts_df = page_text_df(spark.read.parquet(corpus_dir))
    docmap = Catalog(pos_index).read(spark, "docmap")
    joined = docmap.join(texts_df, "url").select("doc_id", "text").collect()
    return texts_df, {r["doc_id"]: spec.tokenize(r["text"]) for r in joined}


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    )


def _contains(seq, sub):
    m = len(sub)
    return any(seq[i : i + m] == sub for i in range(len(seq) - m + 1))


def _pick(toks_by_doc, length, skip=3):
    for doc_id in sorted(toks_by_doc):
        tk = toks_by_doc[doc_id]
        if len(tk) >= skip + length + 1:
            return " ".join(tk[skip : skip + length])
    raise AssertionError("no doc long enough")


def test_positional_equals_text_verify(spark, pos_index, texts):
    texts_df, toks = texts
    phrases = {
        "bigram": _pick(toks, 2),
        "trigram": _pick(toks, 3),
        "single": _pick(toks, 1),
        "reversed": " ".join(reversed(spec.tokenize(_pick(toks, 2)))),
        "unknown": "zzzzqqq yyyxxx",
        "ref_q1": spec.REFERENCE_QUERIES["q1"],
    }
    via_pos = phrase_topk(spark, pos_index, phrases, k=10, verify="positions")
    via_text = phrase_topk(
        spark, pos_index, phrases, texts_df, k=10, verify="text"
    )
    got_pos, got_text = _rows(via_pos), _rows(via_text)
    assert got_pos == got_text
    assert got_pos  # the lifted phrases really matched


def test_auto_prefers_fresh_sidecar(spark, pos_index, texts):
    texts_df, toks = texts
    phrases = {"p": _pick(toks, 2)}
    auto = phrase_topk(spark, pos_index, phrases, k=10)  # no docs_text
    text = phrase_topk(spark, pos_index, phrases, texts_df, k=10, verify="text")
    assert _rows(auto) == _rows(text) and _rows(auto)


def test_text_verify_requires_docs_text(spark, index_dir):
    with pytest.raises(ValueError, match="docs_text"):
        phrase_topk(spark, index_dir, {"p": "anything"}, k=5)


@pytest.fixture(scope="module")
def trap_index(spark, tmp_path_factory):
    """Tiny text-tokenizer corpus with adjacency traps + sidecar."""
    from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index

    docs = [
        ("d0", "alpha beta alpha beta alpha", "en"),
        ("d1", "alpha alpha alpha", "en"),
        ("d2", "alpha beta gamma", "en"),
        ("d3", "delta alpha omega beta", "en"),  # conjunctive, NOT adjacent
        ("d4", "beta", "en"),
    ]
    df = spark.createDataFrame(docs, "url string, text string, lang string")
    root = str(tmp_path_factory.mktemp("trap") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    build_positions(spark, df, root, tokenizer="text")
    toks = {u: spec.tokenize(t) for u, t, _ in docs}
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, "docmap").collect()
    }
    return root, {docmap[u]: tk for u, tk in toks.items()}


def test_trap_corpus_matches_containment_oracle(spark, trap_index):
    root, toks = trap_index
    phrases = {
        "ab": "alpha beta",          # d0 d2, NOT d3 (non-adjacent)
        "aba": "alpha beta alpha",   # d0 only (overlapping starts)
        "aa": "alpha alpha",         # d1 only (duplicate-term phrase)
        "aaaa": "alpha alpha alpha alpha",  # nothing (run too short)
        "bag": "beta alpha gamma",   # nothing (conjunctive d2 fails order)
        "b": "beta",                 # single token
    }
    out = phrase_topk(spark, root, phrases, k=10, verify="positions")
    got = {qid: set() for qid in phrases}
    for r in out.collect():
        got[r["query_id"]].add(r["doc_id"])
    for qid, phrase in phrases.items():
        ptoks = spec.tokenize(phrase)
        want = {d for d, tk in toks.items() if _contains(tk, ptoks)}
        assert got[qid] == want, (qid, phrase)
    assert got["ab"] and got["aba"] and got["aa"] and got["b"]
    assert not got["aaaa"] and not got["bag"]


def test_stale_sidecar_guard(spark, trap_index):
    root, _ = trap_index
    cat = Catalog(root)
    reg = cat.read_registry()
    try:
        stale = dict(reg, n_docs=reg["n_docs"] + 7)  # simulate an extension
        cat.write_registry(stale)
        with pytest.raises(ValueError, match="stale"):
            phrase_topk(
                spark, root, {"p": "alpha beta"}, k=5, verify="positions"
            ).collect()
        # auto must fall back to the text verify, which needs docs_text
        with pytest.raises(ValueError, match="docs_text"):
            phrase_topk(spark, root, {"p": "alpha beta"}, k=5)
    finally:
        cat.write_registry(reg)


def test_positions_table_layout(spark, pos_index):
    """Shard dirs exist; per-row shard is the doc-range formula; positions
    are sorted and index the doc's token sequence."""
    import os

    reg = Catalog(pos_index).read_registry()
    n_docs = int(reg["n_docs"])
    n_shards = int(Catalog(pos_index).read_stats()["n_shards"])
    pos_path = Catalog(pos_index).path(reg["positions_dir"])
    assert any(d.startswith("shard=") for d in os.listdir(pos_path))
    df = spark.read.parquet(pos_path)
    bad = df.filter(
        (F.col("shard")
         != F.floor(F.col("doc_id") * n_shards / F.lit(n_docs)).cast("int"))
        | (F.col("positions") != F.array_sort("positions"))
        | (F.size("positions") == 0)
    ).count()
    assert bad == 0
    # tf parity with the main index's token counts: sum of positions list
    # sizes per doc == doc_len sentinel in the tokens table
    tokens = Catalog(pos_index).read(spark, "tokens")
    dl = tokens.filter(F.col("term").isNull()).select("doc_id", "doc_len")
    got = df.groupBy("doc_id").agg(F.sum(F.size("positions")).alias("n"))
    mismatch = (
        dl.join(got, "doc_id", "left")
        .filter(
            F.coalesce(F.col("n"), F.lit(0)) != F.col("doc_len")
        )
        .count()
    )
    assert mismatch == 0
