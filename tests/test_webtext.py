"""Webtext hygiene operators (functions/webtext.py): PII redaction,
Gopher repetition signals, cross-doc chunk dedup — hand-computed goldens
on tiny fixed corpora, plus plan-shape assertions (no Python UDFs)."""

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark.functions.webtext import (
    chunk_dedup,
    pii_stats,
    repetition_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "write to bob@example.com or call 555-123-4567 now"),
        (1, "server at 10.0.0.1 and 192.168.1.9 ... ok #tag"),
        (2, "no pii here just plain text"),
        (3, "dup dup dup words words"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts_and_redaction(spark, docs):
    got = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert (got[0]["n_emails"], got[0]["n_phones"], got[0]["n_ipv4"]) == (1, 1, 0)
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ipv4"]) == (0, 0, 2)
    assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["n_ipv4"]) == (0, 0, 0)
    # redacted fingerprint == md5 of the manually redacted string
    import hashlib

    exp0 = hashlib.md5(
        b"write to <EMAIL> or call <PHONE> now"
    ).hexdigest()
    assert got[0]["redacted_fp"] == exp0
    exp1 = hashlib.md5(b"server at <IP> and <IP> ... ok #tag").hexdigest()
    assert got[1]["redacted_fp"] == exp1
    # untouched text hashes unchanged
    exp2 = hashlib.md5(b"no pii here just plain text").hexdigest()
    assert got[2]["redacted_fp"] == exp2


def test_repetition_stats_golden(spark, docs):
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # doc 3: tokens = dup dup dup words words -> bigrams:
    # "dup dup" x2, "dup words", "words words" -> top count 2 of 4
    r = got[3]
    assert r["n_tokens"] == 5
    assert r["top_bigram_count"] == 2
    assert r["top_bigram_frac"] == pytest.approx(2 / 4)
    assert r["distinct_token_ratio"] == pytest.approx(2 / 5)
    assert r["mean_word_len"] == pytest.approx((3 * 3 + 5 * 2) / 5)
    # doc 1: one "..." and one "#" -> 2 symbol hits over 8 tokens
    # tokens: server at 10 0 0 1 and 192 168 1 9 ok tag = 13
    assert got[1]["symbol_word_ratio"] == pytest.approx(
        2 / got[1]["n_tokens"]
    )
    # empty doc: all-zero, no div-by-zero
    assert got[4]["n_tokens"] == 0 and got[4]["top_bigram_count"] == 0


def test_chunk_dedup_marks_shared_spans(spark):
    # width=3 chunks; docs 0 and 1 share their first 3-token chunk
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma other words here"),
        (2, "totally different text stream now yes"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in chunk_dedup(d, min_docs=2, width=3).collect()}
    assert got[0]["n_chunks"] == 2 and got[0]["n_dup_chunks"] == 1
    assert got[0]["dup_chunk_frac"] == pytest.approx(0.5)
    assert got[1]["n_dup_chunks"] == 1
    assert got[2]["n_dup_chunks"] == 0


def test_webtext_plans_have_no_python_udf(spark, docs):
    for df in (pii_stats(docs), repetition_stats(docs), chunk_dedup(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rag_chunks_match_python(spark):
    """rag_chunks: chunk boundaries, truncation, overlap, and hashes
    equal a pure-python sliding-window reference."""
    import hashlib

    from rt_etl_yahoo_search_engine_spark import spec
    from rt_etl_yahoo_search_engine_spark.functions.webtext import rag_chunks

    texts = {
        0: " ".join(f"w{i}" for i in range(10)),    # < window: 1 chunk
        1: " ".join(f"w{i}" for i in range(64)),    # == window: 1 chunk
        2: " ".join(f"w{i}" for i in range(65)),    # 2 chunks (17-tail)
        3: " ".join(f"w{i}" for i in range(113)),   # 3 chunks
        4: "",                                       # empty: no chunks
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {}
    for r in rag_chunks(df, window=64, stride=48).collect():
        got[(r["doc_id"], r["chunk_id"])] = (
            r["start_tok"], r["n_chunk_tokens"], r["chunk_hash"]
        )
    want = {}
    for did, text in texts.items():
        toks = spec.tokenize(text)
        if not toks:
            continue
        n = 1 + max(len(toks) - 64 + 47, 0) // 48
        for i in range(n):
            ctoks = toks[i * 48: i * 48 + 64]
            want[(did, i)] = (
                i * 48, len(ctoks),
                hashlib.md5(" ".join(ctoks).encode()).hexdigest(),
            )
    assert got == want
    assert (4, 0) not in got
