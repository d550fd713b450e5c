"""Winnowing fingerprints: edge cases and the w+k-1 sharing guarantee."""

import hashlib

from rt_etl_yahoo_search_engine_spark.functions.text_analysis import (
    winnow_fingerprints,
)

MD5_EMPTY = hashlib.md5(b"").hexdigest()


def test_short_empty_and_null_docs_report_zero(spark):
    docs = spark.createDataFrame(
        [(1, "ab c!"), (2, ""), (3, None), (4, "abcdef")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in winnow_fingerprints(docs).collect()}
    for d in (1, 2, 3):  # < k=5 normalized chars -> no grams at all
        assert rows[d]["n_grams"] == 0 and rows[d]["n_fp"] == 0
        assert rows[d]["fp_digest"] == MD5_EMPTY
    # 6 chars -> 2 grams, one (short) window -> exactly 1 selection
    assert rows[4]["n_grams"] == 2 and rows[4]["n_fp"] == 1
    assert rows[4]["fp_digest"] != MD5_EMPTY


def test_normalization_invariance_and_sensitivity(spark):
    # fingerprints depend only on the NORMALIZED text: same alnum
    # stream under different case/punctuation/whitespace -> identical
    # digest; a one-char change -> different digest
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over it"),
            (2, "The! Quick? BROWN--fox   jumps(over)it"),
            (3, "the quick brown fax jumps over it"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in winnow_fingerprints(docs).collect()}
    assert rows[1]["fp_digest"] == rows[2]["fp_digest"]
    assert rows[1]["n_fp"] == rows[2]["n_fp"] > 0
    assert rows[1]["fp_digest"] != rows[3]["fp_digest"]
