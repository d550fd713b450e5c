"""categorize_text (functions/text_analysis.py) — token-pattern grouping
against a pure-Python oracle."""

import re

import pytest

from rt_etl_yahoo_search_engine_spark.functions.text_analysis import (
    categorize_text,
)

DOCS = [
    (0, "Failed to connect to host 10 port 8080 timeout"),
    (1, "Failed to connect to host 192 port 9090 timeout"),
    (2, "Failed to connect to host 172 port 80 refused"),
    (3, "User 42 logged in from session 9"),
    (4, "User 7 logged in from session 11"),
    (5, "Disk usage at 91 percent on volume 3"),
    (6, ""),  # empty text -> empty category
    (7, "12 34 56"),  # all digit-bearing tokens -> empty category
]


def _py_categories(max_tokens):
    cats = {}
    for did, text in DOCS:
        toks = [
            t
            for t in re.findall(r"[a-z0-9]+", text.lower())
            if not re.search(r"[0-9]", t)
        ]
        key = " ".join(toks[:max_tokens])
        n, m = cats.get(key, (0, did))
        cats[key] = (n + 1, min(m, did))
    return cats


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_categories_match_python_oracle(spark, docs):
    got = {
        r["category"]: (r["doc_count"], r["min_doc_id"])
        for r in categorize_text(docs, max_tokens=8, k=20).collect()
    }
    assert got == _py_categories(8)


def test_ranking_count_desc_then_category_asc(spark, docs):
    rows = categorize_text(docs, max_tokens=8, k=20).collect()
    ordered = [(-(r["doc_count"]), r["category"]) for r in rows]
    assert ordered == sorted(ordered)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # docs 0 and 1 share the full digit-free signature (doc 2 diverges at
    # its last token "refused"), as do docs 3 and 4
    assert rows[0]["doc_count"] == 2
    assert {r["category"] for r in rows if r["doc_count"] == 2} == {
        "failed to connect to host port timeout",
        "user logged in from session",
        "",  # the empty-text and all-digit docs share the empty signature
    }


def test_k_truncates(spark, docs):
    assert categorize_text(docs, max_tokens=8, k=2).count() == 2


def test_max_tokens_shortens_signature(spark, docs):
    got = {
        r["category"]
        for r in categorize_text(docs, max_tokens=3, k=20).collect()
    }
    assert "failed to connect" in got
