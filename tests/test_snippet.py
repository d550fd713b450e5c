"""Query-aware snippets — functions/snippet.add_snippets.

The contract is purely positional (module docstring): first occurrence of
any query token in lower(body), cut `width` chars starting `before` chars
earlier, head-of-body fallback.  Checked against a character-exact pure
Python reimplementation, plus an end-to-end pass over the fields path of
the shared index.
"""

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.functions.snippet import add_snippets


def _py_snippet(body, text, width=120, before=40):
    toks = sorted(set(spec.tokenize(text)))
    low = body.lower()
    hits = [p for p in (low.find(t) for t in toks) if p >= 0]
    if not hits:
        return body[:width]
    start = max(0, min(hits) - before)
    return body[start : start + width]


BODIES = [
    ("q1", "x" * 300 + " needle appears here " + "y" * 300),
    ("q1", "needle at the very start " + "z" * 200),
    ("q1", "no match anywhere in this body at all " + "w" * 200),
    ("q2", "the FIRST of two: alpha ... then beta " + "v" * 200),
    ("q2", "beta comes before alpha here " + "u" * 200),
    ("q1", "short"),
]
QUERIES = {"q1": "needle", "q2": "alpha beta"}


def test_matches_python_reimplementation(spark):
    df = spark.createDataFrame(
        [(q, b, i) for i, (q, b) in enumerate(BODIES)],
        "query_id string, body string, row_id int",
    )
    out = {
        r["row_id"]: r["snippet"]
        for r in add_snippets(spark, df, QUERIES).collect()
    }
    for i, (q, b) in enumerate(BODIES):
        assert out[i] == _py_snippet(b, QUERIES[q]), (i, out[i])


def test_case_insensitive_and_earliest_token_wins(spark):
    df = spark.createDataFrame(
        [("q", "AAA NeEdLe BBB", 0)], "query_id string, body string, row_id int"
    )
    out = add_snippets(spark, df, {"q": "needle"}).collect()[0]["snippet"]
    # matched case-insensitively, cut from the ORIGINAL casing
    assert "NeEdLe" in out


def test_unknown_query_id_gets_null(spark):
    df = spark.createDataFrame(
        [("nope", "some body", 0)], "query_id string, body string, row_id int"
    )
    out = add_snippets(spark, df, QUERIES).collect()[0]
    assert out["snippet"] is None


def test_custom_width_and_column(spark):
    df = spark.createDataFrame(
        [("q1", "b" * 100 + "needle" + "a" * 100, 0)],
        "query_id string, body string, row_id int",
    )
    out = add_snippets(
        spark, df, QUERIES, width=20, before=5, snippet_col="frag"
    ).collect()[0]
    assert out["frag"] == _py_snippet("b" * 100 + "needle" + "a" * 100,
                                      "needle", width=20, before=5)
    assert len(out["frag"]) == 20


def test_end_to_end_fields_path(spark, index_dir, corpus_dir):
    """topk(fields=extracted text) + add_snippets: every hit's snippet
    contains one of its query's tokens (hits come from the index, bodies
    are the same text it tokenized)."""
    from rt_etl_yahoo_search_engine_spark.functions.extract import page_text_df
    from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
    from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

    lex = Catalog(index_dir).read(spark, "lexicon").orderBy(F.desc("df"))
    t = lex.select("term").limit(2).collect()
    queries = {"q": f"{t[0]['term']} {t[1]['term']}"}
    fields = page_text_df(spark.read.parquet(corpus_dir)).withColumnRenamed(
        "text", "body"
    )
    out = add_snippets(
        spark, topk(spark, index_dir, queries, k=5, fields=fields), queries
    )
    rows = out.collect()
    assert rows
    toks = set(spec.tokenize(queries["q"]))
    for r in rows:
        assert len(r["snippet"]) <= 120
        assert any(tok in r["snippet"].lower() for tok in toks), r["snippet"]
