"""Wildcard queries (plans/wildcard): glob expansion against a pure-Python
recompute, score identity with plain BM25 over the expanded terms, and
the prefix-range / leading-wildcard read paths."""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans import bm25
from rt_etl_yahoo_search_engine_spark.plans.wildcard import (
    expand_wildcard,
    wildcard_topk,
)
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

DOCS = [
    ("u0", "join joint jolt den"),
    ("u1", "join jan jon john"),
    ("u2", "scan scant can den"),
    ("u3", "joint jolt scan dan"),
    ("u4", "can dan den din don"),
]
VOCAB = sorted({t for _, txt in DOCS for t in spec.tokenize(txt)})


@pytest.fixture(scope="module")
def widx(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(u, t, "en") for u, t in DOCS], "url string, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("wild") / "idx")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    return root


def _glob(pattern):
    import re

    rx = re.compile(
        "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c)
            for c in pattern
        )
    )
    return sorted(t for t in VOCAB if rx.fullmatch(t))


@pytest.mark.parametrize(
    "pat",
    ["jo*", "j*n", "?an", "d?n", "*n", "jo?n*", "scan", "zz*", "*"],
)
def test_expand_matches_python_glob(spark, widx, pat):
    cat = Catalog(widx)
    assert expand_wildcard(cat, cat.read_registry(), pat) == _glob(pat)


def test_expand_cap_keeps_highest_df(spark, widx):
    cat = Catalog(widx)
    reg = cat.read_registry()
    df = {}
    for _, txt in DOCS:
        for t in set(spec.tokenize(txt)):
            df[t] = df.get(t, 0) + 1
    full = _glob("d?n")
    capped = expand_wildcard(cat, reg, "d?n", max_expand=2)
    want = sorted(
        t for t in sorted(full, key=lambda t: (-df[t], t))[:2]
    )
    assert capped == want and len(full) > 2


def test_wildcard_topk_scores_equal_plain_bm25(spark, widx):
    out = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in wildcard_topk(
            spark, widx, {"q1": "j*n den", "q2": "?an", "q3": "zzz*"}, k=10
        ).collect()
    }
    assert not any(q == "q3" for q, _ in out)  # no expansion -> no rows
    for qid, pats in (("q1", ["j*n", "den"]), ("q2", ["?an"])):
        terms = sorted({t for p in pats for t in _glob(p)})
        want = {
            (qid, r["doc_id"]): (r["rank"], r["score"])
            for r in bm25.topk(
                spark, widx, {qid: " ".join(terms)}, k=10
            ).collect()
        }
        assert {k: v for k, v in out.items() if k[0] == qid} == want
