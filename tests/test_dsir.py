"""DSIR hashed-n-gram importance weights (functions/sampling.dsir_weights)
against a pure-Python reimplementation, plus directional sanity (a raw doc
made of target-only vocabulary outweighs one of raw-only vocabulary)."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark.functions.sampling import dsir_weights

B = 64

DOCS = [
    # target corpus: "clean prose" vocabulary
    (0, 1, "the quick brown fox jumps over the lazy dog"),
    (1, 1, "a quick brown dog runs over the green field"),
    (2, 1, "the lazy fox sleeps under the green tree"),
    # raw pool
    (3, 0, "the quick brown fox runs over the lazy dog"),   # target-like
    (4, 0, "buy cheap pills online casino bonus click here"),  # junk
    (5, 0, "the green tree and the brown fox"),             # mixed
    (6, 0, ""),                                             # no grams
]


def _grams(text):
    toks = re.findall(r"[a-z0-9]+", text.lower())
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(gram):
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B


def _py_dsir():
    ct, cr = [0] * B, [0] * B
    per_doc = {}
    for did, is_t, text in DOCS:
        counts = {}
        for g in _grams(text):
            bkt = _bucket(g)
            counts[bkt] = counts.get(bkt, 0) + 1
            (ct if is_t else cr)[bkt] += 1
        if not is_t:
            per_doc[did] = counts
    t_total, r_total = sum(ct), sum(cr)
    out = {}
    for did, counts in per_doc.items():
        if not counts:
            continue
        logw = sum(
            c
            * (
                math.log((ct[bkt] + 1.0) / (t_total + B))
                - math.log((cr[bkt] + 1.0) / (r_total + B))
            )
            for bkt, c in counts.items()
        )
        out[did] = (sum(counts.values()), logw)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, t int, text string"
    )


def test_weights_match_python_oracle(spark, docs):
    got = {
        r["doc_id"]: (r["n_grams"], r["logw"])
        for r in dsir_weights(docs, F.col("t") == 1, n_buckets=B).collect()
    }
    want = _py_dsir()
    assert set(got) == set(want)
    for did, (n, w) in want.items():
        assert got[did][0] == n
        assert got[did][1] == pytest.approx(w, rel=1e-12)


def test_target_like_raw_doc_outweighs_junk(spark, docs):
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(docs, F.col("t") == 1, n_buckets=B).collect()
    }
    assert got[3] > got[5] > got[4]


def test_empty_text_raw_doc_absent(spark, docs):
    ids = {
        r["doc_id"]
        for r in dsir_weights(docs, F.col("t") == 1, n_buckets=B).collect()
    }
    assert 6 not in ids and ids == {3, 4, 5}


def test_bad_bucket_count_rejected(spark, docs):
    with pytest.raises(ValueError):
        dsir_weights(docs, F.col("t") == 1, n_buckets=1)
