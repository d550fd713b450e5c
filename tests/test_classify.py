"""Multinomial Naive Bayes (functions/classify): exact parity with a
from-scratch dense Python implementation (priors, Laplace smoothing,
unseen-(term,class) handling via the sparse decomposition), margin
semantics, single-class degenerate case, and train/predict corpus
separation (OOV prediction terms ignored)."""

import math

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.functions.classify import (
    nb_predict, nb_self_classify, nb_train,
)

TRAIN = [
    (0, "the cat sat on the mat", "en"),
    (1, "a dog and a cat play", "en"),
    (2, "the dog barks at the cat", "en"),
    (3, "le chat dort sur le tapis", "fr"),
    (4, "le chien et le chat jouent", "fr"),
    (5, "der hund und die katze", "de"),
    (6, "die katze schlaeft auf der matte", "de"),
    (7, "der hund bellt die katze an", "de"),
]


def _py_nb(train, test):
    """Dense reference: every (term, class) pair smoothed explicitly."""
    labels = sorted({l for _, _, l in train})
    vocab = sorted({t for _, text, _ in train for t in spec.tokenize(text)})
    n = len(train)
    cnt = {c: {} for c in labels}
    tot = {c: 0 for c in labels}
    ndc = {c: 0 for c in labels}
    for _, text, c in train:
        ndc[c] += 1
        for t in spec.tokenize(text):
            cnt[c][t] = cnt[c].get(t, 0) + 1
            tot[c] += 1
    out = {}
    for did, text, *_ in test:
        scores = {}
        for c in labels:
            s = math.log(ndc[c] / n)
            for t in spec.tokenize(text):
                if t not in vocab:
                    continue  # OOV at prediction time: ignored
                s += math.log((cnt[c].get(t, 0) + 1) / (tot[c] + len(vocab)))
            scores[c] = s
        ordered = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        best, second = ordered[0], (ordered[1] if len(ordered) > 1 else None)
        out[did] = (
            best[0], best[1],
            float("inf") if second is None else best[1] - second[1],
        )
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_self_classify_matches_python(spark):
    got = {
        r["doc_id"]: (r["pred_label"], r["logp"], r["margin"], r["correct"])
        for r in nb_self_classify(_df(spark, TRAIN), "lang").collect()
    }
    want = _py_nb(TRAIN, TRAIN)
    assert set(got) == set(want)
    for did, (pl, lp, mg) in want.items():
        assert got[did][0] == pl, did
        assert got[did][1] == pytest.approx(lp, abs=1e-9)
        assert got[did][2] == pytest.approx(mg, abs=1e-9)
        assert got[did][3] == (TRAIN[did][2] == pl)


def test_holdout_with_oov_terms(spark):
    test_rows = [
        (100, "the cat and the dog", "en"),
        (101, "le chat et le chien zzznovel", "fr"),  # OOV token ignored
        (102, "die katze und der hund", "de"),
    ]
    pairs, classes = nb_train(_df(spark, TRAIN), "lang")
    pred = {
        r["doc_id"]: (r["pred_label"], r["logp"], r["margin"])
        for r in nb_predict(
            _df(spark, test_rows), pairs, classes
        ).collect()
    }
    want = _py_nb(TRAIN, test_rows)
    assert set(pred) == set(want)
    for did in want:
        assert pred[did][0] == want[did][0]
        assert pred[did][1] == pytest.approx(want[did][1], abs=1e-9)
        assert pred[did][2] == pytest.approx(want[did][2], abs=1e-9)


def test_single_class_margin_is_inf(spark):
    rows = [(i, t, "en") for i, (_, t, _) in enumerate(TRAIN[:3])]
    out = nb_self_classify(_df(spark, rows), "lang").collect()
    assert all(r["pred_label"] == "en" for r in out)
    assert all(math.isinf(r["margin"]) for r in out)


def test_all_docs_classified_once(spark):
    out = nb_self_classify(_df(spark, TRAIN), "lang")
    assert out.count() == len(TRAIN)
    assert out.select("doc_id").distinct().count() == len(TRAIN)
