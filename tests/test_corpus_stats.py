"""zipf_fit / js_divergence (functions/text_analysis) and the
scripted_metric harness (functions/scripted): python-reference parity,
closed-form edge cases (identical groups -> 0, disjoint support ->
ln 2), and harness determinism under repartitioning."""

import math

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.functions.scripted import scripted_metric
from rt_etl_yahoo_search_engine_spark.functions.text_analysis import (
    js_divergence, zipf_fit,
)

DOCS = [
    (0, "the cat sat on the mat the end", "a"),
    (1, "the dog and the cat play the game", "a"),
    (2, "a window sums rows over partitions", "b"),
    (3, "the optimizer prunes partitions the scan", "b"),
    (4, "vector scans decode batches quickly", "c"),
]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string, g string")


def _py_ols(points):
    n = float(len(points))
    sx = sum(x for x, _ in points)
    sy = sum(y for _, y in points)
    sxy = sum(x * y for x, y in points)
    sxx = sum(x * x for x, _ in points)
    syy = sum(y * y for _, y in points)
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    intercept = (sy - slope * sx) / n
    r2 = (sxy - sx * sy / n) ** 2 / ((sxx - sx * sx / n) * (syy - sy * sy / n))
    return slope, intercept, r2


def test_zipf_fit_matches_python(spark):
    out = zipf_fit(_df(spark)).collect()[0]
    cf = {}
    for _, text, _ in DOCS:
        for t in spec.tokenize(text):
            cf[t] = cf.get(t, 0) + 1
    ranked = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [(math.log(i + 1), math.log(c)) for i, (_, c) in enumerate(ranked)]
    slope, intercept, r2 = _py_ols(pts)
    assert out["slope"] == pytest.approx(slope, abs=1e-9)
    assert out["intercept"] == pytest.approx(intercept, abs=1e-9)
    assert out["r2"] == pytest.approx(r2, abs=1e-9)
    assert out["vocab_size"] == len(cf)
    assert out["total_tokens"] == sum(cf.values())
    assert out["slope"] < 0


def _py_js(pa, pb):
    js = 0.0
    for t in set(pa) | set(pb):
        p, q = pa.get(t, 0.0), pb.get(t, 0.0)
        m = (p + q) / 2.0
        if p:
            js += 0.5 * p * math.log(p / m)
        if q:
            js += 0.5 * q * math.log(q / m)
    return js


def _dist(texts):
    c = {}
    for text in texts:
        for t in spec.tokenize(text):
            c[t] = c.get(t, 0) + 1
    tot = sum(c.values())
    return {t: n / tot for t, n in c.items()}


def test_js_divergence_matches_python(spark):
    out = {
        (r["group_a"], r["group_b"]): r["js"]
        for r in js_divergence(_df(spark), "g").collect()
    }
    groups = {}
    for _, text, g in DOCS:
        groups.setdefault(g, []).append(text)
    for (ga, gb), js in out.items():
        want = _py_js(_dist(groups[ga]), _dist(groups[gb]))
        assert js == pytest.approx(want, abs=1e-9), (ga, gb)
    assert len(out) == 3  # (a,b) (a,c) (b,c)


def test_js_identical_groups_zero(spark):
    rows = [(0, "same words here", "x"), (1, "same words here", "y")]
    out = js_divergence(_df(spark, rows), "g").collect()[0]
    assert out["js"] == pytest.approx(0.0, abs=1e-12)


def test_js_disjoint_support_is_ln2(spark):
    rows = [(0, "alpha beta gamma", "x"), (1, "delta epsilon zeta", "y")]
    out = js_divergence(_df(spark, rows), "g").collect()[0]
    assert out["js"] == pytest.approx(math.log(2.0), abs=1e-12)
    assert out["n_shared"] == 0


def _var_fns():
    # local defs: cloudpickle ships them by value (the tests package is
    # not importable on executors)
    def var_map(grp):
        v = grp["value"]
        return {"n": int(len(v)), "s": float(v.sum()),
                "ss": float((v * v).sum())}

    def var_reduce(states):
        n = sum(s["n"] for s in states)
        sm = sum(s["s"] for s in states)
        ss = sum(s["ss"] for s in states)
        return {"n": n, "mean": sm / n, "var": (ss - sm * sm / n) / n}

    return var_map, var_reduce


def test_scripted_metric_variance(spark):
    rows = [(f"t{i % 3}", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, value double")
    var_map, var_reduce = _var_fns()
    out = {
        r["k"]: (r["n"], r["mean"], r["var"])
        for r in scripted_metric(
            df, ["k"], var_map, var_reduce, "n long, mean double, var double"
        ).collect()
    }
    for k in ("t0", "t1", "t2"):
        vals = [v for kk, v in rows if kk == k]
        n = len(vals)
        mean = sum(vals) / n
        var = sum((x - mean) ** 2 for x in vals) / n
        assert out[k][0] == n
        assert out[k][1] == pytest.approx(mean, abs=1e-9)
        assert out[k][2] == pytest.approx(var, abs=1e-6)


def test_scripted_metric_partition_invariant(spark):
    rows = [(f"t{i % 2}", float(i * i % 97)) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, value double")
    var_map, var_reduce = _var_fns()
    a = scripted_metric(
        df.repartition(1), ["k"], var_map, var_reduce,
        "n long, mean double, var double").collect()
    b = scripted_metric(
        df.repartition(13), ["k"], var_map, var_reduce,
        "n long, mean double, var double").collect()
    da = {r["k"]: (r["n"], round(r["mean"], 9), round(r["var"], 9))
          for r in a}
    db = {r["k"]: (r["n"], round(r["mean"], 9), round(r["var"], 9))
          for r in b}
    assert da == db


def test_scripted_metric_keeps_key_types(spark):
    """Numeric bucket keys keep their Spark type (r3; ADVICE r2 flagged
    the forced-string key schema as silently stringifying int keys)."""
    rows = [(i % 3, float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "k int, value double")
    var_map, var_reduce = _var_fns()
    out = scripted_metric(
        df, ["k"], var_map, var_reduce, "n long, mean double, var double"
    )
    assert out.schema["k"].dataType.simpleString() == "int"
    got = {r["k"]: r["n"] for r in out.collect()}
    assert got == {0: 10, 1: 10, 2: 10}
