"""ML-diagnostic bucket aggs (functions/mlaggs): CUSUM change point,
one- and two-sample KS distance, bucket-count Pearson correlation —
each against a from-scratch Python reference on handcrafted series,
plus structural edge cases (clean step recovery, identical series,
anti-correlated series, union-spine zero-fill)."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark.functions.mlaggs import (
    bucket_correlation, change_point, daily_counts, ks_test_two_sample,
    ks_test_uniform,
)

BASE = dt.datetime(2024, 1, 1)


def _buckets(spark, values):
    rows = [(BASE + dt.timedelta(days=i), int(v))
            for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "bucket timestamp, n long")


def _py_cusum(values):
    n = len(values)
    xbar = sum(values) / n
    best_k, best_abs, best_s = None, -1.0, 0.0
    cum = 0.0
    for k, v in enumerate(values, start=1):
        cum += v
        s = cum - k * xbar
        if k < n and abs(s) > best_abs:
            best_k, best_abs, best_s = k, abs(s), s
    before = sum(values[:best_k]) / best_k
    after = sum(values[best_k:]) / (n - best_k)
    return best_k, best_s, before, after


STEP = [10, 11, 9, 10, 11, 30, 31, 29, 30, 31]


def test_change_point_recovers_clean_step(spark):
    out = change_point(_buckets(spark, STEP)).collect()[0]
    k, s, before, after = _py_cusum(STEP)
    assert out["change_at"] == BASE + dt.timedelta(days=k - 1)
    assert out["cusum"] == pytest.approx(s, abs=1e-9)
    assert out["mean_before"] == pytest.approx(before, abs=1e-9)
    assert out["mean_after"] == pytest.approx(after, abs=1e-9)
    assert out["delta"] == pytest.approx(after - before, abs=1e-9)


def test_change_point_direction_down(spark):
    vals = [50, 52, 48, 20, 19, 21, 20]
    out = change_point(_buckets(spark, vals)).collect()[0]
    k, _s, before, after = _py_cusum(vals)
    assert out["change_at"] == BASE + dt.timedelta(days=k - 1)
    assert out["delta"] < 0


def test_ks_uniform_matches_python(spark):
    vals = [5, 5, 5, 40, 5, 5, 5, 5]
    out = ks_test_uniform(_buckets(spark, vals)).collect()[0]
    total, n = sum(vals), len(vals)
    cum, best_d, best_k = 0, -1.0, None
    for k, v in enumerate(vals, start=1):
        cum += v
        d = abs(cum / total - k / n)
        if d > best_d:
            best_d, best_k = d, k
    assert out["d_stat"] == pytest.approx(best_d, abs=1e-12)
    assert out["at_bucket"] == BASE + dt.timedelta(days=best_k - 1)
    assert out["n_buckets"] == n


def test_ks_uniform_on_uniform_is_zero(spark):
    out = ks_test_uniform(_buckets(spark, [7] * 10)).collect()[0]
    assert out["d_stat"] == pytest.approx(0.0, abs=1e-12)


def test_ks_two_sample_identical_is_zero(spark):
    a = _buckets(spark, [3, 9, 1, 7])
    out = ks_test_two_sample(a, a).collect()[0]
    assert out["d_stat"] == pytest.approx(0.0, abs=1e-12)


def test_ks_two_sample_disjoint_spine(spark):
    # a lives entirely before b: D must reach 1.0 at a's last bucket.
    a = _buckets(spark, [5, 5])
    rows = [(BASE + dt.timedelta(days=10 + i), 5) for i in range(2)]
    b = spark.createDataFrame(rows, "bucket timestamp, n long")
    out = ks_test_two_sample(a, b).collect()[0]
    assert out["d_stat"] == pytest.approx(1.0, abs=1e-12)
    assert out["at_bucket"] == BASE + dt.timedelta(days=1)


def test_correlation_perfect_and_anti(spark):
    a = _buckets(spark, [1, 2, 3, 4, 5])
    b = _buckets(spark, [2, 4, 6, 8, 10])
    c = _buckets(spark, [5, 4, 3, 2, 1])
    assert bucket_correlation(a, b).collect()[0]["corr"] == pytest.approx(
        1.0, abs=1e-12)
    assert bucket_correlation(a, c).collect()[0]["corr"] == pytest.approx(
        -1.0, abs=1e-12)


def test_correlation_union_spine_zero_fill(spark):
    # b missing a's last bucket -> counted as 0 there.
    a = _buckets(spark, [1, 2, 3])
    b = _buckets(spark, [4, 5])
    out = bucket_correlation(a, b).collect()[0]
    xs, ys = [1.0, 2.0, 3.0], [4.0, 5.0, 0.0]
    n = 3.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    want = (sxy - sx * sy / n) / math.sqrt(
        (sxx - sx * sx / n) * (syy - sy * sy / n))
    assert out["corr"] == pytest.approx(want, abs=1e-12)
    assert out["n_buckets"] == 3


def test_daily_counts_spine(spark):
    rows = [
        (1, BASE + dt.timedelta(hours=h), "u", "click", 1.0, "{}")
        for h in (0, 1, 25)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id string, event_type string,"
        " value double, props string",
    )
    got = {r["bucket"]: r["n"] for r in daily_counts(ev, "click").collect()}
    assert got == {BASE: 2, BASE + dt.timedelta(days=1): 1}


def test_variable_width_histogram_gap_splits(spark):
    """Deterministic batch variant: clusters split at the largest
    adjacent-value gaps; counts and centroids are exact."""
    from rt_etl_yahoo_search_engine_spark.functions.numstats import (
        variable_width_histogram,
    )

    vals = [1.0, 1.1, 1.2, 5.0, 5.1, 20.0, 20.0, 20.2, 40.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    out = {
        r["bucket"]: (r["min_v"], r["max_v"], r["doc_count"])
        for r in variable_width_histogram(
            df, "value", buckets=4, precision=2
        ).collect()
    }
    # largest gaps: 40.0-20.2 (19.8), 20.0-5.1 (14.9), 5.0-1.2 (3.8)
    assert out == {
        0: (1.0, 1.2, 3),
        1: (5.0, 5.1, 2),
        2: (20.0, 20.2, 3),
        3: (40.0, 40.0, 1),
    }


def test_variable_width_histogram_fewer_values_than_buckets(spark):
    from rt_etl_yahoo_search_engine_spark.functions.numstats import (
        variable_width_histogram,
    )

    df = spark.createDataFrame([(1.0,), (2.0,)], "value double")
    out = variable_width_histogram(df, "value", buckets=5).collect()
    assert {r["bucket"] for r in out} == {0, 1}


def test_variable_width_histogram_banded_window(spark):
    """r4 hardening: the adjacent-gap lag must run under a PARTITIONED
    window (banded-offset pattern) so unbounded-range fields cannot plan
    a single-task window; gap semantics must be band-layout independent
    (adjacent pairs that straddle band edges still produce exact gaps)."""
    from rt_etl_yahoo_search_engine_spark.functions.numstats import (
        variable_width_histogram,
    )

    # wide range -> values land in many different bands; the largest gaps
    # straddle band boundaries
    vals = [float(x) for x in [0, 1, 2, 1000, 1001, 50000, 50002, 99999]]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    out = {
        r["bucket"]: (r["min_v"], r["max_v"], r["doc_count"])
        for r in variable_width_histogram(
            df, "value", buckets=4, precision=2
        ).collect()
    }
    # largest gaps: 99999-50002 (49997), 50000-1001 (48999), 1000-2 (998)
    assert out == {
        0: (0.0, 2.0, 3),
        1: (1000.0, 1001.0, 2),
        2: (50000.0, 50002.0, 2),
        3: (99999.0, 99999.0, 1),
    }
    plan = variable_width_histogram(
        df, "value", buckets=4, precision=2
    )._jdf.queryExecution().executedPlan().toString()
    # the rv-lag Window node must carry the band partition spec:
    # `windowspecdefinition(band#..., rv#... ASC ...)`
    import re as _re

    assert _re.search(r"windowspecdefinition\(band#\d+L?, rv#", plan), (
        "expected the adjacent-gap lag window to be partitioned by band"
    )


def test_variable_width_histogram_empty_input(spark):
    from rt_etl_yahoo_search_engine_spark.functions.numstats import (
        variable_width_histogram,
    )

    df = spark.createDataFrame([], "value double")
    assert variable_width_histogram(df, "value", buckets=3).collect() == []
