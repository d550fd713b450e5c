"""serial_diff and rate aggregations (functions/events_agg.py) against
hand-computed oracles, including the calendar-length normalization and
gap (zero-bucket) behaviour."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark.functions.events_agg import (
    rate_agg,
    serial_diff,
)

ROWS = [
    # hour buckets: 00 -> 3 events, 01 -> 0 (gap), 02 -> 1, 03 -> 2
    (1, dt.datetime(2024, 1, 1, 0, 5), "a", 10.0),
    (2, dt.datetime(2024, 1, 1, 0, 15), "a", 20.0),
    (3, dt.datetime(2024, 1, 1, 0, 25), "b", 30.0),
    (4, dt.datetime(2024, 1, 1, 2, 5), "a", 40.0),
    (5, dt.datetime(2024, 1, 1, 3, 5), "a", 50.0),
    (6, dt.datetime(2024, 1, 1, 3, 45), "b", 60.0),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        ROWS, "event_id long, ts timestamp, event_type string, value double"
    )


def test_serial_diff_lag1_over_gap_free_spine(spark, events):
    got = {
        r["bucket"]: (r["n"], r["diff"])
        for r in serial_diff(events, F.lit(True), unit="hour", lag=1).collect()
    }
    d = dt.datetime
    assert got == {
        d(2024, 1, 1, 0): (3, None),      # first bucket: no lag value
        d(2024, 1, 1, 1): (0, -3),        # zero-filled gap participates
        d(2024, 1, 1, 2): (1, 1),
        d(2024, 1, 1, 3): (2, 1),
    }


def test_serial_diff_lag2_is_calendar_distance(spark, events):
    got = {
        r["bucket"]: r["diff"]
        for r in serial_diff(events, F.lit(True), unit="hour", lag=2).collect()
    }
    d = dt.datetime
    # diff(02) = n(02) - n(00) = 1 - 3; the empty 01 bucket counts as a
    # step because the spine is gap-free.
    assert got == {
        d(2024, 1, 1, 0): None,
        d(2024, 1, 1, 1): None,
        d(2024, 1, 1, 2): -2,
        d(2024, 1, 1, 3): 2,
    }


def test_serial_diff_condition_filters(spark, events):
    got = {
        r["bucket"]: (r["n"], r["diff"])
        for r in serial_diff(
            events, F.col("event_type") == "b", unit="hour", lag=1
        ).collect()
    }
    d = dt.datetime
    assert got == {
        d(2024, 1, 1, 0): (1, None),
        d(2024, 1, 1, 1): (0, -1),
        d(2024, 1, 1, 2): (0, 0),
        d(2024, 1, 1, 3): (1, 1),
    }


MONTH_ROWS = [
    # Jan 2024 (31 days): 2 events; Feb 2024 (29 days, leap): 3 events
    (1, dt.datetime(2024, 1, 10), 31.0),
    (2, dt.datetime(2024, 1, 20), 62.0),
    (3, dt.datetime(2024, 2, 1), 29.0),
    (4, dt.datetime(2024, 2, 14), 58.0),
    (5, dt.datetime(2024, 2, 28), 87.0),
]


@pytest.fixture(scope="module")
def month_events(spark):
    return spark.createDataFrame(
        MONTH_ROWS, "event_id long, ts timestamp, value double"
    )


def test_rate_count_per_day_uses_true_month_length(spark, month_events):
    got = {
        r["bucket_start"]: (r["n"], r["rate"])
        for r in rate_agg(month_events, "month", "day").collect()
    }
    jan, feb = dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)
    assert got[jan][0] == 2 and got[jan][1] == pytest.approx(2 / 31)
    # leap February: 29 days, not 28
    assert got[feb][0] == 3 and got[feb][1] == pytest.approx(3 / 29)


def test_rate_value_sum_per_day(spark, month_events):
    got = {
        r["bucket_start"]: r["rate"]
        for r in rate_agg(month_events, "month", "day", value_col="value").collect()
    }
    assert got[dt.datetime(2024, 1, 1)] == pytest.approx(93.0 / 31)
    assert got[dt.datetime(2024, 2, 1)] == pytest.approx(174.0 / 29)


def test_rate_rejects_bad_units(spark, month_events):
    with pytest.raises(ValueError):
        rate_agg(month_events, "fortnight", "day")
    with pytest.raises(ValueError):
        rate_agg(month_events, "month", "minute")
