"""Calendar date histogram and top_metrics (functions/events_agg.py)
against pure-Python oracles."""

import datetime as dt

import pytest

from rt_etl_yahoo_search_engine_spark.functions.events_agg import (
    date_histogram_calendar,
    top_metrics,
)

ROWS = [
    # (event_id, ts, event_type, value)
    (1, dt.datetime(2024, 1, 28, 5), "a", 10.0),   # Sun  -> week of Jan 22
    (2, dt.datetime(2024, 1, 29, 6), "a", 20.0),   # Mon  -> week of Jan 29
    (3, dt.datetime(2024, 1, 31, 7), "b", 5.0),    # Wed  -> week of Jan 29
    (4, dt.datetime(2024, 2, 1, 8), "a", 7.0),     # Thu  -> week of Jan 29!
    (5, dt.datetime(2024, 2, 5, 9), "b", 1.0),     # Mon  -> week of Feb 5
    (6, dt.datetime(2024, 1, 29, 6), "b", 9.0),    # tie ts with event 2
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        ROWS, "event_id long, ts timestamp, event_type string, value double"
    )


def test_calendar_week_crosses_month_boundary(spark, events):
    got = {
        (r["bucket_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in date_histogram_calendar(
            events, "week", keys=["event_type"], value_col="value"
        ).collect()
    }
    # ISO weeks snap to Monday: Feb 1 lands in the Jan-29 week — a bucket
    # no fixed-width tumbling window over the epoch would produce.
    want = {
        (dt.datetime(2024, 1, 22), "a"): (1, 10.0),
        (dt.datetime(2024, 1, 29), "a"): (2, 27.0),
        (dt.datetime(2024, 1, 29), "b"): (2, 14.0),
        (dt.datetime(2024, 2, 5), "b"): (1, 1.0),
    }
    assert got == want


def test_calendar_month(spark, events):
    got = {
        r["bucket_start"]: r["n"]
        for r in date_histogram_calendar(events, "month").collect()
    }
    assert got == {dt.datetime(2024, 1, 1): 4, dt.datetime(2024, 2, 1): 2}


def test_bad_interval_rejected(spark, events):
    with pytest.raises(ValueError):
        date_histogram_calendar(events, "fortnight")


def test_top_metrics_argmax_with_tiebreak(spark, events):
    got = {
        r["event_type"]: (r["ts"], r["value"])
        for r in top_metrics(
            events, ["event_type"], "ts", ["value"], "event_id"
        ).collect()
    }
    # type a: latest ts is Feb 1 -> value 7; type b: latest is Feb 5 -> 1
    assert got == {
        "a": (dt.datetime(2024, 2, 1, 8), 7.0),
        "b": (dt.datetime(2024, 2, 5, 9), 1.0),
    }
    # tie case: two rows share the sort ts; higher event_id wins
    sub = spark.createDataFrame(
        [(2, dt.datetime(2024, 1, 29, 6), "x", 20.0),
         (6, dt.datetime(2024, 1, 29, 6), "x", 9.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    got2 = top_metrics(sub, ["event_type"], "ts", ["value"], "event_id").collect()
    assert got2[0]["value"] == 9.0     # event_id 6 > 2 wins the tie


def test_top_metrics_ascending_and_null_sort(spark):
    import datetime as dtm

    df = spark.createDataFrame(
        [
            (1, dtm.datetime(2024, 1, 1), "k", 5.0),
            (2, None, "k", 99.0),                      # null ts ignored
            (3, dtm.datetime(2024, 1, 3), "k", 7.0),
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )
    first = top_metrics(
        df, ["event_type"], "ts", ["value"], "event_id", descending=False
    ).collect()
    assert first[0]["value"] == 5.0
