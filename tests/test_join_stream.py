"""Stream-stream attribution join (streaming/join_stream): finalized
output equals the batch join over the same rows, the range condition
gates matches (same-user out-of-window pairs excluded, cross-user
pairs excluded), multi-view clicks emit one row per qualifying view,
and last_touch picks the latest view per click deterministically."""

import datetime as dt
import glob
import os
import shutil
import time

from rt_etl_yahoo_search_engine_spark.streaming.join_stream import (
    attribution_batch, attribution_stream, last_touch,
)

T0 = dt.datetime(2024, 9, 21, 12, 0, 0)
SCHEMA = ("event_id long, ts timestamp, user_id string, event_type string,"
          " value double, props string")


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _ev(eid, s, user, kind):
    return (eid, _ts(s), user, kind, 1.0, "{}")


EVENTS = [
    _ev(1, 0, "alice", "view"),
    _ev(2, 120, "alice", "click"),      # joins view 1 (2 min later)
    _ev(3, 60, "bob", "view"),
    _ev(4, 700, "bob", "click"),        # 640 s after view 3 > 10 min: no join
    _ev(5, 500, "alice", "view"),
    _ev(6, 560, "alice", "click"),      # joins views 1 (9:20 in) and 5
    _ev(7, 30, "carol", "click"),       # no prior view for carol
    _ev(8, 100, "dave", "view"),        # never clicked
]


def _write_file(spark, pages_dir, rows, idx):
    tmp = f"{pages_dir}_stage{idx}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(tmp)
    os.makedirs(pages_dir, exist_ok=True)
    src = glob.glob(f"{tmp}/part-*.parquet")[0]
    dst = f"{pages_dir}/{idx:04d}.parquet"
    shutil.copy(src, dst)
    os.utime(dst, (time.time() - 1000 + idx * 60,) * 2)


def _expected_pairs():
    return {(1, 2), (1, 6), (5, 6)}


def test_batch_join_pairs(spark):
    out = attribution_batch(spark.createDataFrame(EVENTS, SCHEMA))
    got = {(r["view_id"], r["click_id"]) for r in out.collect()}
    assert got == _expected_pairs()


def test_stream_equals_batch(spark, tmp_path):
    pages = str(tmp_path / "ev")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_file(spark, pages, EVENTS[:4], 0)
    _write_file(spark, pages, EVENTS[4:], 1)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages)
    )
    q = (
        attribution_stream(stream).writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["view_id"], r["click_id"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == _expected_pairs()


def test_last_touch_picks_latest_view(spark):
    joined = attribution_batch(spark.createDataFrame(EVENTS, SCHEMA))
    lt = {r["click_id"]: r["view_id"] for r in last_touch(joined).collect()}
    assert lt == {2: 1, 6: 5}  # click 6 attributes to the LATER view 5


def test_asof_join_matches_python(spark):
    """asof_join: latest right row per key at-or-before each left ts,
    with tolerance bound and unmatched-null semantics."""
    import datetime as _dt

    from rt_etl_yahoo_search_engine_spark.streaming.join_stream import (
        asof_join,
    )

    B = _dt.datetime(2024, 9, 21)

    def ts(s):
        return B + _dt.timedelta(seconds=s)

    left_rows = [
        ("u1", ts(100), 1), ("u1", ts(200), 2), ("u1", ts(50), 3),
        ("u2", ts(500), 4), ("u3", ts(10), 5),
    ]
    right_rows = [
        ("u1", ts(90), 11, "a"), ("u1", ts(150), 12, "b"),
        ("u1", ts(150), 13, "c"),   # tie at 150: larger rid (13) wins
        ("u2", ts(100), 14, "d"), ("u2", ts(499), 15, "e"),
    ]
    left = spark.createDataFrame(
        left_rows, "user string, lts timestamp, lid long")
    right = spark.createDataFrame(
        right_rows, "user string, rts timestamp, _asof_rid long, v string")

    out = {r["lid"]: (r["v"], r["rts"])
           for r in asof_join(left, right, "user", "lts", "rts",
                              unbounded=True).collect()}
    assert out[1] == ("a", ts(90))
    assert out[2] == ("c", ts(150))     # tie broken by rid
    assert out[3] == (None, None)       # no right row at/before 50
    assert out[4] == ("e", ts(499))
    assert out[5] == (None, None)       # key with no right rows

    # tolerance: only right rows within 60 s before qualify
    out_tol = {
        r["lid"]: r["v"]
        for r in asof_join(left, right, "user", "lts", "rts",
                           tolerance="60 seconds").collect()
    }
    assert out_tol[1] == "a"      # 90 within [40, 100]
    assert out_tol[2] == "c"      # 150 within [140, 200]
    assert out_tol[4] == "e"
    assert out_tol[3] is None and out_tol[5] is None


def test_asof_unbounded_requires_opt_in(spark):
    """Hot keys make the untolerated candidate relation per-key
    quadratic — unbounded lookback must be loud (r3, VERDICT r2 #6)."""
    import pytest

    from rt_etl_yahoo_search_engine_spark.streaming.join_stream import (
        asof_join,
    )

    # hot key: every left row pairs with every prior right row of "hot"
    left = spark.createDataFrame(
        [("hot", _ts(i), i) for i in range(20)],
        "user string, lts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [("hot", _ts(i), i, f"v{i}") for i in range(20)],
        "user string, rts timestamp, _asof_rid long, v string",
    )
    with pytest.raises(ValueError, match="unbounded=True"):
        asof_join(left, right, "user", "lts", "rts")
    # the loud opt-in still computes the correct asof result on the
    # hot key (latest right at-or-before each left ts)
    out = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, right, "user", "lts", "rts", unbounded=True
        ).collect()
    }
    assert out == {i: f"v{i}" for i in range(20)}
