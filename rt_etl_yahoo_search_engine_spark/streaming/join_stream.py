"""Streaming attribution join — stream-stream INNER join with
event-time range bounds and watermarks, the canonical Structured
Streaming two-stream operator (impression ⋈ conversion attribution;
here: for each search-result CLICK, the VIEW of the same user that led
to it within an attribution window).

Semantics: click c joins view v iff v.user_id = c.user_id and
v.ts <= c.ts <= v.ts + window.  The range condition is what lets the
engine BOUND state: with both sides watermarked `delay`, a view older
than (watermark - window) can never join a future click and its state
row is evicted; clicks buffer only until the watermark passes their
event time.  Without the range bound, stream-stream join state grows
forever — the non-viable shape at crawl scale; with it, state is
O(events per window+delay), runnable indefinitely.

A click inside several candidate views' windows emits ONE row per
matching view (join semantics, same as the batch oracle) — downstream
attribution picks last-touch with an ordinary per-click max, exactly
like the batch attribution_batch/last_touch pair here.

The stream == batch identity (tests/test_join_stream.py): finalized
append-mode output over the same rows equals the batch join, because
inner stream-stream joins emit rows as soon as both sides are present
and never retract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _prep(events: DataFrame, kind: str, alias: str) -> DataFrame:
    return (
        events.filter(F.col("event_type") == kind)
        .select(
            F.col("user_id").alias(f"{alias}_user"),
            F.col("event_id").alias(f"{alias}_id"),
            F.col("ts").alias(f"{alias}_ts"),
        )
    )


def attribution_join(
    views: DataFrame,
    clicks: DataFrame,
    window: str = "10 minutes",
) -> DataFrame:
    """(view_id, click_id, view_ts, click_ts) — inner join on user with
    click_ts in [view_ts, view_ts + window].  Works on two STREAMING
    frames (each must already carry a watermark) or two batch frames
    (the oracle path)."""
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {window}"))
    )
    return (
        views.join(clicks, cond, "inner")
        .select(
            F.col("v_id").alias("view_id"),
            F.col("c_id").alias("click_id"),
            F.col("v_ts").alias("view_ts"),
            F.col("c_ts").alias("click_ts"),
        )
    )


def attribution_stream(
    events: DataFrame,
    window: str = "10 minutes",
    delay: str = "5 minutes",
) -> DataFrame:
    """Streaming attribution over ONE event stream (split into view and
    click sides, both watermarked `delay`): append-ready inner join
    rows, state bounded by the range condition (module docstring)."""
    views = _prep(events, "view", "v").withWatermark("v_ts", delay)
    clicks = _prep(events, "click", "c").withWatermark("c_ts", delay)
    return attribution_join(views, clicks, window)


def attribution_batch(events: DataFrame,
                      window: str = "10 minutes") -> DataFrame:
    """The batch oracle: identical join over a static frame."""
    return attribution_join(
        _prep(events, "view", "v"), _prep(events, "click", "c"), window
    )


def last_touch(joined: DataFrame) -> DataFrame:
    """(click_id, view_id, view_ts, click_ts) — last-touch attribution:
    the LATEST qualifying view per click (view_ts DESC, view_id ASC
    ties).  Bucket-scale window over the join output."""
    w = Window.partitionBy("click_id").orderBy(
        F.desc("view_ts"), F.asc("view_id")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("click_id", "view_id", "view_ts", "click_ts")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance: str | None = None,
    unbounded: bool = False,
) -> DataFrame:
    """AS-OF join — for every left row, the single LATEST right row of
    the same key with right_ts <= left_ts (optionally within
    `tolerance`).  The time-series primitive Spark lacks as a native
    operator (kdb aj / pandas merge_asof / DuckDB ASOF JOIN): state
    snapshots, latest-price lookups, "what did this user last see".

    Ties on right_ts break by the largest right event id (`_asof_rid`
    if present, else nondeterministic — pass frames with an id column
    named by convention below for full determinism).

    Input contract: left(key, left_ts, ...), right(key, right_ts,
    _asof_rid, ...payload).  LEFT rows must be UNIQUE as full tuples —
    the final aggregate groups by every left column, so fully
    duplicate left rows collapse into one output row (carry a unique
    event-id column, as the driver entry does, if duplicates are
    possible).  Output: left row + right payload columns (null when no
    prior right row exists — LEFT asof semantics).

    Scale shape: one range-join on the key + a per-left-row max_by
    aggregate — the same candidates relation a SQL ASOF join builds;
    at 100 TB the win over a window-over-union approach is that only
    (key, ts)-matched candidate pairs shuffle, never a merged
    timeline.  WITHOUT `tolerance` the candidate relation is per-key
    QUADRATIC on hot keys (every left row pairs with every prior right
    row of its key), so unbounded use must be opted into explicitly
    with ``unbounded=True``; a `tolerance` bound caps candidates per
    row (and is what a streaming deployment needs anyway to bound
    state — see attribution_join)."""
    if tolerance is None and not unbounded:
        raise ValueError(
            "asof_join without `tolerance` builds a per-key-quadratic "
            "candidate relation on hot keys; pass tolerance='...' or "
            "opt in explicitly with unbounded=True"
        )
    lcols = left.columns
    rpayload = [c for c in right.columns if c not in (key, right_ts)]
    cond = (left[key] == right[key]) & (right[right_ts] <= left[left_ts])
    if tolerance is not None:
        cond = cond & (
            right[right_ts] >= left[left_ts] - F.expr(f"INTERVAL {tolerance}")
        )
    j = left.join(right, cond, "left")
    order = F.struct(
        right[right_ts].alias("_ts"),
        (right["_asof_rid"] if "_asof_rid" in right.columns
         else F.lit(0)).alias("_rid"),
    )
    aggs = [
        F.max_by(right[c], order).alias(c) for c in rpayload
    ] + [F.max_by(right[right_ts], order).alias(right_ts)]
    return j.groupBy(*[left[c] for c in lcols]).agg(*aggs)
