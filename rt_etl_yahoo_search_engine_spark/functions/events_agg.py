"""Event-stream aggregations with ES parity: calendar-interval date
histograms and top_metrics (arg-max metric rows).

* date_histogram_calendar — ES `date_histogram` with `calendar_interval`
  (week/month/quarter/year): buckets are CALENDAR units, not fixed
  widths — weeks snap to Monday, months vary in length — which a
  tumbling epoch-arithmetic window cannot express.  `date_trunc` is the
  engine-portable definition (Spark and ANSI SQL agree, ISO weeks).
  Pure codegen + one partial-aggregated groupBy: scales as a scan.

* top_metrics — ES `top_metrics`: per bucket, the metric columns taken
  FROM THE ROW that maximizes the sort column (arg-max, not max) — the
  "latest value per key" / "row at the peak" primitive.  Implemented as
  a max over a (sort, tiebreak, metrics...) struct: Spark's struct
  ordering is lexicographic, so one partial-aggregable `max` computes a
  DETERMINISTIC arg-max (explicit tiebreak column, unlike max_by's
  arbitrary tie behaviour) with map-side combine — no window, no
  shuffle beyond the one groupBy, skew-safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CAL = {"week", "month", "quarter", "year", "day", "hour"}


def date_histogram_calendar(
    events: DataFrame,
    interval: str,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """(bucket_start, <keys...>, n[, sum_value]): event counts (and an
    optional value sum) per calendar bucket — ES date_histogram with
    calendar_interval=`interval`.  Empty buckets are absent
    (min_doc_count=1 shape)."""
    if interval not in _CAL:
        raise ValueError(f"calendar interval must be one of {sorted(_CAL)}")
    keys = keys or []
    aggs = [F.count("*").alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        events.withColumn(
            "bucket_start", F.date_trunc(interval, F.col(ts_col))
        )
        .groupBy("bucket_start", *keys)
        .agg(*aggs)
    )


def top_metrics(
    df: DataFrame,
    bucket_cols: list[str],
    sort_col: str,
    metric_cols: list[str],
    tiebreak_col: str,
    descending: bool = True,
) -> DataFrame:
    """(<bucket_cols...>, <metric_cols...>): each metric taken from the
    single row per bucket with the max (default) or min `sort_col`,
    ties broken by max/min `tiebreak_col` — ES top_metrics(size=1).
    NULL sort values lose to every non-NULL (rows with NULL in the
    struct head would win Spark's struct max, so they are filtered —
    ES likewise ignores missing sort values)."""
    packed = F.struct(
        F.col(sort_col), F.col(tiebreak_col), *[F.col(c) for c in metric_cols]
    )
    agg = (F.max if descending else F.min)(packed).alias("_top")
    out = (
        df.filter(F.col(sort_col).isNotNull())
        .groupBy(*bucket_cols)
        .agg(agg)
    )
    return out.select(
        *bucket_cols,
        *[F.col(f"_top.{c}").alias(c) for c in [sort_col] + metric_cols],
    )


AUTO_HISTO_LADDER = ["minute", "hour", "day", "week", "month", "year"]


def auto_date_histogram(
    events: DataFrame,
    target_buckets: int,
    ts_col: str = "ts",
) -> DataFrame:
    """(interval, bucket_start, n) — ES `auto_date_histogram`: the engine
    PICKS the interval instead of the caller — the smallest calendar
    interval from the ladder minute < hour < day < week < month < year
    whose distinct-bucket count is <= ``target_buckets`` (falling back
    to 'year' if none is), then buckets by it.  `interval` is a constant
    column naming the choice (ES reports `interval` in the response).

    The selection pass computes every ladder rung's count(DISTINCT
    date_trunc(...)) in ONE aggregation over the events (map-side
    partial distincts), collects the single decision row, and the
    bucketing pass is an ordinary calendar histogram — two scans total,
    no per-rung jobs."""
    counts = events.select(
        *[
            F.count_distinct(F.date_trunc(iv, F.col(ts_col))).alias(iv)
            for iv in AUTO_HISTO_LADDER
        ]
    ).collect()[0]
    chosen = AUTO_HISTO_LADDER[-1]
    for iv in AUTO_HISTO_LADDER:
        if counts[iv] <= target_buckets:
            chosen = iv
            break
    return (
        events.withColumn(
            "bucket_start", F.date_trunc(chosen, F.col(ts_col))
        )
        .groupBy("bucket_start")
        .agg(F.count("*").alias("n"))
        .select(F.lit(chosen).alias("interval"), "bucket_start", "n")
    )


def cumulative_cardinality(
    events: DataFrame, ts_col: str = "ts", id_col: str = "user_id"
) -> DataFrame:
    """(day, n_new, cum_users) — ES `cumulative_cardinality` pipeline
    aggregation over a daily date_histogram: distinct ``id_col`` seen up
    to and including each bucket.  Exact, where ES accumulates HLL
    sketches.

    Scale shape: the naive form (per-day distinct sets, then a running
    union) re-shuffles the corpus per bucket; instead each id reduces to
    its FIRST-SEEN day (one groupBy over ids, map-side combine), the
    per-day new-id counts are bucket-scale, and the running sum is a
    window over the tiny bucket table (left-joined onto every day the
    histogram emits, zero-filled)."""
    from pyspark.sql import Window

    day = F.date_trunc("day", F.col(ts_col))
    first_seen = (
        events.groupBy(id_col)
        .agg(F.min(day).alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("n_new"))
    )
    all_days = events.select(day.alias("day")).distinct()
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        all_days.join(first_seen, "day", "left")
        .select("day", F.coalesce("n_new", F.lit(0)).alias("n_new"))
        .withColumn("cum_users", F.sum("n_new").over(w).cast("long"))
    )


def normalize_pipeline(
    events: DataFrame, ts_col: str = "ts"
) -> DataFrame:
    """(day, n, percent_of_sum) — ES `normalize` pipeline aggregation
    (method percent_of_sum) over a daily date_histogram of event counts.
    The total rides a broadcast single-row cross join — no
    one-partition window over the bucket table, no driver collect."""
    day = F.date_trunc("day", F.col(ts_col))
    buckets = events.groupBy(day.alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    total = buckets.agg(F.sum("n").alias("total"))
    return buckets.crossJoin(F.broadcast(total)).select(
        "day",
        "n",
        F.round(F.col("n") / F.col("total") * 100, 6).alias(
            "percent_of_sum"
        ),
    )


def date_histogram_min0(
    events: DataFrame,
    cond,
    unit: str = "hour",
) -> DataFrame:
    """(bucket, n) — ES date_histogram with ``min_doc_count: 0`` and
    ``extended_bounds`` pinned to the data range: EVERY calendar bucket
    between the full relation's min and max timestamp appears, with n =
    rows satisfying ``cond`` (a boolean Column), zero when none — the
    gap-free series a dashboard or anomaly detector needs.

    The spine is one aggregated (lo, hi) row exploded through
    ``sequence(lo, hi, interval)`` — bucket-scale, never a driver-side
    loop — left-joined by the filtered counts (filter pushed to the
    scan)."""
    trunc = F.date_trunc(unit, F.col("ts"))
    bounds = events.agg(
        F.min(trunc).alias("lo"), F.max(trunc).alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col("lo"), F.col("hi"), F.expr(f"interval 1 {unit}")
            )
        ).alias("bucket")
    )
    counts = (
        events.filter(cond)
        .groupBy(trunc.alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    return spine.join(counts, "bucket", "left").select(
        "bucket", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )


def bucket_selector(
    events: DataFrame,
    min_n: int,
    min_avg_value: float,
    ts_col: str = "ts",
) -> DataFrame:
    """(day, n, avg_value) — ES `bucket_selector` pipeline aggregation:
    parent buckets (daily histogram with count + avg(value)) are KEPT
    only where the bucket-level script holds (n >= min_n AND avg_value
    >= min_avg_value) — the HAVING of the aggs DSL.  The predicate
    runs on the bucket table (post-aggregation), so selectivity costs
    nothing at corpus scale."""
    return (
        events.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.avg("value").alias("avg_value"),
        )
        .filter(
            (F.col("n") >= min_n)
            & (F.col("avg_value") >= min_avg_value)
        )
        .select("day", "n", F.round("avg_value", 6).alias("avg_value"))
    )


def moving_percentiles(
    events: DataFrame,
    window_days: int = 7,
    q: float = 0.5,
    ts_col: str = "ts",
) -> DataFrame:
    """(day, n, moving_pq) — ES `moving_percentiles` pipeline agg: the
    exact linear-interpolated q-percentile of the daily event COUNT over
    a trailing ``window_days`` window (shorter at the series head, like
    ES).  Exact where ES slides t-digests.

    The corpus reduces to one row per day first; the windowed
    percentile then runs on the bucket table — corpus-scale work is one
    groupBy, the sliding pass is bucket-scale."""
    from pyspark.sql import Window

    daily = events.groupBy(
        F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(F.count("*").cast("long").alias("n"))
    w = (
        Window.orderBy("day")
        .rowsBetween(-(window_days - 1), Window.currentRow)
    )
    return daily.select(
        "day",
        "n",
        F.round(
            F.percentile(F.col("n"), F.lit(float(q))).over(w), 6
        ).alias("moving_pq"),
    )


def date_range_agg(
    events: DataFrame,
    ranges: list[tuple[str, str | None, str | None]],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(range_key, n, total) — ES `date_range` aggregation: NAMED
    half-open [from, to) timestamp buckets (None = unbounded), allowed
    to overlap; n = event count, total = sum(value_col) with 0 / 0.0
    for an empty range (ES keeps requested ranges in the response).

    One conditional-aggregate scan: each range is a pair of when()
    partial-aggregable columns, unpivoted to rows with stack() after
    the reduction — no per-range job, no corpus-scale shuffle (one
    exchange of the single partial row)."""
    ts = F.col(ts_col)
    aggs = []
    for i, (_key, lo, hi) in enumerate(ranges):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (ts >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            cond = cond & (ts < F.lit(hi).cast("timestamp"))
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"c_{i}")
        )
        aggs.append(
            F.sum(
                F.when(cond, F.col(value_col)).otherwise(F.lit(0.0))
            ).alias(f"s_{i}")
        )
    row = events.agg(*aggs)
    stack = ", ".join(
        f"'{key}', c_{i}, s_{i}" for i, (key, _lo, _hi) in enumerate(ranges)
    )
    return row.select(
        F.expr(
            f"stack({len(ranges)}, {stack}) AS (range_key, n, total)"
        )
    )


def serial_diff(
    events: DataFrame,
    cond,
    unit: str = "hour",
    lag: int = 1,
) -> DataFrame:
    """(bucket, n, diff) — ES ``serial_diff`` pipeline aggregation riding
    a gap-free date histogram: diff = n(bucket) − n(bucket − lag units),
    null for the series' first `lag` buckets (ES emits no serial_diff
    value until the lag window is full).  The histogram underneath is
    date_histogram_min0's zero-filled spine, so the lag is measured in
    CALENDAR buckets, not in present-bucket sequence — the seasonal
    differencing (e.g. lag=24 on hours, lag=7 on days) an anomaly
    detector needs.

    Scale shape: the events scan partial-aggregates to bucket-scale
    rows (one per calendar unit in the data range — metadata scale next
    to the 100 TB event relation), and only that series enters the
    single-series lag window; pipeline aggs are series transforms by
    definition, so the unpartitioned window is over O(range/unit) rows,
    never over events."""
    from pyspark.sql import Window

    base = date_histogram_min0(events, cond, unit=unit)
    w = Window.orderBy("bucket").rowsBetween(-int(lag), -int(lag))
    # rowsBetween is exact here BECAUSE the spine is gap-free: row
    # distance == calendar distance.
    return base.select(
        "bucket",
        "n",
        (F.col("n") - F.sum("n").over(w)).cast("long").alias("diff"),
    )


def rate_agg(
    events: DataFrame,
    interval: str = "month",
    rate_unit: str = "day",
    value_col: str | None = None,
) -> DataFrame:
    """(bucket_start, n, rate) — ES ``rate`` aggregation inside a
    calendar date_histogram: per calendar `interval` bucket, the event
    count (or ``value_col`` sum) RESCALED to a per-`rate_unit` figure by
    the bucket's true calendar length — February's per-day rate divides
    by 28/29, January's by 31 (the normalization a fixed-width tumbling
    window gets wrong).  Pure codegen + one partial-aggregated groupBy:
    scales as a scan, no shuffle beyond the bucket agg."""
    if interval not in _CAL:
        raise ValueError(f"interval must be one of {sorted(_CAL)}")
    bucket = F.date_trunc(interval, F.col("ts"))
    metric = (
        F.count("*").cast("double")
        if value_col is None
        else F.sum(value_col)
    )
    agg = events.groupBy(bucket.alias("bucket_start")).agg(
        metric.alias("m"), F.count("*").cast("long").alias("n")
    )
    nxt = F.col("bucket_start") + F.expr(f"interval 1 {interval}")
    if rate_unit == "day":
        span = F.datediff(nxt.cast("date"), F.col("bucket_start").cast("date"))
    elif rate_unit == "hour":
        span = (nxt.cast("long") - F.col("bucket_start").cast("long")) / 3600
    else:
        raise ValueError("rate_unit must be 'day' or 'hour'")
    return agg.select(
        "bucket_start",
        "n",
        (F.col("m") / span.cast("double")).alias("rate"),
    )


def eql_sequence(
    events: DataFrame,
    stages: list[str],
    maxspan_s: int | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    stage_col: str = "event_type",
) -> DataFrame:
    """(key, e1_id..ek_id, start_ts, span_s) — EQL-style ``sequence by
    <key> with maxspan`` (the Elastic Event Query Language sequence
    query, re-expressed as the deterministic earliest-chain funnel):
    every stage-1 event opens a candidate sequence; each later stage
    binds to the EARLIEST event of its type strictly after the
    previously bound event (same key); the sequence completes iff all
    stages bind and the last event lies within ``maxspan_s`` seconds of
    the first.  One output row per completed candidate (sequences may
    share later-stage events — the standard funnel-analysis semantics,
    which unlike EQL's streaming NFA has a closed-form relational
    definition both engines reproduce exactly).

    Scale shape: one per-key position index (Window.partitionBy(key)
    row_number — per-key state, never a global sort) plus, for each
    stage j >= 2, a conditional forward-looking min over the SAME
    partitioned window spec ("position of my next stage-j event") —
    all k-1 window columns share one sort.  The chain is then k-2
    narrow equi-joins on (key, pos) carrying only ids/timestamps, with
    the maxspan bound applied after every join (monotone in the chain,
    so partial sequences are pruned at the earliest possible stage).
    No state machine, no UDF, no per-key collect."""
    from pyspark.sql import Window

    if len(stages) < 2:
        raise ValueError("eql_sequence needs >= 2 stages")
    w_order = Window.partitionBy("key").orderBy(F.asc("ts"), F.asc("eid"))
    w_fol = w_order.rowsBetween(1, Window.unboundedFollowing)
    base = events.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("eid"),
        F.col(stage_col).alias("stage"),
    ).withColumn("pos", F.row_number().over(w_order))
    for j in range(2, len(stages) + 1):
        base = base.withColumn(
            f"nxt{j}",
            F.min(
                F.when(F.col("stage") == stages[j - 1], F.col("pos"))
            ).over(w_fol),
        )
    cur = (
        base.filter(F.col("stage") == stages[0])
        .select(
            "key",
            F.col("eid").alias("e1_id"),
            F.col("ts").alias("start_ts"),
            F.col("nxt2").alias("_o"),
        )
        .filter(F.col("_o").isNotNull())
    )
    for j in range(2, len(stages) + 1):
        nxt_cols = (
            [F.col(f"nxt{j + 1}").alias("_nxt")]
            if j < len(stages)
            else []
        )
        step = base.select(
            "key",
            F.col("pos").alias("_o"),
            F.col("eid").alias(f"e{j}_id"),
            F.col("ts").alias(f"_ts{j}"),
            *nxt_cols,
        )
        cur = cur.join(step, ["key", "_o"]).drop("_o")
        if maxspan_s is not None:
            cur = cur.filter(
                F.unix_timestamp(F.col(f"_ts{j}"))
                - F.unix_timestamp(F.col("start_ts"))
                <= maxspan_s
            )
        if j < len(stages):
            cur = cur.filter(F.col("_nxt").isNotNull()).withColumnRenamed(
                "_nxt", "_o"
            )
    k = len(stages)
    return cur.select(
        "key",
        *[F.col(f"e{j}_id") for j in range(1, k + 1)],
        "start_ts",
        (
            F.unix_timestamp(F.col(f"_ts{k}"))
            - F.unix_timestamp(F.col("start_ts"))
        ).cast("long").alias("span_s"),
    )
