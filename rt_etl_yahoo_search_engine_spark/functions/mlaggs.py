"""Time-series / ML diagnostics over histogram buckets — exact,
deterministic forms of Elasticsearch's ML-flavored pipeline aggs:

  change_point            ES `change_point`: where did the series shift?
                          Exact CUSUM step detector: with S_k =
                          sum_{i<=k}(x_i - xbar), the change point is
                          argmax_k |S_k| (k < n), magnitude = mean after
                          minus mean before.  (ES fits several detectors
                          with p-values; CUSUM-argmax is the classic
                          deterministic step detector and needs no
                          simulation, so a SQL oracle reproduces it
                          bit-for-bit.)
  bucket_count_ks_test    ES `bucket_count_ks_test`: one-sample
                          Kolmogorov-Smirnov of the per-bucket count
                          distribution against uniform fractions —
                          D = max_k |ECDF(k) - k/n| over the ordered
                          buckets (ES's default `fractions` is uniform).
  bucket_correlation      ES `bucket_correlation` (count_correlation):
                          Pearson correlation between two series'
                          per-bucket counts on a shared gap-free bucket
                          spine (absent buckets count 0).

All three run on BUCKET-scale relations (the output of a date
histogram), so their cost is invisible at any corpus size; the corpus-
scale work is the one groupBy that built the histogram.  The reference
engine has nothing of this kind (its only aggregation is Python-side
string grouping, ref `src/utils/extract_text_utils.py:17-53`).

Everything is expression-only (windows + aggregates, no UDF); argmax
rows are picked with max_by over orderable structs — no driver logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _daily(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    return (
        events.withColumn("bucket", F.date_trunc("day", F.col(ts_col)))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def change_point(buckets: DataFrame, value_col: str = "n",
                 bucket_col: str = "bucket") -> DataFrame:
    """One row: (change_at, cusum, mean_before, mean_after, delta) —
    the CUSUM step change point of the ordered bucket series.  Ties on
    |S_k| break to the EARLIEST bucket.  Requires >= 2 buckets (the
    last bucket is not a candidate: a step needs a non-empty right
    side)."""
    stats = buckets.agg(
        F.avg(value_col).alias("xbar"),
        F.count("*").alias("n_buckets"),
        F.sum(value_col).alias("total"),
    )
    w = Window.orderBy(bucket_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        buckets.crossJoin(F.broadcast(stats))
        .withColumn("k", F.count("*").over(w))
        .withColumn("cum", F.sum(value_col).over(w))
        .withColumn(
            "s_k", F.col("cum") - F.col("k") * F.col("xbar")
        )
        .filter(F.col("k") < F.col("n_buckets"))
    )
    best = cum.groupBy().agg(
        F.max_by(
            F.struct(
                F.col(bucket_col).alias("change_at"),
                F.col("s_k"),
                F.col("cum"),
                F.col("k"),
                F.col("total"),
                F.col("n_buckets"),
            ),
            F.struct(
                F.abs(F.col("s_k")).alias("a"),
                (-F.unix_timestamp(bucket_col)).alias("neg_ts"),
            ),
        ).alias("row"),
    )
    return best.select(
        F.col("row.change_at").alias("change_at"),
        F.col("row.s_k").alias("cusum"),
        (F.col("row.cum") / F.col("row.k")).alias("mean_before"),
        (
            (F.col("row.total") - F.col("row.cum"))
            / (F.col("row.n_buckets") - F.col("row.k"))
        ).alias("mean_after"),
        (
            (F.col("row.total") - F.col("row.cum"))
            / (F.col("row.n_buckets") - F.col("row.k"))
            - F.col("row.cum") / F.col("row.k")
        ).alias("delta"),
    )


def ks_test_uniform(buckets: DataFrame, value_col: str = "n",
                    bucket_col: str = "bucket") -> DataFrame:
    """One row: (d_stat, at_bucket, n_buckets) — one-sample KS distance
    of the bucket-count distribution vs uniform fractions:
    D = max_k |cum_count(k)/total - k/n|.  Ties on D break earliest."""
    stats = buckets.agg(
        F.count("*").alias("nb"), F.sum(value_col).alias("total")
    )
    w = Window.orderBy(bucket_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        buckets.crossJoin(F.broadcast(stats))
        .withColumn("k", F.count("*").over(w))
        .withColumn("cum", F.sum(value_col).over(w))
        .withColumn(
            "d",
            F.abs(
                F.col("cum") / F.col("total") - F.col("k") / F.col("nb")
            ),
        )
    )
    key = F.struct(
        F.col("d"), (-F.unix_timestamp(bucket_col)).alias("neg_ts")
    )
    return cum.groupBy().agg(
        F.max(F.col("d")).alias("d_stat"),
        F.max_by(F.col(bucket_col), key).alias("at_bucket"),
        F.max(F.col("nb")).alias("n_buckets"),
    )


def ks_test_two_sample(a: DataFrame, b: DataFrame, value_col: str = "n",
                       bucket_col: str = "bucket") -> DataFrame:
    """One row: (d_stat, at_bucket) — two-sample KS distance between two
    bucketed count series over the UNION spine (absent buckets weigh
    0): D = max_k |ECDF_a(k) - ECDF_b(k)|."""
    an = a.select(F.col(bucket_col).alias("bucket"),
                  F.col(value_col).cast("double").alias("na"))
    bn = b.select(F.col(bucket_col).alias("bucket"),
                  F.col(value_col).cast("double").alias("nb"))
    j = an.join(bn, "bucket", "full").select(
        "bucket",
        F.coalesce("na", F.lit(0.0)).alias("na"),
        F.coalesce("nb", F.lit(0.0)).alias("nb"),
    )
    tot = j.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        j.crossJoin(F.broadcast(tot))
        .withColumn("ca", F.sum("na").over(w))
        .withColumn("cb", F.sum("nb").over(w))
        .withColumn(
            "d", F.abs(F.col("ca") / F.col("ta") - F.col("cb") / F.col("tb"))
        )
    )
    key = F.struct(F.col("d"), (-F.unix_timestamp("bucket")).alias("neg_ts"))
    return cum.groupBy().agg(
        F.max("d").alias("d_stat"),
        F.max_by(F.col("bucket"), key).alias("at_bucket"),
    )


def bucket_correlation(a: DataFrame, b: DataFrame, value_col: str = "n",
                       bucket_col: str = "bucket") -> DataFrame:
    """One row: (corr, n_buckets) — Pearson correlation of two count
    series joined on the union bucket spine (absent buckets count 0).
    Computed from exact integer-free sums in a fixed expression order
    (sxy - sx*sy/n over the sqrt product), so a SQL oracle reproduces
    the double exactly."""
    an = a.select(F.col(bucket_col).alias("bucket"),
                  F.col(value_col).cast("double").alias("x"))
    bn = b.select(F.col(bucket_col).alias("bucket"),
                  F.col(value_col).cast("double").alias("y"))
    j = an.join(bn, "bucket", "full").select(
        F.coalesce("x", F.lit(0.0)).alias("x"),
        F.coalesce("y", F.lit(0.0)).alias("y"),
    )
    s = j.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return s.select(
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / F.sqrt(
                (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                * (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
            )
        ).alias("corr"),
        F.col("n").cast("long").alias("n_buckets"),
    )


def daily_counts(events: DataFrame, event_type: str | None = None,
                 ts_col: str = "ts") -> DataFrame:
    """(bucket, n) — the day-histogram spine these diagnostics run on
    (one corpus-scale groupBy; everything above is bucket-scale)."""
    e = events
    if event_type is not None:
        e = e.filter(F.col("event_type") == event_type)
    return _daily(e, ts_col)
