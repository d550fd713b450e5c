"""Bounded-memory sketches — the at-scale estimation knob next to this
engine's exact aggregates: KMV distinct counting, count-min frequency
estimation, and HyperLogLog distinct counting, each built from a
DETERMINISTIC cross-engine hash (15 hex chars of md5 parsed as a
60-bit integer — bit-identical in any engine that has md5), so every
sketch has an exact SQL oracle despite being an approximation
algorithm.

Why they matter at 100 TB: exact distinct/frequency over 10^12 rows
costs a corpus-scale shuffle on the key (cardinality_agg documents the
same trade); these sketches cut that to O(k) / O(d*w) / O(2^p) state
with map-side combinable partials — the shapes Spark's own
approx_count_distinct / count_min_sketch use internally, here in the
open with reproducible hashes and oracle-checkable outputs.

  kmv_distinct   k-minimum-values estimator: keep the k smallest
                 normalized hash values of the distinct keys; with u_k
                 the k-th smallest, E[distinct] = (k-1)/u_k.  Exact
                 when distinct < k.
  cms_counts     count-min sketch: d rows x w buckets of counters,
                 h_i(x) = md5(i||x) % w; estimate(x) = min_i
                 counter[i][h_i(x)] — an upper bound on the true count
                 (only hash collisions inflate it, never deflate).
  hll_distinct   HyperLogLog: register = top p hash bits, rank =
                 leading-zero count of the rest + 1 (computed with the
                 INTEGER bin-string length, no float log2), harmonic
                 mean estimate with the standard small-range linear
                 counting correction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 hex chars of md5 -> [0, 2^60)
_SPACE = float(2 ** HASH_BITS)


def _h60(col, salt: str | None = None):
    """60-bit deterministic hash of a string column (md5-prefix parse;
    same value as SQL CAST('0x' || substr(md5(x),1,15) AS BIGINT))."""
    base = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        base = F.concat(F.lit(salt), F.lit("|"), base)
    return F.conv(F.substring(F.md5(base), 1, 15), 16, 10).cast("long")


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One row: (k, kth_hash, estimate, exact, n_kept) — KMV distinct
    estimate of `col` plus the exact count for comparison (a real
    deployment drops the exact branch; it is here because the oracle
    gate compares both).  n_kept < k means the key space was smaller
    than k and estimate == exact by construction.

    Scale shape: distinct -> hash -> global k-smallest (TakeOrdered,
    map-side partial top-k; k rows reach the driver-side limit) — no
    full-key shuffle is REQUIRED by the sketch (the exact column here
    adds one, deliberately, for the comparison)."""
    hashes = (
        df.select(F.col(col).cast("string").alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
        .select(_h60("v").alias("h"))
    )
    k_small = hashes.orderBy(F.asc("h")).limit(k)
    agg = k_small.agg(
        F.count("*").alias("n_kept"), F.max("h").alias("kth_hash")
    )
    exact = (
        df.select(F.col(col).cast("string").alias("v"))
        .filter(F.col("v").isNotNull())
        .agg(F.countDistinct("v").alias("exact"))
    )
    return agg.crossJoin(exact).select(
        F.lit(int(k)).alias("k"),
        "kth_hash",
        F.when(
            F.col("n_kept") < k, F.col("exact").cast("double")
        ).otherwise(
            F.lit(float(k - 1)) / (F.col("kth_hash") / F.lit(_SPACE))
        ).alias("estimate"),
        "exact",
        F.col("n_kept").cast("long").alias("n_kept"),
    )


def cms_counts(df: DataFrame, col: str, probes: list[str],
               depth: int = 4, width: int = 512) -> DataFrame:
    """(probe, estimate, exact): count-min estimates for the probe keys
    next to their exact counts.  estimate >= exact always (min over
    depth rows of colliding counters).

    Scale shape: the sketch build is ONE groupBy over (row, bucket) —
    d*w result cells regardless of corpus size, map-side combinable;
    probe lookup touches d cells per probe."""
    vals = df.select(F.col(col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    rows = None
    for i in range(depth):
        r = vals.select(
            F.lit(i).alias("row"),
            (_h60("v", str(i)) % F.lit(int(width))).alias("bucket"),
        )
        rows = r if rows is None else rows.unionByName(r)
    cells = rows.groupBy("row", "bucket").agg(F.count("*").alias("c"))
    # probe bucket coordinates, driver-side with the same md5 parse
    import hashlib

    def h60_py(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    probe_rows = [
        (p, i, h60_py(f"{i}|{p}") % width)
        for p in sorted(set(probes))
        for i in range(depth)
    ]
    spark = df.sparkSession
    pr = spark.createDataFrame(
        probe_rows, "probe string, row int, bucket long"
    )
    est = (
        pr.join(cells, ["row", "bucket"], "left")
        .groupBy("probe")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("estimate"))
    )
    exact = vals.groupBy(F.col("v").alias("probe")).agg(
        F.count("*").alias("exact")
    )
    return est.join(exact, "probe", "left").select(
        "probe",
        F.col("estimate").cast("long").alias("estimate"),
        F.coalesce(F.col("exact"), F.lit(0)).cast("long").alias("exact"),
    )


def hll_distinct(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """One row: (m, v_zeros, raw_estimate, estimate, exact) — HLL
    distinct estimate with the standard small-range correction
    (linear counting m*ln(m/V) when raw <= 2.5m and V > 0).

    Rank uses the INTEGER length of the binary string of the low
    (60-p) hash bits — no float log2, so engine and oracle agree
    bit-for-bit on every register.

    Scale shape: one groupBy to 2^p register rows (map-side max),
    then a single-row reduce; the exact column is for the gate."""
    m = 2 ** p
    low_bits = HASH_BITS - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    vals = df.select(F.col(col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    h = vals.select(_h60("v").alias("h"))
    regs = h.select(
        (F.col("h") % F.lit(m)).alias("reg"),
        F.floor(F.col("h") / F.lit(m)).cast("long").alias("rest"),
    ).select(
        "reg",
        F.when(F.col("rest") == 0, F.lit(low_bits + 1)).otherwise(
            F.lit(low_bits) - F.length(F.bin("rest")) + F.lit(1)
        ).alias("rank"),
    ).groupBy("reg").agg(F.max("rank").alias("mx"))
    s = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("ssum"),
        F.count("*").alias("n_regs"),
    )
    exact = vals.agg(F.countDistinct("v").alias("exact"))
    out = s.crossJoin(exact).select(
        F.lit(m).alias("m"),
        (F.lit(m) - F.col("n_regs")).cast("long").alias("v_zeros"),
        (
            F.lit(alpha * m * m)
            / (F.col("ssum") + (F.lit(m) - F.col("n_regs")))
        ).alias("raw_estimate"),
        "exact",
    )
    return out.select(
        "m", "v_zeros",
        "raw_estimate",
        F.when(
            (F.col("raw_estimate") <= F.lit(2.5 * m))
            & (F.col("v_zeros") > 0),
            F.lit(float(m))
            * F.log(F.lit(float(m)) / F.col("v_zeros")),
        ).otherwise(F.col("raw_estimate")).alias("estimate"),
        "exact",
    )


def binned_quantiles(df: DataFrame, col: str, qs: list[float],
                     bin_width: float = 1.0) -> DataFrame:
    """(q, estimate, exact) — fixed-width-histogram quantile estimation
    (the HDR-histogram / Prometheus approach): values bucket into bins
    of `bin_width`, and each requested quantile is linearly
    interpolated WITHIN its containing bin from the cumulative counts.
    O(value_range / bin_width) state, map-side combinable — the
    bounded-memory alternative to the exact percentile sort at 10^12
    rows; `exact` (percentile_cont) rides along for the gate.

    Estimate contract (mirrored by the SQL oracle): with n values,
    target rank r = q*(n-1) (the percentile_cont convention), find the
    bin where the 0-based cumulative range [cum_before, cum_after)
    contains r, and interpolate

        est = bin_lo + bin_width * (r - cum_before) / bin_count

    (the Prometheus histogram_quantile interpolation); error is
    bounded by bin_width by construction."""
    vals = df.select(F.col(col).cast("double").alias("x")).filter(
        F.col("x").isNotNull()
    )
    w = float(bin_width)
    bins = (
        vals.select(F.floor(F.col("x") / F.lit(w)).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("c"))
    )
    from pyspark.sql import Window as _W

    cum = bins.withColumn(
        "cum_after",
        F.sum("c").over(
            _W.orderBy("b").rowsBetween(_W.unboundedPreceding, 0)
        ),
    ).withColumn("cum_before", F.col("cum_after") - F.col("c"))
    n = vals.agg(F.count("*").alias("n"))
    qdf = df.sparkSession.createDataFrame(
        [(float(q),) for q in sorted(qs)], "q double"
    )
    tgt = qdf.crossJoin(F.broadcast(n)).select(
        "q", (F.col("q") * (F.col("n") - F.lit(1))).alias("r")
    )
    est = (
        tgt.join(
            cum,
            (F.col("r") >= F.col("cum_before"))
            & (F.col("r") < F.col("cum_after")),
        )
        .select(
            "q",
            (
                F.col("b") * F.lit(w)
                + F.lit(w)
                * (F.col("r") - F.col("cum_before"))
                / F.col("c")
            ).alias("raw"),
            (F.col("b") * F.lit(w)).alias("lo"),
        )
        .select(
            "q",
            F.least(F.col("raw"), F.col("lo") + F.lit(w)).alias("estimate"),
        )
    )
    exact = (
        qdf.crossJoin(
            vals.agg(
                *[
                    F.expr(f"percentile(x, {float(q)!r})").alias(
                        f"_p{i}"
                    )
                    for i, q in enumerate(sorted(qs))
                ]
            )
        )
        .select(
            "q",
            F.coalesce(
                *[
                    F.when(F.col("q") == float(q), F.col(f"_p{i}"))
                    for i, q in enumerate(sorted(qs))
                ]
            ).alias("exact"),
        )
    )
    return est.join(exact, "q").select("q", "estimate", "exact")


def bloom_filter(df: DataFrame, col: str, probes: list[str],
                 m_bits: int = 8192, k_hashes: int = 4) -> DataFrame:
    """(probe, maybe_present, actually_present) — Bloom-filter
    membership: the key set folds into `m_bits` bits via `k_hashes`
    salted 60-bit hashes; a probe is maybe_present iff ALL its k bits
    are set.  No false negatives ever (actually_present implies
    maybe_present — the property the tests pin); false positives at
    the standard (1 - e^{-kn/m})^k rate.

    This is the semi-join pushdown primitive at 100 TB: ship the
    bit-set (m/8 bytes) instead of the key set, drop non-members at
    the scan before any join/shuffle — the same trick Spark's runtime
    bloom-filter join uses, here with the deterministic cross-engine
    hash so the filter (and its false positives!) is reproducible and
    oracle-checkable bit for bit.

    Scale shape: build = one scan to (bit) rows + distinct on a
    <= m-row relation (map-side combinable); probing touches k bits
    per probe."""
    vals = df.select(F.col(col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    bits = None
    for i in range(k_hashes):
        b = vals.select(
            (_h60("v", f"b{i}") % F.lit(int(m_bits))).alias("bit")
        )
        bits = b if bits is None else bits.unionByName(b)
    bitset = bits.distinct()

    import hashlib

    def h60_py(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    probe_rows = [
        (p, i, h60_py(f"b{i}|{p}") % m_bits)
        for p in sorted(set(probes))
        for i in range(k_hashes)
    ]
    spark = df.sparkSession
    pr = spark.createDataFrame(probe_rows, "probe string, i int, bit long")
    hit = (
        pr.join(bitset.withColumn("_set", F.lit(1)), "bit", "left")
        .groupBy("probe")
        .agg(
            (F.sum(F.coalesce(F.col("_set"), F.lit(0)))
             == F.lit(k_hashes)).alias("maybe_present")
        )
    )
    present = vals.distinct().select(
        F.col("v").alias("probe"), F.lit(True).alias("actually_present")
    )
    return hit.join(present, "probe", "left").select(
        "probe", "maybe_present",
        F.coalesce("actually_present", F.lit(False))
        .alias("actually_present"),
    )
