"""Deterministic corpus sampling for training-data pipelines.

Training mixes need samples that are (a) reproducible across reruns and
engines, (b) stable under repartitioning/retries, and (c) cheap at
100 TB.  Spark's df.sample() is none of these (it is seed + partition
-layout dependent); the standard production answer is a HASH-THRESHOLD
sample: keep a row iff a cryptographic hash of its key falls below
fraction * keyspace.  Membership depends only on (key, salt), so the
same doc is kept on every run, on every engine, at every parallelism —
and the filter is a pure per-row codegen expression that pushes to the
scan (no shuffle, no state).

Portability trick shared with the DuckDB oracle: md5 hex is identical
everywhere, and uniform in each hex prefix, so "hash < fraction" is a
plain STRING comparison of the first 8 hex chars against the fraction's
32-bit hex threshold — no engine-specific int casts of hex needed.

Input contract: a DataFrame with (doc_id: long, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hex_threshold(fraction: float) -> str:
    """fraction in [0,1] -> 8-char lowercase hex of floor(f * 2^32)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return format(min(int(fraction * 2**32), 2**32 - 1), "08x")


def _key_hash(salt: str):
    """First 8 md5 hex chars of 'doc_id:salt' (lowercase both engines)."""
    return F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt))),
        1,
        8,
    )


def deterministic_sample(
    docs: DataFrame, fraction: float, salt: str = "s0"
) -> DataFrame:
    """Uniform hash-threshold sample: keeps each row iff
    md5(doc_id:salt)[:8] < hex(fraction * 2^32).  Exactly reproducible
    for a given (fraction, salt); disjoint salts give independent
    samples (eval/train splits).  Pure row-local filter — scales as a
    scan."""
    return docs.filter(_key_hash(salt) < F.lit(_hex_threshold(fraction)))


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "source",
    default_fraction: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum hash-threshold sample — the training-mix primitive
    ("20% of web, 100% of wiki, drop the rest"): each row's threshold is
    chosen by its `stratum_col` value via a codegen CASE, membership
    still depends only on (doc_id, salt).  Strata absent from
    `fractions` get `default_fraction` (0 = dropped).  Same scan-local
    scale shape as deterministic_sample — no per-stratum passes."""
    thr = F.lit(_hex_threshold(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == F.lit(stratum),
            F.lit(_hex_threshold(frac)),
        ).otherwise(thr)
    return docs.filter(_key_hash(salt) < thr)


def mix_weights(
    docs: DataFrame,
    targets: dict[str, float],
    stratum_col: str = "source",
) -> DataFrame:
    """(source, n_docs, n_tokens, natural_share, weight, sample_rate,
    expected_tokens) — the data-MIXING planning table a training
    pipeline computes before sampling (the DoReMi / Pile-style "target
    mix vs natural mix" step): per source, the natural token share, the
    re-weighting factor weight = target_share / natural_share, the
    downsampling rate rate = weight / max(weight) (the largest
    up-weighted source is kept whole, everything else thins — no
    duplication), and the resulting expected token count.  Feed
    ``sample_rate`` straight into :func:`stratified_sample`.

    One scan (token counts are scan-local), one tiny groupBy on the
    stratum, broadcast single-row total and max — source-table scale
    thereafter, no corpus-wide second pass at any size."""
    toks = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
    per = (
        docs.select(
            F.col(stratum_col).alias("source"),
            F.size(F.expr(toks)).alias("nt"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
    )
    tgt = docs.sparkSession.createDataFrame(
        sorted(targets.items()), "source string, target double"
    )
    total = per.agg(F.sum("n_tokens").alias("total"))
    j = (
        per.join(F.broadcast(tgt), "source")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "natural_share", F.col("n_tokens") / F.col("total")
        )
        .withColumn(
            "weight", F.col("target") / F.col("natural_share")
        )
    )
    mx = j.agg(F.max("weight").alias("max_w"))
    return (
        j.crossJoin(F.broadcast(mx))
        .withColumn("sample_rate", F.col("weight") / F.col("max_w"))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("natural_share", 6).alias("natural_share"),
            F.round("weight", 6).alias("weight"),
            F.round("sample_rate", 6).alias("sample_rate"),
            F.round(F.col("sample_rate") * F.col("n_tokens"), 2).alias(
                "expected_tokens"
            ),
        )
    )


def seeded_shuffle(
    docs: DataFrame, seed: str = "s0", prefix_len: int = 4
) -> DataFrame:
    """(rank, doc_id, shuffle_key) — deterministic global shuffle: every
    doc keyed by md5('doc_id:seed') (the cross-engine hash idiom above)
    and ranked by that key — simultaneously ES function_score
    `random_score` (seeded, consistent pseudo-random ordering) and the
    training-data global order randomization applied before sequence
    packing (hash order is reproducible across runs AND insensitive to
    input partitioning, which a rand()-based shuffle is not).

    Scale shape (two jobs, no global-order window): md5 hex keys are
    fixed-width, so the first ``prefix_len`` hex chars split the key
    space into 16^prefix_len ORDERED buckets (lexicographic prefix
    order == lexicographic key order).  Job 1 counts docs per bucket
    (map-side-combinable agg to a 16^prefix_len-row relation) and the
    driver turns the counts into per-bucket rank offsets — the same
    offset arithmetic as the url_ordered docmap build
    (operators/index_build._ordered_offsets).  Job 2 ranks each bucket
    independently (Window.partitionBy(bucket) — parallel, never a
    single-task global WindowExec) and adds the bucket offset.  Offsets
    depend only on key VALUES, never on partition layout, so the
    two-scan pattern cannot drift across partitionings.

    DETERMINISTIC-INPUT REQUIREMENT (this API is EAGER — the counts job
    runs at call time, so the input lineage is evaluated twice): `docs`
    must produce the same rows on re-evaluation.  A nondeterministic
    source (df.sample(), a rand()-derived filter, a changing table)
    can disagree between the counts pass and the rank pass, yielding
    duplicated or gapped ranks with no error — cache()/checkpoint such
    inputs before calling.  The same contract applies to
    select_by_budget and curriculum_order below.

    At 10^12 docs with prefix_len=4
    each of the 65 536 buckets sorts ~1.5e7 rows — bounded per-task
    work; raise prefix_len for more parallelism.  For training
    pipelines that only need shard-local shuffle, drop the rank and
    sortWithinPartitions(shuffle_key) instead — same key, no global
    exchange."""
    from pyspark.sql import Window

    keyed = docs.select(
        "doc_id",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":" + seed))
        ).alias("shuffle_key"),
    ).withColumn("_bkt", F.substring("shuffle_key", 1, prefix_len))
    counts = keyed.groupBy("_bkt").agg(F.count("*").alias("_cnt")).collect()
    counts.sort(key=lambda r: r["_bkt"])
    offs, acc = [], 0
    for r in counts:
        offs.append((r["_bkt"], acc))
        acc += r["_cnt"]
    off_df = docs.sparkSession.createDataFrame(
        offs or [("", 0)], "_bkt string, _off long"
    )
    w = Window.partitionBy("_bkt").orderBy("shuffle_key", "doc_id")
    return (
        keyed.join(F.broadcast(off_df), "_bkt")
        .withColumn(
            "rank",
            (F.col("_off") + F.row_number().over(w)).cast("long"),
        )
        .select("rank", "doc_id", "shuffle_key")
    )


def scroll_slices(docs: DataFrame, n_slices: int = 4) -> DataFrame:
    """(slice_id, n_docs, min_doc, max_doc) — ES sliced scroll: the
    result set split into ``n_slices`` disjoint, jointly-exhaustive
    slices a client scrolls in parallel.  Slice assignment is the first
    md5 hex nibble of the doc key bucketed into 16/n ranges — uniform,
    deterministic, computable identically engine-side and client-side
    (ES slices on _id hash the same way).  ``n_slices`` must divide 16.

    Scan-local assignment + one bucket-scale groupBy; a real scroll
    client filters `slice_id = i` with the same expression, which
    pushes to the scan."""
    if 16 % n_slices:
        raise ValueError(f"n_slices must divide 16, got {n_slices}")
    width = 16 // n_slices
    # F.locate only takes a literal substring — use the SQL form
    nib = F.expr(
        "locate(substring(md5(cast(doc_id as string)), 1, 1),"
        " '0123456789abcdef')"
    )
    return (
        docs.select(
            "doc_id",
            F.floor((nib - 1) / width).cast("int").alias("slice_id"),
        )
        .groupBy("slice_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


def dsir_weights(
    docs: DataFrame,
    is_target,
    n_buckets: int = 256,
) -> DataFrame:
    """(doc_id, n_grams, logw) for RAW documents — Data Selection via
    Importance Resampling (DSIR; Xie et al. 2023, arXiv:2302.03169), the
    standard hashed-n-gram importance weighting for "pick web documents
    that look like the target corpus":

      * features: unigrams + bigrams of the [a-z0-9]+ tokenization,
        hashed into `n_buckets` buckets (md5-hex prefix mod B — the
        engine-portable hash this module already uses);
      * two add-1-smoothed bag-of-hashed-ngrams multinomials: p over
        the TARGET docs (`is_target` boolean Column), q over the rest
        (the raw pool);
      * per raw doc, the log importance weight
        logw = Σ_b c_b(doc) · (ln p_b − ln q_b), where c_b counts the
        doc's gram occurrences in bucket b.  Resample/select by taking
        the top-N logw (the paper adds Gumbel noise for a soft sample;
        the deterministic top-N is the reproducible variant, and a
        seeded-hash Gumbel can be layered on the returned weights).

    Docs whose text yields no grams produce no row (they carry no
    evidence either way).

    Scale shape: one explode → map-side-partial groupBy((doc, bucket))
    at O(total tokens) narrow int rows; bucket totals are a second
    groupBy at ≤ B rows, broadcast back with the two scalar totals; the
    per-doc weight is one more partial-aggregable groupBy(doc).  No
    window, no driver loop, no UDF — linear in corpus size with three
    shuffles of bounded-width rows."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    toks = "regexp_extract_all(lower(text), '([a-z0-9]+)', 1)"
    grams = F.expr(
        f"concat({toks}, zip_with("
        f"  slice({toks}, 1, greatest(size({toks}) - 1, 0)),"
        f"  slice({toks}, 2, greatest(size({toks}) - 1, 0)),"
        "  (a, b) -> concat(a, ' ', b)))"
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10)
        .cast("long") % F.lit(int(n_buckets))
    ).alias("bucket")
    dbc = (
        docs.select(
            "doc_id",
            is_target.alias("is_t"),
            F.explode(grams).alias("gram"),
        )
        .select("doc_id", "is_t", bucket)
        .groupBy("doc_id", "is_t", "bucket")
        .agg(F.count("*").alias("c"))
        # dbc feeds BOTH the bucket totals and the per-doc weights; without
        # this the lazy plan re-scans + re-explodes the corpus per consumer
        # (3 full scans at 100 TB).  One narrow int relation cached instead.
        .persist()
    )
    tot = dbc.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_t"), F.col("c")).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("is_t"), F.col("c")).otherwise(0)).alias("cr"),
    )
    scal = tot.agg(
        F.sum("ct").alias("t_total"), F.sum("cr").alias("r_total")
    )
    b = float(n_buckets)
    ratios = tot.crossJoin(F.broadcast(scal)).select(
        "bucket",
        (
            F.log((F.col("ct") + 1.0) / (F.col("t_total") + b))
            - F.log((F.col("cr") + 1.0) / (F.col("r_total") + b))
        ).alias("logr"),
    )
    return (
        dbc.filter(~F.col("is_t"))
        .join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.col("logr")).alias("logw"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    k: int,
    seed: str = "ws0",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, weight, key, rank) — weighted random sampling WITHOUT
    replacement, the Efraimidis-Spirakis A-ES one-pass algorithm: each
    item draws u in (0,1] and keeps key = u^(1/w); the k LARGEST keys
    are a weighted sample without replacement.  u comes from the same
    deterministic md5-hash-to-unit-interval construction the other
    sampling ops use (salted by `seed`), so the sample is reproducible
    across runs/engines and the SQL oracle draws the identical sample.

    Items with weight <= 0 or null are excluded (zero-probability by
    the A-ES contract).  Ties on key (measure-zero for real weights)
    break id-ascending via the rank window.

    Scale shape: one scan computing the key expression in codegen +
    a global top-k (TakeOrderedAndProject: map-side partial top-k, k
    rows to the driver stage) — the exact shape training-mix samplers
    need at 10^12 docs, no full sort, no shuffle beyond k rows per
    partition."""
    def _u(idc):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(seed), F.lit("|"),
                                   idc.cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            + F.lit(1)
        ) / F.lit(float(2 ** 60))

    w = F.col(weight_col).cast("double")
    keyed = (
        docs.select(F.col(id_col).alias("id"), w.alias("weight"))
        .filter(F.col("weight") > 0)
        .select(
            "id", "weight",
            F.pow(_u(F.col("id")), F.lit(1.0) / F.col("weight"))
            .alias("key"),
        )
    )
    win = Window.orderBy(F.desc("key"), F.asc("id"))
    return (
        keyed.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("id", "weight", "key", F.col("rank").cast("int").alias("rank"))
    )


def select_by_budget(
    docs: DataFrame,
    score_col: str,
    tokens_col: str,
    budget: int,
    precision: int = 3,
) -> DataFrame:
    """(doc_id, <score_col>, <tokens_col>, cum_tokens) — greedy
    data-selection under a token budget: documents ranked by
    (score DESC, doc_id ASC) are kept while the running token total
    stays <= budget — the standard "take the best documents until the
    training budget is full" selection step of LLM-corpus curation
    (quality filters or DSIR emit the score; this performs the cut).

    Scale shape (no corpus-scale un-partitioned window — the same
    banded-offset pattern as seeded_shuffle): scores band by rounding
    to `precision` decimals; rounding is weakly monotone in the sort
    key, so bands are ordered segments of the global (score DESC,
    doc_id) order, and equal scores always share a band.  One map-side-
    combinable aggregate collects per-band (row count, token sum) — a
    relation bounded by (score range) * 10^precision, constant in
    corpus size — the driver folds it into per-band cumulative token
    offsets, and a Window.partitionBy(band) running sum ordered by
    (score DESC, doc_id) plus the band offset reproduces the exact
    global running total.  Bands whose offset already exceeds the
    budget are pruned BEFORE the window via the broadcast offsets
    relation, so only the kept prefix (plus its boundary band) ever
    reaches the window.

    EAGER + deterministic-input contract: see seeded_shuffle — the
    band-counts job evaluates the input lineage at call time and again
    at action time; nondeterministic inputs must be cached first."""
    from pyspark.sql import Window

    b = docs.withColumn("_band", F.round(F.col(score_col), precision))
    per = (
        b.groupBy("_band")
        .agg(F.count("*").alias("_c"), F.sum(tokens_col).alias("_t"))
        .collect()
    )
    per.sort(key=lambda r: -r["_band"])
    offs, acc = [], 0
    for r in per:
        offs.append((float(r["_band"]), acc))
        acc += r["_t"]
    off_df = docs.sparkSession.createDataFrame(
        offs or [(0.0, 0)], "_band double, _off long"
    )
    w = (
        Window.partitionBy("_band")
        .orderBy(F.desc(score_col), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.join(F.broadcast(off_df), "_band")
        .filter(F.col("_off") <= budget)  # band-level prefix prune
        .withColumn(
            "cum_tokens",
            (F.col("_off") + F.sum(tokens_col).over(w)).cast("long"),
        )
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", score_col, tokens_col, "cum_tokens")
    )


def curriculum_order(
    docs: DataFrame,
    score_col: str,
    n_bands: int = 4,
    seed: str = "s0",
    prefix_len: int = 2,
) -> DataFrame:
    """(rank, doc_id, band, shuffle_key) — curriculum ordering for
    training data: documents grouped into `n_bands` equal-width score
    bands (score must be in [0, 1], e.g. quality_scores' composite),
    bands emitted best-first, and documents WITHIN a band in seeded
    hash-shuffle order — the standard "quality curriculum with
    intra-band randomization" layout applied before sequence packing
    (deterministic across runs and partitionings, like seeded_shuffle).

    Scale shape: the global rank uses the banded-offset pattern twice
    over — the ordering key is (band DESC, md5 key ASC, doc_id), so the
    offset buckets are (band, hash prefix) pairs: one
    n_bands * 16^prefix_len-row count aggregate, driver-side offsets,
    then a Window.partitionBy(band, bucket) row_number plus the offset.
    Never a corpus-scale un-partitioned window.

    EAGER + deterministic-input contract: see seeded_shuffle — the
    counts job evaluates the input lineage at call time and again at
    action time; nondeterministic inputs must be cached first."""
    from pyspark.sql import Window

    band = F.least(
        F.floor(F.col(score_col) * n_bands).cast("int"),
        F.lit(n_bands - 1),
    )
    keyed = docs.select(
        "doc_id",
        band.alias("band"),
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":" + seed))
        ).alias("shuffle_key"),
    ).withColumn("_bkt", F.substring("shuffle_key", 1, prefix_len))
    counts = (
        keyed.groupBy("band", "_bkt").agg(F.count("*").alias("_cnt")).collect()
    )
    counts.sort(key=lambda r: (-r["band"], r["_bkt"]))
    offs, acc = [], 0
    for r in counts:
        offs.append((r["band"], r["_bkt"], acc))
        acc += r["_cnt"]
    off_df = docs.sparkSession.createDataFrame(
        offs or [(0, "", 0)], "band int, _bkt string, _off long"
    )
    w = Window.partitionBy("band", "_bkt").orderBy("shuffle_key", "doc_id")
    return (
        keyed.join(F.broadcast(off_df), ["band", "_bkt"])
        .withColumn(
            "rank", (F.col("_off") + F.row_number().over(w)).cast("long")
        )
        .select("rank", "doc_id", "band", "shuffle_key")
    )
