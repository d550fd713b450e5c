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

from pyspark.sql import DataFrame
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
