"""Record linkage — blocked fuzzy matching (entity resolution), the
standard two-stage shape every dedup/linkage system uses at scale
(Fellegi-Sunter pipelines, Dedupe, Zingg): a cheap BLOCKING key cuts
the candidate space from |L|x|R| to the sum of block products, then an
edit-distance VERIFY runs only inside blocks, and each left record
keeps its best match.

This engine's MinHash/SimHash families (functions/dedup.py) solve the
set-similarity version of the same problem; linkage is the
string-identity version (names, titles, addresses) where Levenshtein
is the verifier — both JVM built-ins, no UDF.

Scale shape: blocking = one equi-join on the block key (hash join,
candidates only), verify = levenshtein on candidate pairs inside
codegen, best-match = one min-of-struct aggregate per left row.  The
classic failure mode — a hot block (empty/placeholder names) going
quadratic — is the same skew problem the index build solves with
doc-range sharding; here `max_block` drops oversized blocks loudly
(real deployments route them to a second blocking key)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_link(
    left: DataFrame,
    right: DataFrame,
    key: str,
    name_col: str,
    max_dist: int = 2,
    block_len: int = 4,
    max_block: int | None = None,
) -> DataFrame:
    """(left_key, match_key, dist): for each left row, the best right
    match — smallest Levenshtein distance <= max_dist among rows
    sharing the first `block_len` characters, ties to the smallest
    right key; (left_key, -1, -1) when no candidate qualifies
    (blocking miss or all beyond max_dist).

    left/right: (key, name_col) relations; keys are longs."""
    lb = left.select(
        F.col(key).alias("lk"),
        F.col(name_col).alias("ln"),
        F.substring(F.col(name_col), 1, block_len).alias("blk"),
    )
    rb = right.select(
        F.col(key).alias("rk"),
        F.col(name_col).alias("rn"),
        F.substring(F.col(name_col), 1, block_len).alias("blk"),
    )
    if max_block is not None:
        sizes = rb.groupBy("blk").agg(F.count("*").alias("_bs"))
        rb = rb.join(
            sizes.filter(F.col("_bs") <= max_block).select("blk"), "blk"
        )
    cand = lb.join(rb, "blk").withColumn(
        "dist", F.levenshtein("ln", "rn")
    ).filter(F.col("dist") <= max_dist)
    best = cand.groupBy("lk").agg(
        F.min(F.struct(F.col("dist"), F.col("rk"))).alias("b")
    ).select(
        F.col("lk").alias("left_key"),
        F.col("b.rk").alias("match_key"),
        F.col("b.dist").alias("dist"),
    )
    return (
        left.select(F.col(key).alias("left_key"))
        .join(best, "left_key", "left")
        .select(
            "left_key",
            F.coalesce("match_key", F.lit(-1)).alias("match_key"),
            F.coalesce("dist", F.lit(-1)).alias("dist"),
        )
    )


def corrupt_names(df: DataFrame, key: str, name_col: str) -> DataFrame:
    """(key, name): each name with ONE character deterministically
    dropped at position (key mod length) — the synthetic typo
    generator the linkage entry links back to its source (both the
    corruption and the recovery are exactly mirrorable in SQL)."""
    pos = (F.col(key) % F.length(F.col(name_col))).cast("int") + F.lit(1)
    corrupted = F.concat(
        F.substring(F.col(name_col), F.lit(1), pos - F.lit(1)),
        F.col(name_col).substr(
            pos + F.lit(1), F.length(F.col(name_col))
        ),
    )
    return df.select(
        F.col(key).alias(key), corrupted.alias(name_col)
    )
