"""Numeric multi-field statistics (ES ``matrix_stats`` aggregation).

ES's matrix_stats returns, for every pair of numeric fields in scope,
the sample count, per-field mean, and the population covariance and
Pearson correlation between the pair (the diagonal carrying the field's
variance and correlation 1).  Reference semantics:
https://www.elastic.co/guide/en/elasticsearch/reference/current/
search-aggregations-matrix-stats-aggregation.html

Determinism across engines: float aggregation is order-sensitive, so a
naive ``covar_pop``/``corr`` would drift between Spark's partial aggs
and a single-threaded oracle.  Instead every input is cast to
DECIMAL(18,2) (the table's values are 2-dp exact) and only EXACT decimal
sums (sum x, sum x*y) leave the aggregation; the moments are then scalar
IEEE-double arithmetic on that one row, written with the same operation
order as the oracle SQL — bit-identical regardless of parallelism.  One
aggregation pass over the table (map-side combine), one single-row
post-processing select: no second scan, no shuffle beyond the final
reduce, linear to 100 TB.
"""

from __future__ import annotations

from itertools import combinations_with_replacement

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def matrix_stats(df: DataFrame, fields: list[str]) -> DataFrame:
    """(field_a, field_b, n, mean_a, covariance, correlation) for every
    ordered pair of ``fields`` — population covariance, Pearson corr."""
    dec = [F.col(f).cast("decimal(18,2)").alias(f) for f in fields]
    aggs = [F.count("*").alias("n")]
    for f in fields:
        aggs.append(F.sum(F.col(f)).cast("double").alias(f"s_{f}"))
    for a, b in combinations_with_replacement(fields, 2):
        aggs.append(
            F.sum(F.col(a) * F.col(b)).cast("double").alias(f"p_{a}_{b}")
        )
    row = df.select(*dec).agg(*aggs)

    def _p(a: str, b: str):
        # sums table stores the unordered pair once
        key = f"p_{a}_{b}" if f"p_{a}_{b}" in row.columns else f"p_{b}_{a}"
        return F.col(key)

    # cov(a,b) = (sum_ab - sum_a * sum_b / n) / n — scalar doubles, same
    # operation order as the oracle SQL text.
    def _cov(a: str, b: str):
        return (
            _p(a, b) - F.col(f"s_{a}") * F.col(f"s_{b}") / F.col("n")
        ) / F.col("n")

    pair_rows = []
    for a in fields:
        for b in fields:
            pair_rows.append(
                F.struct(
                    F.lit(a).alias("field_a"),
                    F.lit(b).alias("field_b"),
                    F.col("n").cast("long").alias("n"),
                    F.round(F.col(f"s_{a}") / F.col("n"), 6).alias(
                        "mean_a"
                    ),
                    F.round(_cov(a, b), 6).alias("covariance"),
                    F.round(
                        _cov(a, b)
                        / F.sqrt(_cov(a, a) * _cov(b, b)),
                        6,
                    ).alias("correlation"),
                )
            )
    return row.select(
        F.explode(F.array(*pair_rows)).alias("r")
    ).select("r.*")
