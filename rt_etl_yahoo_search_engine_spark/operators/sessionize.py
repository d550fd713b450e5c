"""Adjacent-key grouping (ordered sessionization) as a DataFrame operator.

The reference's one nontrivial aggregation is ORDER-SENSITIVE: it folds a
document-ordered stream of text nodes into groups, opening a new group
whenever the identifier changes from the previous row — NOT a hash group-by
(ref: src/utils/extract_text_utils.py:17-53, new-group test :28-32).  Inside
the extractor that fold runs per document in Python; this module exposes the
same semantics as a reusable relational operator:

    group_id = cumulative sum over (identifier != lag(identifier))

which is the classic sessionization pattern (SURVEY.md §2.4): two window
functions, fully JVM-side, one shuffle on the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def adjacent_groups(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    ident_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Adds ``group_seq``: 0-based index of the run of equal ``ident_col``
    values in ``order_col`` order within each ``partition_col``."""
    order = [F.col(order_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(partition_col).orderBy(*order)
    changed = (
        F.col(ident_col).isNotNull()
        & (
            F.lag(ident_col).over(w).isNull()
            | (F.lag(ident_col).over(w) != F.col(ident_col))
        )
    ).cast("int")
    return df.withColumn(
        "group_seq",
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def adjacent_group_agg(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    ident_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse each adjacent run into one row: first/last order value, run
    length, and sum of ``value_col`` — the reference's group-fold shape."""
    runs = adjacent_groups(df, partition_col, order_col, ident_col, tiebreak_col)
    return runs.groupBy(partition_col, "group_seq").agg(
        F.first(ident_col).alias(ident_col),
        F.min(order_col).alias("run_start"),
        F.max(order_col).alias("run_end"),
        F.count("*").alias("run_len"),
        F.sum(value_col).alias("run_sum"),
    )
