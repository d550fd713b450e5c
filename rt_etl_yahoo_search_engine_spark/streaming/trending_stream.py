"""Streaming trending terms — windowed term counts over a document
stream with watermark-bounded state, the live "what is being crawled /
searched right now" panel every search deployment runs next to its
index (ES: a date_histogram + terms agg refreshed per window; here a
single continuous query).

Shape: tokenize JVM-side (the spec tokenizer as an expression — no
Python in the stream), explode to (window, term) via a TUMBLING
event-time window + groupBy count, watermark so Structured Streaming
finalizes windows and evicts their state once event time passes
window_end + delay.  Append output mode emits each (window, term, n)
row exactly once, when its window closes — the downstream top-k (a
bucket-scale sort per window, done batch-side on the sink table or by
`top_terms`) never sees a partial count.

State is O(active windows x distinct terms in them) — bounded by the
watermark, never corpus history; counts are map-side-combined partial
aggregates (the same partial+final shape as the batch tf aggregation
in operators/index_build).

The stream == batch identity (the gate tests/test_trending_stream.py
checks): the finalized rows equal `trending_batch` over the same rows,
because tumbling windows + watermark finalize each window exactly once
with all its (non-late) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TOKENS = r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)"


def _windowed_counts(docs: DataFrame, window: str, ts_col: str) -> DataFrame:
    return (
        docs.select(
            F.col(ts_col), F.explode(F.expr(_TOKENS)).alias("term")
        )
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "term")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "term",
            "n",
        )
    )


def trending_stream(
    docs: DataFrame,
    window: str = "1 minute",
    delay: str = "2 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """(window_start, window_end, term, n) — finalized per-window term
    counts of a STREAMING document frame; append-mode-ready (each row
    emitted once, when the watermark passes its window)."""
    return _windowed_counts(
        docs.withWatermark(ts_col, delay), window, ts_col
    )


def trending_batch(docs: DataFrame, window: str = "1 minute",
                   ts_col: str = "ts") -> DataFrame:
    """The batch oracle: identical windowed counts over a static frame
    (what the stream's finalized output must equal)."""
    return _windowed_counts(docs, window, ts_col)


def top_terms(counts: DataFrame, k: int = 10) -> DataFrame:
    """(window_start, window_end, term, n, rank): per-window top-k by
    (n DESC, term ASC) — bucket-scale, run over the finalized sink."""
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc("term")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
