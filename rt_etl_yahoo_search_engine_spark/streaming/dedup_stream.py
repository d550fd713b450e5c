"""Streaming exact dedup — first-occurrence content dedup over a page
stream with WATERMARK-BOUNDED state.

A continuous ingest pipeline (streaming/index_stream.py) must not index
the same content twice when crawlers re-fetch a page: the batch engine's
exact-dedup pass (functions/dedup.exact_dedup) becomes, in streaming
form, `dropDuplicatesWithinWatermark` — Structured Streaming keeps one
state row per content hash and drops re-arrivals, and the watermark
BOUNDS that state: hashes older than `delay` in event time are evicted,
so state size tracks the crawl window, not corpus history.  (Plain
streaming `dropDuplicates` would grow state forever — the non-viable
shape at 10^12 docs; with the watermark the state is O(docs per delay
window), the property that makes this runnable indefinitely.)

Semantics: the FIRST arrival of each key within a watermark window is
emitted; later arrivals with the same key are dropped while the first is
still inside the window.  A duplicate arriving after the watermark has
evicted its key re-emits — the documented at-most-window guarantee;
downstream index extension dedups residuals exactly via the batch pass.
State survives checkpoint restarts (the state store is part of the
checkpoint), so dedup is continuous across job restarts.

Input contract: a streaming DataFrame with an event-time column
(``warc_ts``) and a content column; `with_content_hash` derives the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_hash(
    pages: DataFrame, text_col: str = "text", out_col: str = "content_hash"
) -> DataFrame:
    """Append the exact-dedup key: md5 of the UTF-8 content bytes (same
    key as the batch pass, functions/dedup.exact_dedup)."""
    return pages.withColumn(out_col, F.md5(F.encode(F.col(text_col), "UTF-8")))


def dedup_stream(
    pages: DataFrame,
    key_cols: tuple[str, ...] = ("content_hash",),
    ts_col: str = "warc_ts",
    delay: str = "24 hours",
) -> DataFrame:
    """First-occurrence dedup on ``key_cols`` with state bounded by the
    ``delay`` event-time watermark (module docstring)."""
    return pages.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
