"""Sequence packing — turn a document stream into fixed-token-budget
training chunks, the way LLM pretraining actually consumes a corpus:
documents are CONCATENATED in stream order and the token stream is cut
every `budget` tokens (GPT-style "concat then chunk").  A doc's chunk
assignment is therefore floor(tokens_before_it / budget) — an exact
window cumulative sum, not a greedy bin-packer (greedy first-fit is
sequential state; concat-then-chunk is the industry default precisely
because it is this parallelizable prefix sum).

Scale shape: one window over (stream, order) — Spark shuffles once on
the stream key and computes running sums per stream in a single pass.
Streams are the parallelism unit: at 100 TB you key them at file or
(source, shard) granularity so no single stream is corpus-scale; the
per-stream order column (doc_id here) makes the packing deterministic
under any partitioning.  Everything is built-in window/codegen — no
Python, no collect.

Input contract: (doc_id: long, text: string, <stream_col>).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_analysis import TOKENS_EXPR


def pack_sequences(
    docs: DataFrame,
    budget: int,
    stream_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, <stream_col>, n_tokens, chunk_id, chunk_offset): each
    doc's slot in its stream's concat-then-chunk packing — chunk_id =
    floor(preceding-token-count / budget), chunk_offset = the doc's
    first-token position within that chunk.  A doc whose tokens cross a
    budget boundary starts in chunk_id and spills into the next, exactly
    like the training loader's split; empty-token docs take the slot at
    their boundary without advancing it."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    n_tok = F.size(F.expr(TOKENS_EXPR))
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        docs.select("doc_id", stream_col, n_tok.alias("n_tokens"))
        .withColumn("_before", before)
        .select(
            "doc_id",
            stream_col,
            "n_tokens",
            (F.col("_before") / F.lit(int(budget)))
            .cast("long")
            .alias("chunk_id"),
            (F.col("_before") % F.lit(int(budget))).alias("chunk_offset"),
        )
    )
