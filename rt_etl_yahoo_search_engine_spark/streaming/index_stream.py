"""Structured Streaming incremental indexing: the reference's real-time
loop, Spark-native, end to end.

The reference IS a real-time indexer: pages stream in from Kafka, a worker
extracts them, and the store is updated continuously so queries see fresh
results (ref: src/yahoo_search_process.py:80-98, src/extractor_process.py,
README.md:9-19).  This module closes the same loop over OUR index:

    readStream(pages dir)            <- Kafka stand-in (source swappable
                                        via readStream.format; no broker
                                        in the sandbox — same contract as
                                        streaming/ingest.py)
      -> foreachBatch:
           extend_index(batch,       <- Lucene-style segment append,
                        source_id)      rank-EXACT vs a fresh build
           compact when segments     <- classic segment-merge economics
           exceed the policy bound      (operators.index_build.compact_index)

Delivery semantics — EXACTLY-ONCE, by composing two mechanisms:

  * the checkpoint replays at most the last unacknowledged micro-batch,
    deterministically (file-source offsets are logged before processing);
  * extend_index(source_id=f"stream-epoch-{epoch_id}") records the id in
    the registry's atomic commit; a replayed epoch matches
    reg["last_source_id"] and is skipped entirely.  A crash EARLIER in the
    extension resumes from the manifest ledger instead (the ids differ),
    so every crash window lands on exactly one of {resume, skip}.

Bootstrap: init_index creates a valid EMPTY index, so every micro-batch —
including the first — goes through the one extend_index path and the one
idempotence mechanism.  At scale this is the standing ingestion service:
each micro-batch costs O(delta) (tokenize + delta-sharded encode + a
vocab-scale lexicon merge), queries stay live throughout (registry renames
are the only visibility points), and the compaction policy bounds
per-query segment fan-out (the serve path opens one directory per
(segment, shard)).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.index_build import compact_index, extend_index, init_index
from ..sources.catalog import Catalog
from .ingest import PAGES_SCHEMA


def make_index_sink(
    spark: SparkSession,
    index_root: str,
    tokenizer: str = "html",
    compact_at: int | None = None,
):
    """The foreachBatch function (exposed separately so tests can drive
    replay/crash windows without a streaming query).  compact_at: merge all
    segments into one whenever the segment count REACHES this bound — a
    standing condition checked every batch, so a compaction that crashed
    mid-run (or was skipped by a replayed epoch) is retried on the next."""

    def _sink(batch_df, epoch_id: int) -> None:
        extend_index(
            spark,
            batch_df,
            index_root,
            tokenizer=tokenizer,
            source_id=f"stream-epoch-{epoch_id}",
        )
        if compact_at:
            reg = Catalog(index_root).read_registry()
            if len(reg["segments"]) >= compact_at:
                compact_index(spark, index_root, prune=True)

    return _sink


def index_stream(
    spark: SparkSession,
    pages_dir: str,
    index_root: str,
    checkpoint_dir: str,
    tokenizer: str = "html",
    n_shards: int = 8,
    n_buckets: int = 16,
    compact_at: int | None = None,
    max_files_per_trigger: int = 4,
    trigger_seconds: float = 1.0,
    available_now: bool = False,
):
    """Start the continuous indexing query; returns the StreamingQuery.

    available_now=True drains everything currently in pages_dir in
    micro-batches and stops (Trigger.AvailableNow) — the batch-backfill
    mode; the default processingTime trigger tails the directory forever.
    n_shards/n_buckets apply only when the index does not exist yet
    (init_index); an existing index keeps its geometry."""
    init_index(spark, index_root, n_shards=n_shards, n_buckets=n_buckets)
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )
    writer = stream.writeStream.foreachBatch(
        make_index_sink(spark, index_root, tokenizer, compact_at)
    ).option("checkpointLocation", checkpoint_dir)
    writer = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime=f"{trigger_seconds} seconds")
    )
    return writer.start()
