"""Structured Streaming ingest: the reference's real-time path, Spark-native.

The reference's pipeline is a hand-rolled streaming system: Kafka topics,
a micro-batcher (100 msgs / 1 s timeout, ref: src/services/batcher_service.py:7-46),
at-least-once manual offset commits after the DB write
(ref: src/yahoo_search_process.py:80-98, src/extractor_process.py:140-151),
and an append-only point-in-time status ledger
(ref: src/models/dto_data_classes/status_dto.py:10-15).

Spark-native equivalents used here:
  micro-batcher        -> trigger(processingTime=...) + maxFilesPerTrigger
  at-least-once commit -> checkpointLocation (offsets committed after sink
                          write; exactly-once for file sinks)
  claim-check          -> column pruning (only url+html enter the extractor)
  status ledger        -> streaming manifest rows appended per micro-batch
                          via foreachBatch

``extract_stream`` turns a directory of page parquet files (stand-in for a
Kafka topic — no broker in the sandbox; the source is swappable via
``readStream.format``) into a continuously-extracted structured table.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.extract import extract_batch

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

EXTRACTED_SCHEMA = "url string, seq int, link string, date string, body string"


def extract_stream(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    trigger_seconds: float = 1.0,
):
    """Start the streaming extraction query; returns the StreamingQuery.

    Each micro-batch mirrors the reference worker loop: filter null html
    (ref: src/extractor_process.py:116-123), run the reference-parity
    extractor, append results + a manifest row in the same batch function
    (the reference's single-transaction results+status write,
    ref: src/extractor_process.py:140-148)."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )
    extracted = (
        stream.filter((F.col("lang") == "en") & F.col("html").isNotNull())
        .select("url", "html")
        .mapInPandas(extract_batch, schema=EXTRACTED_SCHEMA)
    )

    def _sink(batch_df, epoch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.write.mode("append").parquet(f"{out_dir}/extracted")
            # status ledger: append-only, one row per micro-batch (PIT,
            # "an update is an insert")
            row = batch_df.groupBy().agg(
                F.count("*").alias("n_results"),
                F.countDistinct("url").alias("n_urls"),
            ).select(
                F.lit(epoch_id).alias("epoch"),
                "n_results",
                "n_urls",
                F.lit("COMPLETED").alias("status"),
                F.current_timestamp().alias("committed_at"),
            )
            row.write.mode("append").parquet(f"{out_dir}/ledger")
        finally:
            batch_df.unpersist()

    return (
        extracted.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
