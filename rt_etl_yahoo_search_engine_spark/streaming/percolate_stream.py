"""Streaming percolation — saved-search alerting over a document stream.

The percolator's natural home is streaming: stored queries stand, new
documents flow, and every micro-batch emits (doc, query) alert rows for
the queries each new doc matches — ES's percolate-on-ingest alerting
pattern, and the push analog of the reference's poll loop (the client
re-running canned searches against fresh crawl results, ref:
client/streamlit_app.py:58, src/yahoo_search_process.py:80-98).

Composition, not new machinery: the batch operator
(plans/percolate.percolate — broadcast stored-query terms, one scan of
the BATCH only) runs inside foreachBatch.  Cost per micro-batch is
O(batch), independent of everything already ingested: this is the
operator whose streaming form is CHEAPER than its batch form, because
matching is per-document and history never needs revisiting.

Delivery — exactly-once by idempotent epoch overwrite: each epoch's
alerts land in ``alerts/epoch=<id>`` with mode=overwrite, so a replayed
micro-batch (checkpoint recovery) rewrites the identical partition
instead of appending duplicates.  The alert content is deterministic in
the batch content, which the file-source checkpoint pins per epoch.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..plans.percolate import percolate

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def make_percolate_sink(
    out_dir: str,
    queries: dict[str, str],
    min_match: int | None = None,
):
    """The foreachBatch function (exposed separately so tests can drive
    replay windows without a streaming query)."""

    def _sink(batch_df, epoch_id: int) -> None:
        matches = percolate(
            batch_df.select("doc_id", "text"), queries, min_match
        )
        matches.write.mode("overwrite").parquet(
            f"{out_dir}/alerts/epoch={epoch_id}"
        )

    return _sink


def percolate_stream(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    queries: dict[str, str],
    min_match: int | None = None,
    max_files_per_trigger: int = 2,
    trigger_seconds: float = 0.5,
):
    """Start the alerting query over a document directory stream (Kafka
    stand-in, as streaming/ingest.py); returns the StreamingQuery.
    Alerts accumulate under ``out_dir``/alerts/epoch=*/ — read the glob
    for the full alert log."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            make_percolate_sink(out_dir, queries, min_match)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
