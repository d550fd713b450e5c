"""Streaming percolation: the accumulated alert log equals the batch
percolator over the full corpus; epoch replay is exactly-once."""

from rt_etl_yahoo_search_engine_spark.plans.percolate import percolate
from rt_etl_yahoo_search_engine_spark.streaming.percolate_stream import (
    make_percolate_sink,
    percolate_stream,
)

QUERIES = {
    "alert1": "join hash",
    "alert2": "window",
    "alert3": "zzznope absent",
}


def _docs(spark, n=80):
    # deterministic tiny corpus with known vocabulary overlap
    words = ["join", "hash", "window", "table", "scan", "agg"]
    rows = [
        (
            i,
            " ".join(words[(i + j) % len(words)] for j in range(6)),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stream_alerts_match_batch(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = _docs(spark)
    docs.repartition(4).write.parquet(docs_dir)

    q = percolate_stream(spark, docs_dir, out_dir, ckpt, QUERIES)
    try:
        q.processAllAvailable()  # blocks until the backlog is drained
    finally:
        q.stop()

    got = {
        (r["doc_id"], r["query_id"])
        for r in spark.read.parquet(f"{out_dir}/alerts/epoch=*").collect()
    }
    want = {
        (r["doc_id"], r["query_id"])
        for r in percolate(docs, QUERIES).collect()
    }
    assert got == want and got  # non-vacuous
    # the absent-vocab query must never alert
    assert not any(q_ == "alert3" for _, q_ in got)


def test_epoch_replay_is_exactly_once(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    docs = _docs(spark, 20)
    sink = make_percolate_sink(out_dir, QUERIES)
    sink(docs, 0)
    first = sorted(
        (r["doc_id"], r["query_id"])
        for r in spark.read.parquet(f"{out_dir}/alerts/epoch=*").collect()
    )
    sink(docs, 0)  # crash-replay of the same epoch
    replayed = sorted(
        (r["doc_id"], r["query_id"])
        for r in spark.read.parquet(f"{out_dir}/alerts/epoch=*").collect()
    )
    assert replayed == first  # overwrite, not append

    sink(docs, 1)  # a NEW epoch appends its own partition
    both = spark.read.parquet(f"{out_dir}/alerts/epoch=*").count()
    assert both == 2 * len(first)
