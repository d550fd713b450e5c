"""Continuous incremental indexing (streaming/index_stream.py).

  * an availableNow stream over url-ordered batch files produces an index
    that answers every reference query IDENTICALLY to one fresh build over
    the whole corpus (end-to-end: init_index -> N foreachBatch extensions);
  * the foreachBatch sink is exactly-once under epoch replay (the crash
    window between the registry commit and the checkpoint ack);
  * an EMPTY delta burns its version instead of poisoning the next
    extension's manifest resume (regression: the n_delta==0 early return
    used to leave committed empty docmap/tokens rows that a later real
    extension at the same version resumed into, silently dropping data);
  * the compact_at policy merges segments back to one, queries unchanged.
"""

import os

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import (
    build_index,
    extend_index,
    init_index,
)
from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk, topk_oracle
from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog
from rt_etl_yahoo_search_engine_spark.sources.synth import synth_pages_df
from rt_etl_yahoo_search_engine_spark.streaming.index_stream import (
    index_stream,
    make_index_sink,
)


def _collect(df):
    return {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in df.collect()
    }


def _assert_same(got, want, tol=1e-9):
    assert set(got) == set(want)
    for key, (doc, score) in got.items():
        wdoc, wscore = want[key]
        assert doc == wdoc, f"{key}: doc {doc} != {wdoc}"
        assert score == pytest.approx(wscore, abs=tol), key


CUTS = (
    "https://synth.example/en/00000400",
    "https://synth.example/en/00000800",
)


@pytest.fixture(scope="module")
def batches_and_full(spark, tmp_path_factory):
    """Three url-contiguous batch files (ascending mtimes, so the file
    source replays them in url order) + the full corpus — all slices of ONE
    deterministic 1100-doc generation (synth content depends on the
    generation size/partitioning)."""
    root = tmp_path_factory.mktemp("streamsrc")
    whole = synth_pages_df(spark, 1100, num_partitions=11)
    pages_dir = str(root / "incoming")
    os.makedirs(pages_dir)
    slices = [
        whole.filter(F.col("url") < CUTS[0]),
        whole.filter((F.col("url") >= CUTS[0]) & (F.col("url") < CUTS[1])),
        whole.filter(F.col("url") >= CUTS[1]),
    ]
    for i, df in enumerate(slices):
        stage = str(root / f"stage{i}")
        df.coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(pages_dir, f"batch{i}.parquet")
        os.rename(os.path.join(stage, part), dst)
        t = 1_700_000_000 + i * 100
        os.utime(dst, (t, t))
    full = str(root / "full")
    whole.write.parquet(full)
    return pages_dir, full


def test_stream_equals_fresh_build(spark, batches_and_full, tmp_path):
    pages_dir, full = batches_and_full
    idx, ckpt = str(tmp_path / "idx"), str(tmp_path / "ckpt")
    q = index_stream(
        spark, pages_dir, idx, ckpt,
        n_shards=3, n_buckets=4, max_files_per_trigger=1, available_now=True,
    )
    q.awaitTermination(timeout=600)
    full_root = str(tmp_path / "fullidx")
    build_index(spark, full, full_root, n_shards=3, n_buckets=4)

    reg = Catalog(idx).read_registry()
    fresh = Catalog(full_root).read_registry()
    assert len(reg["segments"]) == 3  # one per micro-batch
    assert reg["n_docs"] == fresh["n_docs"]
    assert reg["sum_dl"] == fresh["sum_dl"]
    assert reg["avgdl"] == fresh["avgdl"]

    for mode in (spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE):
        got = _collect(topk(spark, idx, spec.REFERENCE_QUERIES, mode=mode, k=10))
        want = _collect(
            topk(spark, full_root, spec.REFERENCE_QUERIES, mode=mode, k=10)
        )
        assert len(got) > 0
        _assert_same(got, want)
    # serving path reads the streamed index identically
    local = LocalSearcher(idx).search_batch(spec.REFERENCE_QUERIES, k=10)
    serve_map = {
        (q_, int(r)): (int(d), float(s))
        for q_, r, d, s in zip(
            local["query_id"], local["rank"], local["doc_id"], local["score"]
        )
    }
    _assert_same(
        serve_map, _collect(topk(spark, full_root, spec.REFERENCE_QUERIES, k=10))
    )


def test_sink_replay_is_exactly_once(spark, tmp_path):
    """Replaying a committed epoch (crash between registry commit and
    checkpoint ack) must be a no-op; the next epoch extends normally."""
    whole = synth_pages_df(spark, 600, num_partitions=6)
    b0 = whole.filter(F.col("url") < CUTS[0])
    b1 = whole.filter(F.col("url") >= CUTS[0])
    idx = str(tmp_path / "idx")
    init_index(spark, idx, n_shards=2, n_buckets=4)
    sink = make_index_sink(spark, idx)

    sink(b0, 0)
    reg0 = Catalog(idx).read_registry()
    assert reg0["n_docs"] > 0 and len(reg0["segments"]) == 1
    sink(b0, 0)  # replay
    reg1 = Catalog(idx).read_registry()
    assert reg1 == reg0
    sink(b1, 1)
    reg2 = Catalog(idx).read_registry()
    assert reg2["n_docs"] > reg0["n_docs"] and len(reg2["segments"]) == 2
    # streamed-from-empty index answers like the exhaustive oracle
    got = _collect(topk(spark, idx, spec.REFERENCE_QUERIES, k=10))
    want = _collect(topk_oracle(spark, idx, spec.REFERENCE_QUERIES, k=10))
    assert len(got) > 0
    _assert_same(got, want)


def test_init_index_is_idempotent_and_queryable(spark, tmp_path):
    idx = str(tmp_path / "idx")
    init_index(spark, idx, n_shards=2, n_buckets=4)
    reg = Catalog(idx).read_registry()
    assert reg["n_docs"] == 0 and reg["segments"] == []
    # queries against the empty index return no rows, with the full schema
    out = topk(spark, idx, spec.REFERENCE_QUERIES, k=10)
    assert out.count() == 0
    assert out.columns == ["query_id", "rank", "doc_id", "score"]
    # a second init must not clobber an existing (extended) index
    extend_index(
        spark, synth_pages_df(spark, 120, num_partitions=2), idx
    )
    n = Catalog(idx).read_registry()["n_docs"]
    assert n > 0
    init_index(spark, idx, n_shards=2, n_buckets=4)
    assert Catalog(idx).read_registry()["n_docs"] == n


def test_empty_delta_burns_version(spark, tmp_path):
    """A zero-doc extension attempt must not poison the next extension's
    manifest resume (its committed-empty docmap/tokens rows used to make
    the following real extension silently drop its documents)."""
    whole = synth_pages_df(spark, 600, num_partitions=6)
    b0 = whole.filter(F.col("url") < CUTS[0])
    b1 = whole.filter(F.col("url") >= CUTS[0])
    idx = str(tmp_path / "idx")
    init_index(spark, idx, n_shards=2, n_buckets=4)
    extend_index(spark, b0, idx)
    reg0 = Catalog(idx).read_registry()

    empty = whole.filter(F.col("lang") == "zz")  # no such pages
    extend_index(spark, empty, idx)
    reg1 = Catalog(idx).read_registry()
    assert reg1["version"] == reg0["version"] + 1  # burned
    assert reg1["n_docs"] == reg0["n_docs"]
    assert len(reg1["segments"]) == len(reg0["segments"])

    extend_index(spark, b1, idx)  # must NOT resume into the empty dirs
    reg2 = Catalog(idx).read_registry()
    assert reg2["n_docs"] > reg0["n_docs"]
    got = _collect(topk(spark, idx, spec.REFERENCE_QUERIES, k=10))
    want = _collect(topk_oracle(spark, idx, spec.REFERENCE_QUERIES, k=10))
    assert len(got) > 0
    _assert_same(got, want)


def test_compact_policy(spark, tmp_path):
    """compact_at merges segments back to one; queries unchanged."""
    whole = synth_pages_df(spark, 600, num_partitions=6)
    b0 = whole.filter(F.col("url") < CUTS[0])
    b1 = whole.filter(F.col("url") >= CUTS[0])
    idx = str(tmp_path / "idx")
    init_index(spark, idx, n_shards=2, n_buckets=4)
    sink = make_index_sink(spark, idx, compact_at=2)
    sink(b0, 0)
    assert len(Catalog(idx).read_registry()["segments"]) == 1
    sink(b1, 1)
    reg = Catalog(idx).read_registry()
    assert len(reg["segments"]) == 1  # compacted 2 -> 1
    assert reg.get("last_source_id") == "stream-epoch-1"  # survives compaction
    got = _collect(topk(spark, idx, spec.REFERENCE_QUERIES, k=10))
    want = _collect(topk_oracle(spark, idx, spec.REFERENCE_QUERIES, k=10))
    assert len(got) > 0
    _assert_same(got, want)
