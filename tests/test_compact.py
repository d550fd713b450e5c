"""Segment compaction (operators.index_build.compact_index):

  * compacting an extended (multi-segment) index answers every reference
    query score- and rank-identically, on both the distributed and the
    serving path;
  * the compacted index is PHYSICALLY the fresh build: its blocks table
    (term, shard, doc ranges, counts, bounds, payload bytes) equals a fresh
    shuffle-path build's over the concatenated corpus, block for block;
  * visibility is atomic (crash before the registry rename leaves the
    multi-segment index fully live; a rerun resumes);
  * prune=True removes the replaced directories and queries still work.
"""

import os

import pandas as pd
import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import (
    build_index,
    compact_index,
    extend_index,
)
from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog
from rt_etl_yahoo_search_engine_spark.sources.synth import synth_pages_df


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


@pytest.fixture(scope="module")
def roots(spark, tmp_path_factory):
    """extended+compacted vs fresh, from slices of ONE 1100-doc generation
    (synth content depends on the generation size/partitioning)."""
    from pyspark.sql import functions as F

    tmp = tmp_path_factory.mktemp("compact")
    whole = synth_pages_df(spark, 1100, num_partitions=11)
    cut = "https://synth.example/en/00000800"
    paths = {}
    for name, df in (
        ("base", whole.filter(F.col("url") < cut)),
        ("delta", whole.filter(F.col("url") >= cut)),
        ("full", whole),
    ):
        paths[name] = str(tmp / name)
        df.write.parquet(paths[name])

    ext_root, full_root = str(tmp / "ext"), str(tmp / "full_idx")
    build_index(spark, paths["base"], ext_root, n_shards=3, n_buckets=4)
    extend_index(spark, paths["delta"], ext_root)
    pre = {
        mode: _collect(topk(spark, ext_root, spec.REFERENCE_QUERIES, mode=mode, k=10))
        for mode in (spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE)
    }
    compact_index(spark, ext_root)
    build_index(spark, paths["full"], full_root, n_shards=3, n_buckets=4)
    return ext_root, full_root, pre


@pytest.mark.parametrize("mode", [spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE])
def test_compact_equals_fresh_and_precompact(spark, roots, mode):
    ext_root, full_root, pre = roots
    got = _collect(topk(spark, ext_root, spec.REFERENCE_QUERIES, mode=mode, k=10))
    want = _collect(topk(spark, full_root, spec.REFERENCE_QUERIES, mode=mode, k=10))
    assert len(got) > 0
    _assert_same(got, want)
    _assert_same(got, pre[mode])


def test_compact_registry_single_segment(roots):
    ext_root, full_root, _ = roots
    reg = Catalog(ext_root).read_registry()
    fresh = Catalog(full_root).read_registry()
    assert len(reg["segments"]) == 1
    assert reg["segments"][0]["avgdl"] == reg["avgdl"]  # drift factor = 1.0
    assert len(reg["docmap_dirs"]) == 1
    assert reg["n_docs"] == fresh["n_docs"]
    assert reg["sum_dl"] == fresh["sum_dl"]
    assert reg["avgdl"] == fresh["avgdl"]
    # token tables are NOT rewritten — they stay the oracle/rebuild source
    assert len(reg["token_dirs"]) == 2


def test_compact_blocks_equal_fresh_build(spark, roots):
    """Block-level physical identity with the fresh build (same re-shard
    arithmetic, same encoder, same global avgdl)."""
    ext_root, full_root, _ = roots
    cols = [
        "term", "shard", "first_doc_id", "last_doc_id", "doc_count",
        "tf_sum", "block_max_part", "doc_ids_vb", "tfs_vb", "doc_lens_vb",
    ]

    def blocks(root):
        reg = Catalog(root).read_registry()
        seg = Catalog(root).path(reg["segments"][0]["dir"])
        pdf = spark.read.parquet(seg).select(*cols).toPandas()
        return pdf.sort_values(["term", "shard", "first_doc_id"]).reset_index(
            drop=True
        )

    got, want = blocks(ext_root), blocks(full_root)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_compact_serving_path(roots):
    ext_root, full_root, _ = roots
    got = LocalSearcher(ext_root).search_batch(spec.REFERENCE_QUERIES, k=10)
    want = LocalSearcher(full_root).search_batch(spec.REFERENCE_QUERIES, k=10)
    pd.testing.assert_frame_equal(
        got.sort_values(["query_id", "rank"]).reset_index(drop=True),
        want.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_compact_noop_on_single_segment(spark, roots):
    """Compacting an already-compacted index is a no-op (no new version)."""
    ext_root, _, _ = roots
    before = Catalog(ext_root).read_registry()
    compact_index(spark, ext_root)
    assert Catalog(ext_root).read_registry() == before


def test_compact_crash_and_resume(spark, tmp_path, monkeypatch):
    """A crash before the registry rename leaves the multi-segment index
    fully live; the rerun resumes from manifest rows and commits."""
    from pyspark.sql import functions as F

    whole = synth_pages_df(spark, 600, num_partitions=6)
    cut = "https://synth.example/en/00000400"
    base, delta = str(tmp_path / "b"), str(tmp_path / "d")
    whole.filter(F.col("url") < cut).write.parquet(base)
    whole.filter(F.col("url") >= cut).write.parquet(delta)
    root = str(tmp_path / "idx")
    build_index(spark, base, root, n_shards=2, n_buckets=4)
    extend_index(spark, delta, root)
    pre = _collect(topk(spark, root, spec.REFERENCE_QUERIES, k=10))
    pre_reg = Catalog(root).read_registry()

    real = Catalog.write_registry
    monkeypatch.setattr(
        Catalog, "write_registry",
        lambda self, reg: (_ for _ in ()).throw(RuntimeError("injected")),
    )
    with pytest.raises(RuntimeError, match="injected"):
        compact_index(spark, root)
    # pre-commit: reader still sees the multi-segment index, same answers
    assert Catalog(root).read_registry() == pre_reg
    _assert_same(_collect(topk(spark, root, spec.REFERENCE_QUERIES, k=10)), pre)

    monkeypatch.setattr(Catalog, "write_registry", real)
    compact_index(spark, root, prune=True)
    reg = Catalog(root).read_registry()
    assert len(reg["segments"]) == 1
    # pruned: the replaced posting segment dirs are gone
    for seg in pre_reg["segments"]:
        assert not os.path.exists(Catalog(root).path(seg["dir"]))
    _assert_same(_collect(topk(spark, root, spec.REFERENCE_QUERIES, k=10)), pre)
    got = LocalSearcher(root).search_batch(spec.REFERENCE_QUERIES, k=10)
    serve_map = {
        (q, int(r)): (int(d), float(s))
        for q, r, d, s in zip(
            got["query_id"], got["rank"], got["doc_id"], got["score"]
        )
    }
    _assert_same(serve_map, pre)
