"""Resume-equals-fresh-build: inject a failure mid-encode, rerun, and assert
the resumed index is identical to a fresh one (north_rule checkpoint gate).
Also verifies manifest lineage rows and latest-row-per-partition recovery."""

import pytest

from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog
from rt_etl_yahoo_search_engine_spark.sources.synth import write_pages


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory, spark):
    path = str(tmp_path_factory.mktemp("resume") / "pages")
    write_pages(spark, 300, path, num_partitions=4)
    return path


def _table_fingerprint(spark, root, name, key_cols):
    df = spark.read.parquet(f"{root}/{name}")
    rows = sorted(tuple(r) for r in df.select(*key_cols).collect())
    return rows


def test_kill_and_resume_equals_fresh(spark, small_corpus, tmp_path_factory):
    fresh_root = str(tmp_path_factory.mktemp("idx") / "fresh")
    resumed_root = str(tmp_path_factory.mktemp("idx") / "resumed")

    build_index(spark, small_corpus, fresh_root, n_shards=2, n_buckets=4)

    # killed run: fails after 1 bucket batch (of 4)
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark, small_corpus, resumed_root,
            n_shards=2, n_buckets=4, bucket_batch=1, fail_after_buckets=1,
        )
    cat = Catalog(resumed_root)
    done_after_kill = cat.completed_partitions()
    assert "tokens" in done_after_kill and "bucket:0" in done_after_kill
    assert "bucket:3" not in done_after_kill and "lexicon" not in done_after_kill

    # resume: must skip completed stages/buckets and finish
    build_index(spark, small_corpus, resumed_root, n_shards=2, n_buckets=4, bucket_batch=1)
    assert Catalog(resumed_root).completed_partitions() >= {
        "tokens", "docmap", "stats",
        "bucket:0", "bucket:1", "bucket:2", "bucket:3", "lexicon",
    }

    # identical outputs
    for name, keys in [
        ("docmap", ["doc_id", "url"]),
        ("lexicon", ["term", "df", "cf", "n_blocks", "idf"]),
        (
            "postings",
            ["term", "shard", "block_id", "doc_count", "first_doc_id",
             "last_doc_id", "max_tf", "doc_ids_vb", "tfs_vb"],
        ),
    ]:
        assert _table_fingerprint(spark, fresh_root, name, keys) == _table_fingerprint(
            spark, resumed_root, name, keys
        ), name

    # lineage rows carry metrics
    rows = Catalog(resumed_root).latest_status()
    b0 = rows["bucket:0"]
    assert b0["status"] == "COMPLETED"
    assert b0["doc_count"] > 0 and b0["bytes"] > 0 and b0["build_time_s"] > 0
    assert ".." in b0["term_range"]


def test_noop_rerun(spark, small_corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx") / "noop")
    build_index(spark, small_corpus, root, n_shards=2, n_buckets=4)
    before = len(Catalog(root).read_manifest())
    build_index(spark, small_corpus, root, n_shards=2, n_buckets=4)  # all skipped
    after = len(Catalog(root).read_manifest())
    assert before == after
