import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rt_etl_yahoo_search_engine_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="engine-tests", master="local[4]", shuffle_partitions=8, driver_mem="8g")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory, spark):
    """Deterministic 2,000-doc synthetic pages table (FIXTURES.md §A scale)."""
    from rt_etl_yahoo_search_engine_spark.sources.synth import write_pages

    path = str(tmp_path_factory.mktemp("corpus") / "pages")
    write_pages(spark, 2000, path, num_partitions=8)
    return path


@pytest.fixture(scope="session")
def index_dir(tmp_path_factory, spark, corpus_dir):
    """Index built once over the shared corpus."""
    from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index

    root = str(tmp_path_factory.mktemp("index") / "idx")
    # url_ordered: the synth corpus is generated in url order (contiguous id
    # ranges per file) — exercises the shuffle-free encode path; the resume
    # tests keep the default shuffle path covered
    build_index(spark, corpus_dir, root, n_shards=4, n_buckets=8, url_ordered=True)
    return root
