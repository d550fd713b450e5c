"""The two physical build paths must be observationally identical.

`url_ordered=True` encodes with ZERO exchanges (scan splits are already
contiguous doc ranges); `url_ordered=False` takes the classic
repartition(term-bucket) encode.  Same corpus in, the two indexes must
answer every query with the same docs and bit-identical BM25 scores —
the physical strategy is Catalyst's/ours to choose, never the user's to
notice (reference parity contract: SURVEY.md Appendix A rank identity).
"""

import pytest

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.bm25 import topk
from rt_etl_yahoo_search_engine_spark.sources.synth import write_pages

QUERIES = {
    "q_food": "Chicken Rice",
    "q_brand": "Starbucks",
    "q_multi": "best coffee near me",
}


@pytest.fixture(scope="module")
def dual_indexes(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("dualpath")
    pages = str(base / "pages")
    write_pages(spark, 800, pages, num_partitions=8)
    roots = {}
    for ordered in (True, False):
        root = str(base / f"idx_{ordered}")
        build_index(spark, pages, root, n_shards=4, n_buckets=8,
                    url_ordered=ordered)
        roots[ordered] = root
    return roots


@pytest.mark.parametrize("mode", [spec.MODE_DISJUNCTIVE, spec.MODE_CONJUNCTIVE])
def test_ordered_and_shuffle_builds_rank_identical(spark, dual_indexes, mode):
    results = {}
    for ordered, root in dual_indexes.items():
        rows = topk(spark, root, QUERIES, mode=mode, k=10).collect()
        results[ordered] = {
            (r["query_id"], r["rank"]): (r["doc_id"], r["score"]) for r in rows
        }
    got, want = results[True], results[False]
    assert set(got) == set(want) and got
    for key, (doc, score) in got.items():
        wdoc, wscore = want[key]
        assert doc == wdoc, key
        assert score == pytest.approx(wscore, abs=1e-9), key


def test_every_doc_term_skew(spark, tmp_path):
    """A stop-word-grade term (df == N) is the worst skew case: its postings
    touch every doc.  Doc-range sharding must bound it per shard and the
    query must still return exactly k docs, identical from both build
    paths."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("url"),
        F.concat(F.lit("the common prefix "), F.col("text")).alias("text"),
        "lang",
    )
    n = pages.count()
    out = {}
    for ordered in (True, False):
        root = str(tmp_path / f"idx_{ordered}")
        build_index(spark, pages, root, n_shards=2, n_buckets=4,
                    tokenizer="text", url_ordered=ordered)
        rows = topk(spark, root, {"q": "the"}, mode=spec.MODE_DISJUNCTIVE,
                    k=10).collect()
        assert len(rows) == 10 and n >= 10
        out[ordered] = {r["rank"]: (r["doc_id"], r["score"]) for r in rows}
    for rank, (doc, score) in out[True].items():
        wdoc, wscore = out[False][rank]
        assert doc == wdoc and score == pytest.approx(wscore, abs=1e-9)
