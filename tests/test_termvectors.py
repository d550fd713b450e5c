"""Term vectors API (plans/termvectors.py):

  * tf/doc_len/df/cf agree with a direct aggregation over the staged
    tokens table (the join/pruning plumbing adds or loses nothing);
  * every live requested doc appears; absent / out-of-range ids are
    silently empty;
  * deleted (tombstoned) docs produce no rows while other docs'
    vectors are unchanged — ES found=false semantics.
"""

import pyarrow.dataset as ds
import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark.operators.deletes import delete_docs
from rt_etl_yahoo_search_engine_spark.operators.index_build import build_index
from rt_etl_yahoo_search_engine_spark.plans.termvectors import term_vectors
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog
from rt_etl_yahoo_search_engine_spark.sources.synth import write_pages

DOC_IDS = [0, 3, 17, 123]


def _tokens_table(index_root):
    return ds.dataset(Catalog(index_root).path("tokens")).to_table(
        columns=["doc_id", "term", "tf", "doc_len"]
    )


def test_matches_tokens_table_aggregation(spark, index_dir):
    got = {
        (r.doc_id, r.term): (r.tf, r.doc_len, r.df, r.cf)
        for r in term_vectors(spark, index_dir, DOC_IDS).collect()
    }
    tbl = _tokens_table(index_dir).to_pandas()
    tbl = tbl[tbl.term.notna()]
    lex = tbl.groupby("term").agg(df=("doc_id", "nunique"), cf=("tf", "sum"))
    sel = tbl[tbl.doc_id.isin(DOC_IDS)]
    want = {
        (int(r.doc_id), r.term): (
            int(r.tf),
            int(r.doc_len),
            int(lex.loc[r.term, "df"]),
            int(lex.loc[r.term, "cf"]),
        )
        for r in sel.itertuples()
    }
    assert got == want
    assert {d for d, _ in got} == set(DOC_IDS)


def test_absent_ids_are_empty(spark, index_dir):
    df = term_vectors(spark, index_dir, [10**9, 10**9 + 1])
    assert df.count() == 0
    assert df.columns == ["doc_id", "term", "tf", "doc_len", "df", "cf"]
    assert term_vectors(spark, index_dir, []).count() == 0


def test_deleted_doc_has_no_vector(spark, tmp_path, corpus_dir):
    root = str(tmp_path / "idx_tv_del")
    pages = spark.read.parquet(corpus_dir).limit(200)
    small = str(tmp_path / "pages200")
    pages.write.parquet(small)
    build_index(spark, small, root, n_shards=2, n_buckets=4)
    before = term_vectors(spark, root, [1, 2]).collect()
    assert {r.doc_id for r in before} == {1, 2}
    delete_docs(spark, root, doc_ids=[1])
    after = term_vectors(spark, root, [1, 2]).collect()
    assert {r.doc_id for r in after} == {2}
    assert sorted(
        (r.term, r.tf, r.df, r.cf) for r in after
    ) == sorted((r.term, r.tf, r.df, r.cf) for r in before if r.doc_id == 2)
