"""LocalSearcher document/metadata APIs: _mget and _field_caps."""

from rt_etl_yahoo_search_engine_spark.operators.positions import (
    build_positions,
)
from rt_etl_yahoo_search_engine_spark.plans.serve import LocalSearcher


def test_mget_order_found_and_urls(index_dir):
    s = LocalSearcher(index_dir)
    # any hit doc is a valid id; 10**12 is out of corpus
    hit = s.search("chicken", k=1)[0][1]
    got = s.mget([hit, 10**12, hit])
    assert [g["doc_id"] for g in got] == [hit, 10**12, hit]  # request order
    assert got[0]["found"] and got[2]["found"]
    assert got[0]["url"] == s.urls_for([hit])[hit]
    assert not got[1]["found"] and got[1]["url"] is None


def test_mget_deleted_doc_not_found(spark, index_dir, tmp_path):
    import shutil

    from rt_etl_yahoo_search_engine_spark.operators.deletes import delete_docs

    root = str(tmp_path / "idx_del")
    shutil.copytree(index_dir, root)
    s0 = LocalSearcher(root)
    hit = s0.search("chicken", k=1)[0][1]
    url = s0.urls_for([hit])[hit]
    delete_docs(spark, root, urls=spark.createDataFrame([(url,)], "url string"))
    got = LocalSearcher(root).mget([hit])[0]
    assert not got["found"] and got["url"] is None


def test_field_caps_positional_tracks_sidecar(
    spark, corpus_dir, index_dir, tmp_path
):
    import shutil

    root = str(tmp_path / "idx_caps")
    shutil.copytree(index_dir, root)
    caps = {c["field"]: c for c in LocalSearcher(root).field_caps()}
    assert caps["text"]["searchable"] and not caps["text"]["positional"]
    assert caps["url"]["type"] == "keyword"
    build_positions(spark, corpus_dir, root)
    caps = {c["field"]: c for c in LocalSearcher(root).field_caps()}
    assert caps["text"]["positional"]
