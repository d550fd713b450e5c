"""Incremental sidecar extension — operators/positions.extend_positions.

An index extension used to force a full sidecar rebuild; extend_positions
appends a delta directory instead.  Checks:
  * after extend_index + extend_positions, the positional phrase verify
    equals the text verify on the UNION corpus (and NEAR works);
  * tf parity holds for every doc, base and delta;
  * the delta run is O(delta): the base positions directory's files are
    byte-untouched;
  * rerunning extend_positions at the same covered count is a no-op;
  * extend_positions refuses an index with no sidecar.
"""

import os

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark import spec
from rt_etl_yahoo_search_engine_spark.operators.index_build import (
    build_index,
    extend_index,
)
from rt_etl_yahoo_search_engine_spark.operators.positions import (
    build_positions,
    extend_positions,
)
from rt_etl_yahoo_search_engine_spark.plans.near import near_topk
from rt_etl_yahoo_search_engine_spark.plans.phrase import phrase_topk
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog

BASE = [
    ("a0", "alpha beta gamma delta", "en"),
    ("a1", "alpha alpha beta", "en"),
    ("a2", "delta epsilon zeta", "en"),
    ("a3", "beta gamma", "en"),
]
DELTA = [
    ("b0", "alpha beta omega", "en"),
    ("b1", "omega omega alpha", "en"),
    ("b2", "gamma delta alpha beta", "en"),
]


def _mtimes(root: str) -> dict[str, float]:
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.path.getmtime(p)
    return out


@pytest.fixture(scope="module")
def extended(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("posext") / "idx")
    base_df = spark.createDataFrame(BASE, "url string, text string, lang string")
    delta_df = spark.createDataFrame(DELTA, "url string, text string, lang string")
    build_index(spark, base_df, root, n_shards=2, n_buckets=4, tokenizer="text")
    build_positions(spark, base_df, root, tokenizer="text")
    base_pos_files = _mtimes(Catalog(root).path("positions"))
    extend_index(spark, delta_df, root, tokenizer="text")
    extend_positions(spark, delta_df, root, tokenizer="text")
    union_df = spark.createDataFrame(
        BASE + DELTA, "url string, text string, lang string"
    )
    return root, union_df, base_pos_files


def test_positional_verify_equals_text_on_union(spark, extended):
    root, union_df, _ = extended
    phrases = {
        "ab": "alpha beta",     # base a0/a1? + delta b0, b2
        "oo": "omega omega",    # delta-only
        "gd": "gamma delta",    # delta b2 only (a0 has 'gamma delta'!) both
        "none": "zeta omega",   # never adjacent
    }
    via_pos = phrase_topk(spark, root, phrases, k=10, verify="positions")
    via_text = phrase_topk(
        spark, root, phrases, union_df.select("url", "text"), k=10,
        verify="text",
    )
    rows = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    )
    got = rows(via_pos)
    assert got == rows(via_text)
    qids = {q for q, *_ in got}
    assert "oo" in qids and "ab" in qids  # delta docs really matched


def test_near_works_after_extension(spark, extended):
    root, _, _ = extended
    out = near_topk(spark, root, {"ao": "alpha omega"}, window=3, k=10)
    got = {r["doc_id"] for r in out.collect()}
    # only the delta docs contain alpha and omega within 3 positions
    docmap = {
        r["url"]: r["doc_id"]
        for r in Catalog(root).read(spark, *Catalog(root).read_registry()
                                    .get("docmap_dirs", ["docmap"])).collect()
    }
    assert got == {docmap["b0"], docmap["b1"]}


def test_tf_parity_across_all_docs(spark, extended):
    root, _, _ = extended
    cat = Catalog(root)
    reg = cat.read_registry()
    parts = [spark.read.parquet(cat.path(d)) for d in reg["positions_dirs"]]
    pos = parts[0]
    for p in parts[1:]:
        pos = pos.unionByName(p)
    got = pos.groupBy("doc_id").agg(F.sum(F.size("positions")).alias("n"))
    tokens = cat.read(spark, *reg.get("token_dirs", ["tokens"]))
    dl = tokens.filter(F.col("term").isNull()).select("doc_id", "doc_len")
    mismatch = (
        dl.join(got, "doc_id", "left")
        .filter(F.coalesce(F.col("n"), F.lit(0)) != F.col("doc_len"))
        .count()
    )
    assert mismatch == 0
    assert pos.select("doc_id").distinct().count() == int(reg["n_docs"])


def test_delta_is_incremental_and_rerun_is_noop(spark, extended):
    root, _, base_pos_files = extended
    cat = Catalog(root)
    reg = cat.read_registry()
    assert len(reg["positions_dirs"]) == 2
    assert int(reg["positions_n_docs"]) == int(reg["n_docs"])
    # base directory untouched by the delta write
    assert _mtimes(cat.path("positions")) == base_pos_files
    # rerun: no-op (no new dirs, registry unchanged)
    extend_positions(spark, None, root, tokenizer="text")
    assert cat.read_registry()["positions_dirs"] == reg["positions_dirs"]


def test_refuses_without_base_sidecar(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nosidecar") / "idx")
    df = spark.createDataFrame(BASE, "url string, text string, lang string")
    build_index(spark, df, root, n_shards=2, n_buckets=4, tokenizer="text")
    with pytest.raises(ValueError, match="no positional sidecar"):
        extend_positions(spark, df, root, tokenizer="text")
