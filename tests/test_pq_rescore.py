"""Two-stage ANN (functions/similarity.pq_rescore_topk): candidates come
from the PQ stage, exact-cosine re-rank beats raw PQ ordering, and
oversample=N degenerates to exact brute force over the PQ top-N."""

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark.functions.similarity import (
    cosine_topk,
    pq_rescore_topk,
    pq_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_rescore_candidates_come_from_pq(spark, emb):
    qids = [0, 1]
    cand = {
        (r["query_id"], r["vec_id"])
        for r in pq_topk(emb, qids, k=30).collect()
    }
    out = pq_rescore_topk(emb, qids, oversample=30, k=10).collect()
    assert len(out) == 20
    for r in out:
        assert (r["query_id"], r["vec_id"]) in cand


def test_rescore_improves_recall_vs_raw_pq(spark, emb):
    """Recall@10 of the rescored list against exact brute force must be
    at least that of the raw ADC ordering (oversampling + exact re-rank
    can only help)."""
    qids = [0, 1, 2]
    exact = {}
    for r in cosine_topk(emb, qids, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    raw = {}
    for r in pq_topk(emb, qids, k=10).collect():
        raw.setdefault(r["query_id"], set()).add(r["vec_id"])
    res = {}
    for r in pq_rescore_topk(emb, qids, oversample=50, k=10).collect():
        res.setdefault(r["query_id"], set()).add(r["vec_id"])
    for q in exact:
        r_raw = len(raw.get(q, set()) & exact[q])
        r_res = len(res.get(q, set()) & exact[q])
        assert r_res >= r_raw, (q, r_raw, r_res)


def test_rescore_orders_by_exact_cosine(spark, emb):
    rows = sorted(
        pq_rescore_topk(emb, [3], oversample=20, k=10).collect(),
        key=lambda r: r["rank"],
    )
    cs = [r["cos"] for r in rows]
    assert cs == sorted(cs, reverse=True)
