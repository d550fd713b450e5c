"""ES join-data-model queries (functions/nested.py): nested single-object
semantics (vs the flattened-table wrong answer), has_child child-count
bounds and score modes, has_parent score inheritance."""

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark.functions.nested import (
    has_child_topk,
    has_parent_topk,
    nested_topk,
)

PARENTS = [(1,), (2,), (3,), (4,)]
# (parent_key, qty, disc, price)
CHILDREN = [
    (1, 40, 0.10, 100.0),   # satisfies both in ONE object
    (1, 10, 0.00, 50.0),
    (2, 40, 0.00, 80.0),    # qty in one object ...
    (2, 10, 0.10, 70.0),    # ... disc in ANOTHER: flattened-match trap
    (3, 35, 0.06, 60.0),    # satisfies both
    (3, 50, 0.08, 40.0),    # satisfies both (two matching objects)
]


@pytest.fixture(scope="module")
def rel(spark):
    p = spark.createDataFrame(PARENTS, "pid long")
    c = spark.createDataFrame(
        CHILDREN, "cid long, qty long, disc double, price double"
    )
    return p, c


def test_nested_single_object_semantics(spark, rel):
    p, c = rel
    pred = (F.col("qty") >= 30) & (F.col("disc") >= 0.05)
    out = {
        r["pid"]: (r["score"], r["n_matching"])
        for r in nested_topk(
            p, c, "pid", "cid", pred, F.col("price"), "sum", k=10
        ).collect()
    }
    # parent 2 must NOT match: qty and disc are in different objects —
    # the exact case a flattened table gets wrong
    assert 2 not in out
    assert 4 not in out  # no children at all
    assert out[1] == (100.0, 1)
    assert out[3] == (100.0, 2)  # 60 + 40 over two matching objects


def test_nested_score_modes(spark, rel):
    p, c = rel
    pred = F.col("qty") >= 30
    for mode, want3 in (("max", 60.0), ("avg", 50.0), ("count", 2.0)):
        out = {
            r["pid"]: r["score"]
            for r in nested_topk(
                p, c, "pid", "cid", pred, F.col("price"), mode, k=10
            ).collect()
        }
        assert out[3] == pytest.approx(want3), mode
    with pytest.raises(ValueError, match="score_mode"):
        nested_topk(p, c, "pid", "cid", pred, F.col("price"), "bogus")


def test_has_child_bounds(spark, rel):
    p, c = rel
    pred = F.col("price") >= 40.0
    # every parent with children has >= 2 matching (price >= 40) except
    # parent 1 (100, 50 both >= 40 -> 2)
    out = {
        r["pid"]: r["n_matching"]
        for r in has_child_topk(
            p, c, "pid", "cid", pred, F.col("price"), "max",
            min_children=2, k=10,
        ).collect()
    }
    assert out == {1: 2, 2: 2, 3: 2}
    out2 = {
        r["pid"]: r["n_matching"]
        for r in has_child_topk(
            p, c, "pid", "cid", pred, F.col("price"), "max",
            min_children=1, max_children=1, k=10,
        ).collect()
    }
    assert out2 == {}  # all matched parents have 2 matching children


def test_has_parent_inherits_score(spark):
    p = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 9.0), (3, "a", 1.0)],
        "pid long, seg string, bal double",
    )
    c = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3), (13, 9)], "cid long, pid long"
    )
    rows = has_parent_topk(
        p, c, "pid", "pid", F.col("seg") == "a", F.col("bal"),
        child_id="cid", k=10,
    ).collect()
    got = [(r["cid"], r["pid"], r["score"]) for r in rows]
    # children of seg='a' parents only, parent's bal as score, desc
    assert got == [(10, 1, 5.0), (12, 3, 1.0)]
