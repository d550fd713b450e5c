"""Blocked fuzzy linkage (functions/linkage): python reference over a
handcrafted name zoo (blocking hits and misses, max_dist gate, best-
match ties), corrupt_names determinism, hot-block dropping, and the
round-trip property (corrupted names link back to their source unless
the typo hit the blocking prefix)."""

import pytest

from rt_etl_yahoo_search_engine_spark.functions.linkage import (
    corrupt_names, fuzzy_link,
)

RIGHT = [
    (1, "goldenrod lace"),
    (2, "goldenrod lane"),
    (3, "lavender spring"),
    (4, "mint chocolate"),
    (5, "minty chocolate"),
]
LEFT = [
    (10, "goldenrod lace"),    # exact -> 1
    (11, "goldenrod lane"),    # exact -> 2 (dist 0 beats dist 1 to 1)
    (12, "goldenrod lanes"),   # dist 1 to 2
    (13, "lavender sprint"),   # dist 1 to 3
    (14, "xavender spring"),   # blocking miss (prefix 'xave') -> -1
    (15, "mint chocolatey"),   # dist 1 to 4, dist 2 to 5 -> 4
    (16, "completely other"),  # no block -> -1
]


def _py_link(max_dist=2, block_len=4):
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    out = {}
    for lk, ln in LEFT:
        best = None
        for rk, rn in RIGHT:
            if ln[:block_len] != rn[:block_len]:
                continue
            d = lev(ln, rn)
            if d <= max_dist and (best is None or (d, rk) < best):
                best = (d, rk)
        out[lk] = (best[1], best[0]) if best else (-1, -1)
    return out


def test_fuzzy_link_matches_python(spark):
    left = spark.createDataFrame(LEFT, "k long, name string")
    right = spark.createDataFrame(RIGHT, "k long, name string")
    got = {
        r["left_key"]: (r["match_key"], r["dist"])
        for r in fuzzy_link(left, right, "k", "name").collect()
    }
    assert got == _py_link()


def test_hot_block_dropped(spark):
    left = spark.createDataFrame([(1, "aaaa x")], "k long, name string")
    right = spark.createDataFrame(
        [(i, "aaaa x") for i in range(10)], "k long, name string"
    )
    out = fuzzy_link(left, right, "k", "name", max_block=5).collect()[0]
    assert (out["match_key"], out["dist"]) == (-1, -1)
    ok = fuzzy_link(left, right, "k", "name", max_block=20).collect()[0]
    assert (ok["match_key"], ok["dist"]) == (0, 0)


def test_corrupt_names_round_trip(spark):
    rows = [(i, n) for i, n in RIGHT]
    df = spark.createDataFrame(rows, "k long, name string")
    corrupted = {r["k"]: r["name"]
                 for r in corrupt_names(df, "k", "name").collect()}
    for k, n in RIGHT:
        pos = k % len(n)  # 0-based dropped index
        assert corrupted[k] == n[:pos] + n[pos + 1:], k
    # linking the corrupted names back recovers the source when the
    # dropped char is outside the blocking prefix
    linked = {
        r["left_key"]: r["match_key"]
        for r in fuzzy_link(
            corrupt_names(df, "k", "name"), df, "k", "name",
            max_dist=1, block_len=4,
        ).collect()
    }
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    for k, n in RIGHT:
        if k % len(n) >= 4:
            cn = corrupted[k]
            best = min(
                (
                    (lev(cn, rn), rk)
                    for rk, rn in RIGHT
                    if rn[:4] == cn[:4] and lev(cn, rn) <= 1
                ),
                default=None,
            )
            assert best is not None and linked[k] == best[1], k
            assert lev(cn, n) == 1  # the source is always 1 edit away
