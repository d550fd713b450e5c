"""geohash_grid (functions/geo) and children/parent aggs (functions/nested).

The geohash reference below is an independent from-scratch encoder using
the textbook bisection algorithm (refine lon/lat ranges bit by bit) —
structurally different from the engine's shift/mask arithmetic, so
agreement is meaningful.
"""

import pytest

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ref_geohash(lat: float, lon: float, precision: int) -> str:
    """Textbook bisection encoder (even bits = lon, odd = lat)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(precision):
        v = 0
        for k in range(5):
            v = (v << 1) | bits[5 * i + k]
        out.append(GEOHASH_BASE32[v])
    return "".join(out)


def test_geohash_known_value():
    # widely published reference point: geohash of (57.64911, 10.40744)
    # is "u4pruydqqvj" — check prefixes at several precisions
    for p in (1, 4, 6):
        assert _ref_geohash(57.64911, 10.40744, p) == "u4pruydqqvj"[:p]


@pytest.mark.parametrize("precision", [1, 3, 4, 5])
def test_geohash_grid_matches_reference(spark, precision):
    from rt_etl_yahoo_search_engine_spark.functions.geo import geohash_grid

    pts = [
        (57.64911, 10.40744),
        (0.0005, -0.0005),
        (-89.9, 179.9),
        (89.9, -179.9),
        (-33.8688, 151.2093),
        (40.7128, -74.0060),
        (40.7128, -74.0060),  # duplicate -> n=2 in its cell
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = {
        r["geohash"]: r["n"]
        for r in geohash_grid(df, precision=precision).collect()
    }
    want: dict[str, int] = {}
    for lat, lon in pts:
        h = _ref_geohash(lat, lon, precision)
        want[h] = want.get(h, 0) + 1
    assert got == want


def test_children_and_parent_agg(spark):
    from rt_etl_yahoo_search_engine_spark.functions.nested import (
        children_agg,
        parent_agg,
    )

    parents = spark.createDataFrame(
        [(1, "A", 10.0), (2, "A", 20.0), (3, "B", 30.0)],
        "pk long, seg string, bal double",
    )
    children = spark.createDataFrame(
        [
            (1, "hi", 100.0),
            (1, "lo", 50.0),
            (2, "hi", 200.0),
            (3, "hi", 300.0),
            (3, "hi", 400.0),
        ],
        "fk long, prio string, price double",
    )
    got_c = {
        r["bucket"]: (r["n_children"], r["sum_value"], r["avg_value"])
        for r in children_agg(
            parents, children, "pk", "fk", "seg", "price"
        ).collect()
    }
    # segment A's children: orders of parents 1, 2 -> 3 rows, 350 total
    assert got_c == {
        "A": (3, 350.0, pytest.approx(350.0 / 3)),
        "B": (2, 700.0, 350.0),
    }
    got_p = {
        r["bucket"]: (r["n_parents"], r["sum_value"], r["avg_value"])
        for r in parent_agg(
            parents, children, "pk", "fk", "prio", "bal"
        ).collect()
    }
    # "hi" children belong to parents {1, 2, 3} (parent 3 counts ONCE
    # despite two hi-children); "lo" to parent {1}
    assert got_p == {
        "hi": (3, 60.0, 20.0),
        "lo": (1, 10.0, 10.0),
    }
