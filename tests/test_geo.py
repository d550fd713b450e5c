"""Geo aggs (functions/geo): Web-Mercator tile math vs a python
reference, haversine sanity on known city pairs, bounds/centroid
exactness, ring-bucket partition completeness, and coordinate
derivation determinism."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from rt_etl_yahoo_search_engine_spark.functions.geo import (
    geo_bounds_centroid, geo_distance_rings, geotile_grid, haversine_km,
    with_coords,
)


def _points(spark, pts):
    rows = [(float(la), float(lo), f"t{i % 2}") for i, (la, lo) in
            enumerate(pts)]
    return spark.createDataFrame(rows, "lat double, lon double, tag string")


def _py_tile(lat, lon, z):
    n = 2 ** z
    x = math.floor((lon + 180.0) / 360.0 * n)
    lr = math.radians(lat)
    y = math.floor(
        (1.0 - math.log(math.tan(lr) + 1.0 / math.cos(lr)) / math.pi)
        / 2.0 * n)
    return f"{z}/{x}/{y}"


PTS = [(0.0, 0.0), (51.5007, -0.1246), (48.8566, 2.3522),
       (-33.8688, 151.2093), (35.6762, 139.6503), (0.001, -0.001),
       (85.0, 179.9), (-85.0, -179.9)]


def test_geotile_matches_python(spark):
    for z in (0, 2, 4, 7):
        got = {
            (r["tile"],): r["n"]
            for r in geotile_grid(_points(spark, PTS), z).collect()
        }
        want = {}
        for la, lo in PTS:
            k = (_py_tile(la, lo, z),)
            want[k] = want.get(k, 0) + 1
        assert got == want, z


def test_geotile_zoom0_single_tile(spark):
    out = geotile_grid(_points(spark, PTS), 0).collect()
    assert len(out) == 1 and out[0]["tile"] == "0/0/0"
    assert out[0]["n"] == len(PTS)


def test_haversine_known_pairs(spark):
    df = spark.createDataFrame([(1,)], "i long").select(
        haversine_km(F.lit(51.5007), F.lit(-0.1246),
                     F.lit(48.8566), F.lit(2.3522)).alias("lp"),
        haversine_km(F.lit(0.0), F.lit(0.0),
                     F.lit(0.0), F.lit(0.0)).alias("zero"),
        haversine_km(F.lit(0.0), F.lit(0.0),
                     F.lit(0.0), F.lit(180.0)).alias("anti"),
    ).collect()[0]
    assert df["lp"] == pytest.approx(343.5, abs=2.0)  # London-Paris
    assert df["zero"] == 0.0
    assert df["anti"] == pytest.approx(math.pi * 6371.0, rel=1e-9)


def test_bounds_centroid_exact(spark):
    out = {r["tag"]: r for r in
           geo_bounds_centroid(_points(spark, PTS), ["tag"]).collect()}
    for tag in ("t0", "t1"):
        mine = [(la, lo) for i, (la, lo) in enumerate(PTS)
                if f"t{i % 2}" == tag]
        assert out[tag]["min_lat"] == min(la for la, _ in mine)
        assert out[tag]["max_lon"] == max(lo for _, lo in mine)
        assert out[tag]["centroid_lat"] == pytest.approx(
            sum(la for la, _ in mine) / len(mine), abs=1e-12)
        assert out[tag]["n"] == len(mine)


def test_rings_partition_all_points(spark):
    out = geo_distance_rings(_points(spark, PTS), 0.0, 0.0,
                             [1000.0, 8000.0]).collect()
    assert sum(r["n"] for r in out) == len(PTS)
    names = {r["ring"] for r in out}
    assert names <= {"0-1000", "1000-8000", "8000-*"}
    for r in out:
        if r["ring"] == "0-1000":
            assert r["max_km"] < 1000.0
        if r["ring"] == "8000-*":
            assert r["min_km"] >= 8000.0


def test_with_coords_deterministic_and_bounded(spark):
    rows = [(i, dt.datetime(2024, 1, 1), "u", "click", 1.0, "{}")
            for i in range(1000)]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id string, event_type string,"
        " value double, props string",
    )
    pts = with_coords(ev).select("event_id", "lat", "lon").collect()
    assert len(pts) == 1000
    for r in pts:
        assert -60.1 < r["lat"] < 60.0
        assert -180.0 < r["lon"] < 180.1
    again = {r["event_id"]: (r["lat"], r["lon"]) for r in
             with_coords(ev).select("event_id", "lat", "lon").collect()}
    for r in pts:
        assert again[r["event_id"]] == (r["lat"], r["lon"])


def test_geo_line_truncates_before_collect(spark):
    from rt_etl_yahoo_search_engine_spark.functions.geo import geo_line

    rows = [("u1", i, float(i), float(-i)) for i in range(25)] + [
        ("u2", 100 + i, 1.0, 2.0) for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, lat double, lon double"
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    out = {
        r["user_id"]: (r["n_points"], r["line"])
        for r in geo_line(df, size=10).collect()
    }
    assert out["u1"][0] == 10
    assert out["u1"][1] == [[-float(i), float(i)] for i in range(10)]
    assert out["u2"][0] == 3
