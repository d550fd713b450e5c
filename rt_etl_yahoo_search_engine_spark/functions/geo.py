"""Geo aggregations — ES `geotile_grid`, `geo_bounds`, `geo_centroid`,
and `geo_distance` (ring buckets), expression-only over (lat, lon)
point columns.

The synthetic corpus has no geo fields, so `with_coords` derives a
deterministic point per event from integer arithmetic on event_id
(exact in any engine — the same rows come out of the SQL oracle); a
real deployment maps its own lat/lon columns and every aggregate below
is unchanged.

geotile_grid uses the Web-Mercator tiling ES uses ("z/x/y" keys):

    x = floor((lon + 180) / 360 * 2^z)
    y = floor((1 - ln(tan(lat) + 1/cos(lat)) / pi) / 2 * 2^z)

The coordinate derivation keeps longitudes off tile boundaries (the
0.0007-degree offset makes (lon+180) never a multiple of 360/2^z), so
engine/oracle floor() agreement doesn't ride on transcendental-function
ulps at grid edges; latitude boundaries are transcendental, never hit
by construction.

Scale shape: every function is one scan + one groupBy on a small key
(tiles at zoom z are bounded by 4^z; rings by the ring list; bounds/
centroid by the facet cardinality) — map-side combinable, no shuffle
of anything but partial aggregates, no UDF, no window.  The reference
engine has no geo surface at all; this is the ES-parity layer a
search-analytics sidebar needs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def with_coords(events: DataFrame) -> DataFrame:
    """events + (lat, lon) derived deterministically from event_id —
    3-decimal grid, offset to avoid tile boundaries (see module
    docstring).  Built from double literals (not SQL decimal literals)
    so the arithmetic is IEEE double end to end, matching any engine's
    double evaluation of the same expression."""
    lat = (
        F.lit(-60.0005)
        + (F.col("event_id") * F.lit(7919) % F.lit(120000)) / F.lit(1000.0)
    )
    lon = (
        F.lit(-179.9993)
        + (F.col("event_id") * F.lit(104729) % F.lit(360000)) / F.lit(1000.0)
    )
    return events.withColumn("lat", lat).withColumn("lon", lon)


def geotile_grid(points: DataFrame, zoom: int,
                 keys: list[str] | None = None) -> DataFrame:
    """(tile, <keys...>, n): point counts per Web-Mercator tile at
    `zoom` — ES geotile_grid with its "z/x/y" string keys."""
    n_tiles = float(2 ** zoom)
    x = F.floor((F.col("lon") + 180.0) / 360.0 * n_tiles)
    lat_r = F.radians(F.col("lat"))
    y = F.floor(
        (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / math.pi)
        / 2.0 * n_tiles
    )
    tile = F.concat_ws(
        "/", F.lit(zoom).cast("string"),
        x.cast("long").cast("string"), y.cast("long").cast("string"),
    )
    keys = keys or []
    return (
        points.withColumn("tile", tile)
        .groupBy("tile", *keys)
        .agg(F.count("*").alias("n"))
    )


def geo_bounds_centroid(points: DataFrame,
                        keys: list[str] | None = None) -> DataFrame:
    """(<keys...>, min_lat, max_lat, min_lon, max_lon, centroid_lat,
    centroid_lon, n): ES geo_bounds + geo_centroid in one pass."""
    keys = keys or []
    return points.groupBy(*keys).agg(
        F.min("lat").alias("min_lat"),
        F.max("lat").alias("max_lat"),
        F.min("lon").alias("min_lon"),
        F.max("lon").alias("max_lon"),
        F.avg("lat").alias("centroid_lat"),
        F.avg("lon").alias("centroid_lon"),
        F.count("*").alias("n"),
    )


_EARTH_R_KM = 6371.0


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance (km) between column/literal coordinate
    pairs — the standard haversine on a 6371 km sphere (ES's
    arc distance uses the same spherical model)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2) - F.radians(lat1)
    dlmb = F.radians(lon2) - F.radians(lon1)
    a = (
        F.sin(dphi / 2.0) * F.sin(dphi / 2.0)
        + F.cos(p1) * F.cos(p2) * F.sin(dlmb / 2.0) * F.sin(dlmb / 2.0)
    )
    return 2.0 * _EARTH_R_KM * F.asin(F.sqrt(a))


def geo_distance_rings(points: DataFrame, origin_lat: float,
                       origin_lon: float,
                       edges_km: list[float]) -> DataFrame:
    """(ring, n, min_km, max_km): point counts per half-open distance
    ring [prev, edge) around the origin, last ring unbounded — ES
    geo_distance aggregation.  Ring label = "from-to" like ES's keys."""
    d = haversine_km(
        F.col("lat"), F.col("lon"),
        F.lit(float(origin_lat)), F.lit(float(origin_lon)),
    )
    prev = 0.0
    labels = []
    for e in edges_km:
        labels.append((f"{prev:g}-{e:g}", prev, e))
        prev = e
    labels.append((f"{prev:g}-*", prev, None))
    ring = None
    for name, lo, hi in labels:
        cond = (d >= F.lit(lo)) if hi is None else (
            (d >= F.lit(lo)) & (d < F.lit(hi))
        )
        ring = F.when(cond, F.lit(name)) if ring is None else ring.when(
            cond, F.lit(name)
        )
    return (
        points.withColumn("ring", ring)
        .withColumn("d_km", d)
        .groupBy("ring")
        .agg(
            F.count("*").alias("n"),
            F.min("d_km").alias("min_km"),
            F.max("d_km").alias("max_km"),
        )
    )


def geo_line(
    points: DataFrame,
    group_col: str = "user_id",
    sort_col: str = "ts",
    id_col: str = "event_id",
    size: int = 10,
) -> DataFrame:
    """(group, line, n_points) — ES `geo_line` aggregation: per group,
    the track of [lon, lat] points ordered by `sort_col` (ES sorts by a
    numeric/date field and emits a GeoJSON LineString), truncated to
    the FIRST `size` points (ES's size, default 10k).  `id_col` breaks
    sort ties deterministically.

    Scale shape: truncation happens BEFORE collection — a
    Window.partitionBy(group) row_number with a rank <= size filter
    (WindowGroupLimit pushes the limit into the partial stage, so at
    most `size` rows per group survive the exchange) — then one
    groupBy collects the bounded point list; sort_array (not
    collection order) fixes the within-list order, so the result is
    partition-layout independent.  Per-group state is bounded by
    `size` points, the same bound ES enforces."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.asc(sort_col), F.asc(id_col)
    )
    kept = points.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= size
    )
    return (
        kept.groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(sort_col).alias("_s"),
                        F.col(id_col).alias("_i"),
                        F.array(
                            F.round("lon", 6), F.round("lat", 6)
                        ).alias("_p"),
                    )
                )
            ).alias("_pts"),
        )
        .select(
            group_col,
            F.expr("transform(_pts, x -> x._p)").alias("line"),
            "n_points",
        )
    )


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_grid(points: DataFrame, precision: int = 4,
                 keys: list[str] | None = None) -> DataFrame:
    """(geohash, <keys...>, n): point counts per geohash cell at
    `precision` chars — ES `geohash_grid` (the other grid agg beside
    geotile_grid; geohash is the classic base32 Z-order encoding).

    The hash is computed RELATIONALLY, no UDF: with nbits = 5*precision
    (lon takes ceil(nbits/2) bits, lat the rest),
        cellx = floor((lon + 180) / 360 * 2^lonbits)
        celly = floor((lat + 90) / 180 * 2^latbits)
    and each output char c_i packs the five interleaved bits
    (lon bit, lat bit, ...) indexed from the MSB — plain shift/mask
    arithmetic on two longs, then a base32 substr per char.  All
    whole-stage codegen: one scan + one small-key groupBy (cells at
    precision p are bounded by 32^p and in practice by the data
    extent), map-side combinable.

    Engine/oracle floor() agreement rides on the mirrored expression
    ORDER (the same fixed-op-order contract as the other geo aggs):
    both engines evaluate the identical IEEE-double expression, so even
    a coordinate landing exactly on a cell edge floors identically."""
    if precision < 1 or precision > 8:
        raise ValueError(f"precision must be 1..8, got {precision}")
    nbits = 5 * precision
    lonbits = (nbits + 1) // 2
    latbits = nbits // 2
    cellx = F.floor(
        (F.col("lon") + 180.0) / 360.0 * F.lit(float(2 ** lonbits))
    ).cast("long")
    celly = F.floor(
        (F.col("lat") + 90.0) / 180.0 * F.lit(float(2 ** latbits))
    ).cast("long")
    chars = []
    for i in range(precision):
        idx = F.lit(0)
        for kbit in range(5):
            g = 5 * i + kbit
            if g % 2 == 0:  # even global bits come from lon
                bit = F.shiftright(cellx, lonbits - 1 - g // 2)
            else:
                bit = F.shiftright(celly, latbits - 1 - (g - 1) // 2)
            idx = idx + bit.bitwiseAND(F.lit(1)) * F.lit(1 << (4 - kbit))
        chars.append(
            F.substr(F.lit(GEOHASH_BASE32), (idx + 1).cast("int"), F.lit(1))
        )
    keys = keys or []
    return (
        points.withColumn("geohash", F.concat(*chars))
        .groupBy("geohash", *keys)
        .agg(F.count("*").alias("n"))
    )
