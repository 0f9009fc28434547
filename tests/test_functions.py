"""Scalar/geo/vector function goldens (FIXTURES §F3: u=3,v=4 → speed 5;
direction u=0,v=-1 → 0°, u=-1,v=0 → 90°; affine index math; even-odd
containment)."""

import numpy as np
from pyspark.sql import functions as F

from georiva_spark.functions.geo import (
    affine_index, lonlat_to_webmercator_xy, parse_geojson,
    points_in_geometry, reproject_geometry, webmercator_to_lonlat_xy,
)
from georiva_spark.functions.scalars import (
    normalize_lon, rescale_255, unit_conversion_expr,
    vector_direction, vector_magnitude,
)
from georiva_spark.functions.vectors import cosine_similarity, dot


def test_vector_transform_goldens(spark):
    df = spark.createDataFrame(
        [(3.0, 4.0), (0.0, -1.0), (-1.0, 0.0), (0.0, 1.0)], "u double, v double")
    out = df.select(vector_magnitude(F.col("u"), F.col("v")).alias("speed"),
                    vector_direction(F.col("u"), F.col("v")).alias("dir")).collect()
    assert out[0].speed == 5.0
    assert out[1].dir == 0.0     # wind FROM north
    assert out[2].dir == 90.0    # wind FROM east
    assert out[3].dir == 180.0   # wind FROM south


def test_unit_conversion_and_rescale(spark):
    df = spark.createDataFrame([(273.15,), (373.15,), (-10.0,)], "v double")
    out = df.select(
        unit_conversion_expr(F.col("v"), 1.0, -273.15).alias("celsius"),
        rescale_255(F.col("v"), 0.0, 510.0).alias("enc")).collect()
    assert [r.celsius for r in out] == [0.0, 100.0, -283.15]
    assert out[0].enc == 273.15 / 2 and out[2].enc == 0.0


def test_normalize_lon(spark):
    df = spark.createDataFrame([(0.0,), (180.0,), (359.0,), (190.0,)], "lon double")
    assert [r[0] for r in df.select(normalize_lon(F.col("lon"))).collect()] == \
        [0.0, 180.0, -1.0, -170.0]


def test_affine_index_nearest():
    # grid origin (-6, -7.5), res 1: centers at (.5 offsets)
    assert affine_index(-6.0, -7.5, 1.0, 0.2, 0.3) == (6, 7)
    assert affine_index(-6.0, -7.5, 1.0, -5.99, -7.49) == (0, 0)
    # exact boundary snaps to the containing (higher) pixel
    assert affine_index(-6.0, -7.5, 1.0, -5.0, -6.5) == (1, 1)


def test_points_in_geometry_triangle_and_hole():
    tri = parse_geojson('{"type": "Polygon", "coordinates": '
                        '[[[0, 0], [4, 0], [0, 4], [0, 0]]]}')
    lon = np.array([0.5, 1.5, 3.5, 2.0])
    lat = np.array([0.5, 1.5, 3.5, 1.5])
    got = points_in_geometry(lon, lat, tri)
    assert got.tolist() == [True, True, False, True]
    hole = parse_geojson('{"type": "Polygon", "coordinates": ['
                         '[[0,0],[4,0],[4,4],[0,4],[0,0]],'
                         '[[1,1],[3,1],[3,3],[1,3],[1,1]]]}')
    got2 = points_in_geometry(np.array([0.5, 2.0]), np.array([0.5, 2.0]), hole)
    assert got2.tolist() == [True, False]


def test_salted_stats_equals_plain_groupby(spark):
    """Salting must be observationally identical to a plain groupBy —
    including on a pathologically skewed key distribution."""
    from georiva_spark.functions.skew import salted_stats
    rows = ([("hot", float(i)) for i in range(5000)]
            + [("cold", 1.0), ("cold", 3.0)])
    df = spark.createDataFrame(rows, "k string, value double")
    got = {r.k: (r.n, r.sum, r.min, r.max, r.mean)
           for r in salted_stats(df, ["k"], salt_buckets=8).collect()}
    want = {r.k: (r.n, r.sum, r.min, r.max, r.sum / r.n)
            for r in df.groupBy("k").agg(
                F.count("value").alias("n"), F.sum("value").alias("sum"),
                F.min("value").alias("min"),
                F.max("value").alias("max")).collect()}
    assert got == want


def test_webmercator_known_values_and_roundtrip():
    # antimeridian lands at the mercator edge; the max-lat clamp squares it
    x, y = lonlat_to_webmercator_xy(180.0, 85.05112877980659)
    np.testing.assert_allclose([x, y], [20037508.342789244] * 2, rtol=1e-9)
    np.testing.assert_allclose(lonlat_to_webmercator_xy(0.0, 0.0),
                               (0.0, 0.0), atol=1e-8)
    for lon, lat in [(-7.5, -6.0), (36.8, -1.3), (151.2, -33.9)]:
        X, Y = lonlat_to_webmercator_xy(lon, lat)
        lon2, lat2 = webmercator_to_lonlat_xy(X, Y)
        np.testing.assert_allclose([lon2, lat2], [lon, lat], atol=1e-12)


def test_webmercator_columns_clamp_poles(spark):
    from georiva_spark.functions.geo import webmercator_xy
    df = spark.createDataFrame([(90.0, 0.0), (-90.0, 10.0), (0.0, 0.0)],
                               "lat double, lon double")
    mx, my = webmercator_xy(F.col("lat"), F.col("lon"))
    rows = df.select(mx, my).collect()
    assert all(np.isfinite(r.merc_y) for r in rows)
    assert abs(rows[0].merc_y - 20037508.342789244) < 1.0


def test_reproject_geometry_4326_3857():
    import json
    poly = json.dumps({"type": "Polygon", "coordinates":
                       [[[0, 0], [1, 0], [1, 1], [0, 0]]]})
    out = json.loads(reproject_geometry(poly, "EPSG:3857"))
    assert out["type"] == "Polygon"
    np.testing.assert_allclose(out["coordinates"][0][1][0],
                               111319.49079327358, rtol=1e-12)
    back = json.loads(reproject_geometry(json.dumps(out), "EPSG:4326",
                                         src_crs="EPSG:3857"))
    np.testing.assert_allclose(back["coordinates"], json.loads(poly)[
        "coordinates"], atol=1e-12)
    assert reproject_geometry(poly, "epsg:4326") == poly  # identity


def test_parse_geojson_invalid():
    assert parse_geojson(None) is None
    assert parse_geojson("not json") is None
    assert parse_geojson('{"type": "Point", "coordinates": [0, 0]}') is None


def test_vector_dot_cosine(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])],
                               "a array<double>, b array<double>")
    out = df.select(dot(F.col("a"), F.col("b")).alias("d"),
                    cosine_similarity(F.col("a"), F.col("a")).alias("self")).collect()
    assert out[0].d == 32.0
    np.testing.assert_allclose(out[0].self, 1.0, rtol=1e-12)
