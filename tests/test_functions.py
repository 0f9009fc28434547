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


def test_utm_roundtrip_and_meridian_arc():
    """Krüger-series UTM: inverse(forward) at nano-degree level, and the
    ABSOLUTE check — central-meridian northing equals k0 times the
    numerically integrated meridian arc (no circular series reuse)."""
    from georiva_spark.functions import geo
    lats = np.array([-75.0, -40.0, -1.0, 0.5, 23.7, 52.1, 71.3])
    lons = np.array([0.2, 1.5, 2.9, 3.0, 4.4, 5.8, 0.1])
    E, N = geo.utm_forward_np(lats, lons, 31)
    la2, lo2 = geo.utm_inverse_np(E, N, 31)
    np.testing.assert_allclose(la2, lats, atol=1e-8)
    np.testing.assert_allclose(lo2, lons, atol=1e-8)
    a, e2 = geo.WGS84_A, geo._E2
    for lat in (10.0, 45.0, 80.0):
        phis = np.linspace(0, np.radians(lat), 400_001)
        arc = np.trapz(a * (1 - e2)
                       / np.power(1 - e2 * np.sin(phis) ** 2, 1.5), phis)
        E0, N0 = geo.utm_forward_np(np.array([lat]), np.array([3.0]), 31)
        assert abs(E0[0] - 500_000.0) < 1e-6      # on the central meridian
        assert abs(N0[0] - 0.9996 * arc) < 0.01   # cm-level vs integral
    # southern-hemisphere false northing
    _, Ns = geo.utm_forward_np(np.array([-10.0]), np.array([3.0]), 31,
                               south=True)
    assert 8_000_000 < Ns[0] < 10_000_000


def test_polar_stereo_roundtrip_scale_and_sphere_limit():
    from georiva_spark.functions import geo
    la = np.array([60.0, 70.0, 85.0, 89.9])
    lo = np.array([-45.0, 10.0, 123.0, -170.0])
    x, y = geo.polar_stereo_np(la, lo)
    la2, lo2 = geo.polar_stereo_inverse_np(x, y)
    np.testing.assert_allclose(la2, la, atol=1e-9)
    dl = (lo2 - lo + 180) % 360 - 180
    np.testing.assert_allclose(dl, 0, atol=1e-9)
    # true scale at lat_ts: mapped meridian length == ellipsoid arc
    h = 1e-6
    x1, y1 = geo.polar_stereo_np(np.array([70 - h]), np.array([-45.0]))
    x2, y2 = geo.polar_stereo_np(np.array([70 + h]), np.array([-45.0]))
    phi = np.radians(70.0)
    mcurv = geo.WGS84_A * (1 - geo._E2) \
        / np.power(1 - geo._E2 * np.sin(phi) ** 2, 1.5)
    scale = np.hypot(x2 - x1, y2 - y1)[0] / (mcurv * np.radians(2 * h))
    assert abs(scale - 1.0) < 1e-6
    # south aspect round-trips too (EPSG:3976 family)
    xs, ys = geo.polar_stereo_np(np.array([-70.0]), np.array([30.0]),
                                 lat_ts=-70.0, lon0=0.0, south=True)
    las, los = geo.polar_stereo_inverse_np(xs, ys, lat_ts=-70.0,
                                           lon0=0.0, south=True)
    assert abs(las[0] + 70.0) < 1e-9 and abs(los[0] - 30.0) < 1e-9


def test_utm_ps_columns_match_numpy(spark):
    from georiva_spark.functions import geo
    pts = [(52.1, 4.4), (-1.0, 0.2), (71.3, 5.8), (60.0, 2.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    e_c, n_c = geo.utm_cols(F.col("lat"), F.col("lon"), 31)
    px_c, py_c = geo.polar_stereo_cols(F.col("lat"), F.col("lon"))
    rows = df.select("lat", "lon", e_c, n_c, px_c, py_c).collect()
    for r in rows:
        E, N = geo.utm_forward_np(np.array([r.lat]), np.array([r.lon]), 31)
        X, Y = geo.polar_stereo_np(np.array([r.lat]), np.array([r.lon]))
        assert abs(r.easting - E[0]) < 1e-6
        assert abs(r.northing - N[0]) < 1e-6
        assert abs(r.ps_x - X[0]) < 1e-6 and abs(r.ps_y - Y[0]) < 1e-6


def test_reproject_geometry_utm_and_ps():
    import json
    from georiva_spark.functions import geo
    poly = json.dumps({"type": "Polygon", "coordinates":
                       [[[3.0, 50.0], [4.0, 50.0], [4.0, 51.0],
                         [3.0, 50.0]]]})
    out = json.loads(reproject_geometry(poly, "EPSG:32631"))
    E, N = geo.utm_forward_np(np.array([50.0]), np.array([3.0]), 31)
    assert abs(out["coordinates"][0][0][0] - E[0]) < 1e-6
    assert abs(out["coordinates"][0][0][1] - N[0]) < 1e-6
    back = json.loads(reproject_geometry(json.dumps(out), "EPSG:4326",
                                         src_crs="EPSG:32631"))
    assert abs(back["coordinates"][0][0][0] - 3.0) < 1e-8
    assert abs(back["coordinates"][0][0][1] - 50.0) < 1e-8
    arctic = json.dumps({"type": "Polygon", "coordinates":
                         [[[-45.0, 70.0], [-40.0, 72.0], [-45.0, 75.0],
                           [-45.0, 70.0]]]})
    ps = json.loads(reproject_geometry(arctic, "EPSG:3413"))
    assert abs(ps["coordinates"][0][0][0]) < 1e-6   # on lon0 → x = 0
    rt = json.loads(reproject_geometry(json.dumps(ps), "EPSG:4326",
                                       src_crs="EPSG:3413"))
    assert abs(rt["coordinates"][0][1][0] + 40.0) < 1e-8
    assert abs(rt["coordinates"][0][1][1] - 72.0) < 1e-8


def test_local_frame_matches_classic_createdataframe(spark):
    """r11 Arrow-backed local frames: identical rows, schema, and
    null semantics to the classic list path — across string/integral
    keys with NULLs, double arrays, timestamps, and nullable doubles
    (the shapes the engine builds: sampler weights, centroids, grid
    fixtures) — plus the empty-input edge."""
    import datetime as dt

    from georiva_spark.functions.frames import local_frame

    cases = [
        ([("en", 5), (None, 7)], "s string, w long"),
        ([(3, 5), (None, 7)], "s bigint, w long"),
        ([(0, [1.0, 2.0]), (1, [3.5, None])],
         "cell int, embedding array<double>"),
        ([(1, dt.datetime(2020, 1, 2, 3, 4, 5), 1.5),
          (2, None, None)],
         "id long, ts timestamp, v double"),
        ([], "a int, b string"),
    ]
    for rows, schema in cases:
        got = local_frame(spark, rows, schema)
        want = spark.createDataFrame(rows, schema)
        assert got.schema == want.schema, schema
        key = lambda t: tuple(map(repr, t))          # noqa: E731
        assert sorted(map(tuple, got.collect()), key=key) \
            == sorted(map(tuple, want.collect()), key=key), schema
