"""MVT vector-tile sink (S13): encoder round-trip, clip, Martin semantics.

Mirrors the reference Martin function contract
(create_martin_function.py:50-180): required params raise, a wrong
org/catalog/collection triple yields a valid EMPTY tile, features carry
boundary attrs + stats, geometry is clipped/quantized to the buffered
4096 extent.
"""

import math

import pytest
from pyspark.sql import functions as F

from georiva_spark.functions.geo import lonlat_to_webmercator_xy
from georiva_spark.sources.mvt_sink import (
    boundary_stats_tile, clip_ring, covering_tiles, decode_mvt, encode_mvt,
    export_tiles, mvt_geom_df, tile_envelope,
)


def test_tile_envelope_world_and_quadrant():
    xmin, ymin, xmax, ymax = tile_envelope(0, 0, 0)
    world = math.pi * 6378137.0
    assert xmin == pytest.approx(-world) and xmax == pytest.approx(world)
    # z1 (1,0) = NE quadrant
    xmin, ymin, xmax, ymax = tile_envelope(1, 1, 0)
    assert xmin == pytest.approx(0) and ymin == pytest.approx(0)
    assert xmax == pytest.approx(world) and ymax == pytest.approx(world)


def test_encode_decode_round_trip():
    rings = [[(0, 0), (100, 0), (100, 100), (0, 100)]]
    tile = encode_mvt([{"id": 7, "rings": rings,
                        "props": {"name": "west", "mean": 2.5,
                                  "count": 4, "flag": True}}])
    out = decode_mvt(tile)
    assert out["name"] == "boundary_stats"
    assert out["extent"] == 4096
    [feat] = out["features"]
    assert feat["id"] == 7
    assert feat["rings"] == rings
    props = {out["keys"][feat["tags"][i]]: out["values"][feat["tags"][i + 1]]
             for i in range(0, len(feat["tags"]), 2)}
    assert props == {"name": "west", "mean": 2.5, "count": 4, "flag": True}


def test_encode_empty_is_valid_layer():
    out = decode_mvt(encode_mvt([]))
    assert out["features"] == [] and out["name"] == "boundary_stats"


def test_clip_ring_square_overlap():
    # unit square shifted so half hangs outside [0, 10]
    ring = [(-5.0, 2.0), (5.0, 2.0), (5.0, 8.0), (-5.0, 8.0)]
    got = clip_ring(ring, 0.0, 10.0)
    assert sorted(got) == [(0.0, 2.0), (0.0, 8.0), (5.0, 2.0), (5.0, 8.0)]
    # fully outside → empty
    assert clip_ring([(20.0, 20.0), (30.0, 20.0), (30.0, 30.0)], 0, 10) == []
    # fully inside → unchanged (closing dup dropped)
    inner = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 1.0)]
    assert clip_ring(inner, 0, 10) == [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0)]


def test_mvt_geom_df_matches_scalar(spark):
    pts = [(-7.5, -6.0), (0.0, 6.0), (7.5, 0.0), (179.0, 84.0)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = {(r.lon, r.lat): (r.px, r.py)
           for r in mvt_geom_df(df, 2, 1, 2).collect()}
    xmin, ymin, xmax, ymax = tile_envelope(2, 1, 2)
    size = xmax - xmin
    for lon, lat in pts:
        mx, my = lonlat_to_webmercator_xy(lon, lat)
        exp = (round((mx - xmin) / size * 4096),
               round((ymax - my) / size * 4096))
        assert got[(lon, lat)] == exp


BOUNDARIES = [
    (1, 1, "west_box", '{"type": "Polygon", "coordinates": '
     '[[[-10, -10], [0, -10], [0, 10], [-10, 10], [-10, -10]]]}'),
    (2, 1, "east_box", '{"type": "Polygon", "coordinates": '
     '[[[0, -10], [10, -10], [10, 10], [0, 10], [0, -10]]]}'),
]


def _stats(spark):
    rows = [
        (1, 1, "acme", "forecast", "daily", "precip", "2026-03-01",
         2.5, 0.0, 5.0, 10.0, 1.2, 4),
        (2, 1, "acme", "forecast", "daily", "precip", "2026-03-01",
         3.5, 1.0, 6.0, 14.0, 1.0, 4),
        (2, 1, "other-org", "forecast", "daily", "precip", "2026-03-01",
         99.0, 99.0, 99.0, 99.0, 0.0, 1),
    ]
    return spark.createDataFrame(rows, (
        "boundary_id int, level int, org string, catalog string, "
        "collection string, variable string, time string, mean double, "
        "min double, max double, sum double, std double, count long"))


def test_boundary_stats_tile_pins_triple(spark):
    kw = dict(org="acme", catalog="forecast", collection="daily",
              variable="precip", time="2026-03-01", admin_level=1)
    tile = boundary_stats_tile(_stats(spark), BOUNDARIES, 2, 1, 2, **kw)
    out = decode_mvt(tile)
    assert [f["id"] for f in out["features"]] == [1, 2]
    props = {}
    [f1] = [f for f in out["features"] if f["id"] == 1]
    for i in range(0, len(f1["tags"]), 2):
        props[out["keys"][f1["tags"][i]]] = out["values"][f1["tags"][i + 1]]
    assert props["mean"] == 2.5 and props["name"] == "west_box"
    assert props["org"] == "acme"
    # wrong org → valid EMPTY tile, not an error (tenancy fail-closed)
    empty = boundary_stats_tile(_stats(spark), BOUNDARIES, 2, 1, 2,
                                **{**kw, "org": "nope"})
    assert decode_mvt(empty)["features"] == []


def test_boundary_stats_tile_requires_params(spark):
    kw = dict(org="acme", catalog="forecast", collection="daily",
              variable="precip", time="2026-03-01", admin_level=1)
    for missing in kw:
        bad = {**kw, missing: None}
        with pytest.raises(ValueError, match=missing):
            boundary_stats_tile(_stats(spark), BOUNDARIES, 2, 1, 2, **bad)


def test_covering_tiles_and_export(spark):
    # z2: west box lon [-10,0] touches x∈{1,2} (lon=0 is exactly the
    # x=2 tile edge — bbox cover is inclusive, clip+buffer decides later)
    assert sorted(covering_tiles(BOUNDARIES[0][3], 2)) == \
        [(1, 1), (1, 2), (2, 1), (2, 2)]
    stats = _stats(spark).where(F.col("org") == "acme")
    tiles = export_tiles(stats, BOUNDARIES, 2).collect()
    got = {(r.z, r.x, r.y): r for r in tiles}
    assert set(got) == {(2, 1, 1), (2, 1, 2), (2, 2, 1), (2, 2, 2)}
    for (z, x, y), r in got.items():
        out = decode_mvt(bytes(r.tile))
        ids = [f["id"] for f in out["features"]]
        assert r.n_features == len(ids)
        # the tile's own box is always present; the neighbour appears
        # as an edge sliver because it overlaps the 256px buffer
        assert (1 if x == 1 else 2) in ids
        for f in out["features"]:
            for ring in f["rings"]:
                for px, py in ring:
                    assert -256 <= px <= 4096 + 256
                    assert -256 <= py <= 4096 + 256


def test_tile_manifest_matches_decode(spark):
    """The manifest transform reports exactly what decode_mvt sees in
    each tile's bytes."""
    from georiva_spark.sources.mvt_sink import tile_manifest
    stats = _stats(spark).where(F.col("org") == "acme")
    tiles = export_tiles(stats, BOUNDARIES, 2)
    man = {(r.z, r.x, r.y, r.feature_id): r
           for r in tile_manifest(tiles).collect()}
    for r in tiles.collect():
        dec = decode_mvt(bytes(r.tile))
        for ft in dec["features"]:
            row = man[(r.z, r.x, r.y, ft["id"])]
            pts = [p for ring in ft["rings"] for p in ring]
            assert row.n_rings == len(ft["rings"])
            assert row.n_points == sum(len(ring) for ring in ft["rings"])
            assert (row.pxmin, row.pxmax) == (
                min(p[0] for p in pts), max(p[0] for p in pts))
            assert (row.pymin, row.pymax) == (
                min(p[1] for p in pts), max(p[1] for p in pts))
    assert len(man) == sum(r.n_features for r in tiles.collect())


def test_export_tile_matches_single_request(spark):
    """Bulk export produces byte-identical tiles to the per-request path."""
    stats = _stats(spark).where(F.col("org") == "acme")
    bulk = {(r.z, r.x, r.y): bytes(r.tile)
            for r in export_tiles(stats, BOUNDARIES, 2).collect()}
    single = boundary_stats_tile(
        _stats(spark), BOUNDARIES, 2, 1, 2, org="acme", catalog="forecast",
        collection="daily", variable="precip", time="2026-03-01",
        admin_level=1)
    # the per-request path keeps org/... columns as props; drop for compare
    b, s = decode_mvt(bulk[(2, 1, 2)]), decode_mvt(single)
    assert [f["rings"] for f in b["features"]] == \
           [f["rings"] for f in s["features"]]
    assert [f["id"] for f in b["features"]] == [f["id"] for f in s["features"]]
