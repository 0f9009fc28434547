"""Zonal stats goldens — mirrors geoprocessing/tests/test_zonal.py:17-70:
4×4 grid over bbox (0,0,4,4), value=y*4+x ∈ 0..15; full-extent stats
(count=16, sum=120), quadrant, non-intersecting → all-null, NaN excluded."""

import datetime as dt

import numpy as np
import pytest

from georiva_spark.operators import zonal
from georiva_spark.testing import grid_from_arrays, square_geojson

T0 = dt.datetime(2020, 1, 1)
VALS = np.arange(16, dtype=float).reshape(4, 4)


@pytest.fixture(scope="module")
def grid(spark):
    # y=0 row holds values 0..3 at lat 0.5 (south origin ⇒ value = y*4+x)
    return grid_from_arrays(spark, VALS, [T0])


@pytest.fixture(scope="module")
def boundaries(spark):
    return spark.createDataFrame(
        [(1, 1, "full", square_geojson(0, 0, 4, 4)),
         (2, 1, "quadrant", square_geojson(0, 0, 2, 2)),
         (3, 1, "faraway", square_geojson(100, 100, 101, 101)),
         (4, 1, "nullgeom", None)],
        "boundary_id long, level int, name string, geometry string")


def test_zonal_goldens(spark, grid, boundaries):
    out = {r.boundary_id: r for r in
           zonal.zonal_stats(grid, boundaries).collect()}
    full = out[1]
    assert full["count"] == 16 and full.sum == 120.0
    assert full.min == 0.0 and full.max == 15.0 and full.mean == 7.5
    # numpy population std of 0..15
    np.testing.assert_allclose(full.std, np.std(np.arange(16.0)), rtol=1e-12)
    quad = out[2]
    # pixels with centers in (0,0,2,2): values 0,1,4,5
    assert quad["count"] == 4 and quad.sum == 10.0 and quad.mean == 2.5
    far = out[3]
    assert far["count"] is None and far.mean is None and far.sum is None
    nullg = out[4]
    assert nullg["count"] is None and nullg.mean is None


def test_zonal_nan_excluded(spark, boundaries):
    vals = VALS.copy()
    vals[0, 0] = np.nan
    g = grid_from_arrays(spark, vals, [T0])
    out = {r.boundary_id: r for r in zonal.zonal_stats(g, boundaries).collect()}
    assert out[1]["count"] == 15 and out[1].sum == 120.0  # 0 removed


def test_zonal_rollup_one_pass_levels(spark, grid):
    """GROUPING SETS rollup: per-boundary rows plus per-level rows
    (boundary_id null) from a single aggregation."""
    b = spark.createDataFrame(
        [(1, 1, "west", square_geojson(0, 0, 2, 4)),
         (2, 1, "east", square_geojson(2, 0, 4, 4)),
         (3, 2, "inner", square_geojson(1, 1, 3, 3))],
        "boundary_id long, level int, name string, geometry string")
    rows = zonal.zonal_rollup(grid, b).collect()
    per_b = {r.boundary_id: r for r in rows if r.boundary_id is not None}
    per_l = {r.level: r for r in rows if r.boundary_id is None}
    assert per_b[1]["count"] == 8 and per_b[2]["count"] == 8
    assert per_b[3]["count"] == 4 and per_b[3]["sum"] == 5 + 6 + 9 + 10
    # level 1 rollup covers the whole grid (west ∪ east), one pass
    assert per_l[1]["count"] == 16 and per_l[1]["sum"] == 120.0
    assert per_l[2]["count"] == 4


def test_area_timeseries_mask(spark, grid):
    # triangle covering the lower-left half (below anti-diagonal)
    tri = ('{"type": "Polygon", "coordinates": '
           '[[[0.0, 0.0], [4.2, 0.0], [0.0, 4.2], [0.0, 0.0]]]}')
    out = zonal.area_timeseries(grid, tri, how="mean").collect()
    assert len(out) == 1
    # centers (x+0.5, y+0.5) with x+y+1 <= 4.2 ⇒ x+y <= 3: values
    # 0,1,2,3,4,5,6,8,9,12 → mean 5.0
    assert out[0].value == 5.0


def test_multipolygon_and_hole(spark, grid):
    # square with a hole: outer (0,0,4,4), hole (1,1,3,3) → ring pixels only
    geo = ('{"type": "Polygon", "coordinates": ['
           '[[0,0],[4,0],[4,4],[0,4],[0,0]],'
           '[[1,1],[3,1],[3,3],[1,3],[1,1]]]}')
    out = zonal.area_timeseries(grid, geo, how="sum").collect()
    # hole removes centers (1.5,1.5),(2.5,1.5),(1.5,2.5),(2.5,2.5)=5,6,9,10
    assert out[0].value == 120.0 - 30.0
