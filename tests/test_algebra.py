"""Raster algebra goldens — mirrors geoprocessing/tests/test_algebra.py:9-59
(2×2 grids, exact expected matrices, NaN-skip, weighted mean, ÷0→null)."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from georiva_spark.functions.scalars import safe_divide
from georiva_spark.operators import algebra
from georiva_spark.testing import grid_from_arrays

T0 = dt.datetime(2020, 1, 1)


def _mat(df, col="value"):
    rows = df.select("y", "x", col).collect()
    h = max(r.y for r in rows) + 1
    w = max(r.x for r in rows) + 1
    m = np.full((h, w), np.nan)
    for r in rows:
        if r[col] is not None:
            m[r.y, r.x] = r[col]
    return m


@pytest.fixture(scope="module")
def ab(spark):
    a = grid_from_arrays(spark, [[1.0, 2.0], [3.0, 4.0]], [T0], variable="a")
    b = grid_from_arrays(spark, [[5.0, 6.0], [7.0, 8.0]], [T0], variable="b")
    return a, b


def test_combine_sum(spark, ab):
    a, b = ab
    out = algebra.combine([a, b], "sum")
    assert np.array_equal(_mat(out), [[6.0, 8.0], [10.0, 12.0]])


def test_combine_product(spark, ab):
    a, b = ab
    out = algebra.combine([a, b], "product")
    np.testing.assert_allclose(_mat(out), [[5.0, 12.0], [21.0, 32.0]],
                               rtol=1e-12)


def test_combine_min_max_mean(spark, ab):
    a, b = ab
    assert np.array_equal(_mat(algebra.combine([a, b], "min")),
                          [[1.0, 2.0], [3.0, 4.0]])
    assert np.array_equal(_mat(algebra.combine([a, b], "max")),
                          [[5.0, 6.0], [7.0, 8.0]])
    assert np.array_equal(_mat(algebra.combine([a, b], "mean")),
                          [[3.0, 4.0], [5.0, 6.0]])


def test_weighted_mean(spark, ab):
    # w=[3,1] → (3a+b)/4 = [[2,3],[4,5]]  (test_algebra.py weighted case)
    a, b = ab
    out = algebra.weighted_mean([a, b], [3.0, 1.0])
    assert np.array_equal(_mat(out), [[2.0, 3.0], [4.0, 5.0]])


def test_nan_skip_sum(spark):
    # a=[[null,2]], b=[[5,6]] → sum=[[5,8]]  (test_algebra.py NaN-skip)
    a = grid_from_arrays(spark, [[np.nan, 2.0]], [T0], variable="a")
    b = grid_from_arrays(spark, [[5.0, 6.0]], [T0], variable="b")
    out = algebra.combine([a, b], "sum")
    assert np.array_equal(_mat(out), [[5.0, 8.0]])


def test_all_nan_stays_null(spark):
    a = grid_from_arrays(spark, [[np.nan, 1.0]], [T0], variable="a")
    b = grid_from_arrays(spark, [[np.nan, 2.0]], [T0], variable="b")
    row = {(r.y, r.x): r.value for r in algebra.combine([a, b], "sum").collect()}
    assert row[(0, 0)] is None
    assert row[(0, 1)] == 3.0


def test_safe_divide_zero_is_null(spark):
    # test_algebra.py:55-59 — ÷0 → null, not inf
    df = spark.createDataFrame([(1.0, 0.0), (6.0, 3.0), (None, 2.0)],
                               "num double, den double")
    out = df.select(safe_divide(F.col("num"), F.col("den")).alias("q")).collect()
    assert [r.q for r in out] == [None, 2.0, None]


def test_align_join(spark, ab):
    a, b = ab
    j = algebra.align(a, b)
    got = {(r.y, r.x): (r.a, r.b) for r in j.collect()}
    assert got[(0, 0)] == (1.0, 5.0) and got[(1, 1)] == (4.0, 8.0)
