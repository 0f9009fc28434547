"""Regrid (mirrors geoprocessing/tests/test_regrid.py), unit registry, and
exotic-calendar tests."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from georiva_spark.functions import calendar as cal
from georiva_spark.functions import units
from georiva_spark.operators import regrid
from georiva_spark.testing import grid_from_arrays

T0 = dt.datetime(2020, 1, 1)


def _mat(df, h, w, col="value"):
    m = np.full((h, w), np.nan)
    for r in df.collect():
        if r[col] is not None:
            m[r.y, r.x] = r[col]
    return m


def test_nearest_upsample_preserves_range(spark):
    # test_regrid.py:10-36 — 2×2 → 4×4 nearest upsample
    g = grid_from_arrays(spark, [[1.0, 2.0], [3.0, 4.0]], [T0],
                         lat0=0.0, lon0=0.0, res=2.0)
    out = regrid.regrid_nearest(g, src=(0.0, 0.0, 2.0),
                                dst=(0.0, 0.0, 1.0), dst_shape=(4, 4))
    m = _mat(out, 4, 4)
    assert m.min() == 1.0 and m.max() == 4.0
    assert np.array_equal(m[:2, :2], [[1.0, 1.0], [1.0, 1.0]])
    assert np.array_equal(m[2:, 2:], [[4.0, 4.0], [4.0, 4.0]])


def test_bilinear_upsample_matches_numpy(spark):
    """2×2 → 4×4 bilinear (reference fixture shape, test_regrid.py:10-36,
    Resampling.bilinear): parity with a closed-form numpy evaluation of
    the same clamped-edge 4-neighbour interpolation."""
    data = np.array([[0.0, 10.0], [20.0, 30.0]])
    g = grid_from_arrays(spark, data.tolist(), [T0],
                         lat0=0.0, lon0=0.0, res=1.0)
    out = regrid.regrid_bilinear(g, src=(0.0, 0.0, 1.0),
                                 dst=(0.0, 0.0, 0.5), dst_shape=(4, 4),
                                 src_shape=(2, 2))
    m = _mat(out, 4, 4)

    want = np.zeros((4, 4))
    for ty in range(4):
        for tx in range(4):
            fy = (0.5 * (ty + 0.5)) / 1.0 - 0.5
            fx = (0.5 * (tx + 0.5)) / 1.0 - 0.5
            y0, x0 = int(np.floor(fy)), int(np.floor(fx))
            wy, wx = fy - y0, fx - x0
            acc = wsum = 0.0
            for dy, wyy in ((0, 1 - wy), (1, wy)):
                for dx, wxx in ((0, 1 - wx), (1, wx)):
                    sy = min(max(y0 + dy, 0), 1)
                    sx = min(max(x0 + dx, 0), 1)
                    if wyy * wxx > 0:
                        acc += wyy * wxx * data[sy, sx]
                        wsum += wyy * wxx
            want[ty, tx] = acc / wsum
    np.testing.assert_allclose(m, want, rtol=1e-12)
    # corners clamp to their source pixel; (1,1) is the known blend
    # 0.5625·0 + 0.1875·10 + 0.1875·20 + 0.0625·30 = 7.5
    assert m[0, 0] == 0.0 and m[3, 3] == 30.0
    np.testing.assert_allclose(m[1, 1], 7.5, rtol=1e-12)


def test_bilinear_shuffle_path_matches_broadcast(spark):
    """The big-target (shuffle-join) and small-target (broadcast) paths
    are the same computation — only the join strategy differs."""
    g = grid_from_arrays(spark, np.arange(16.0).reshape(4, 4).tolist(),
                         [T0])
    kw = dict(src=(0.0, 0.0, 1.0), dst=(0.0, 0.0, 0.5),
              dst_shape=(8, 8), src_shape=(4, 4))
    a = {(r.y, r.x): r.value
         for r in regrid.regrid_bilinear(g, **kw).collect()}
    b = {(r.y, r.x): r.value
         for r in regrid._regrid_bilinear(g, broadcast_max_targets=1,
                                          **kw).collect()}
    assert a == b


def test_identity_regrid(spark):
    g = grid_from_arrays(spark, [[1.0, 2.0], [3.0, 4.0]], [T0])
    out = regrid.regrid_nearest(g, src=(0.0, 0.0, 1.0),
                                dst=(0.0, 0.0, 1.0), dst_shape=(2, 2))
    assert np.array_equal(_mat(out, 2, 2), [[1.0, 2.0], [3.0, 4.0]])


def test_average_downsample(spark):
    g = grid_from_arrays(spark, np.arange(16, dtype=float).reshape(4, 4), [T0])
    out = regrid.regrid_average(g, dst=(0.0, 0.0, 2.0))
    m = _mat(out, 2, 2)
    # each 2×2 block averaged: [[2.5, 4.5], [10.5, 12.5]]
    assert np.array_equal(m, [[2.5, 4.5], [10.5, 12.5]])


def test_overview_pyramid_levels(spark):
    g = grid_from_arrays(spark, np.arange(16, dtype=float).reshape(4, 4), [T0])
    pyr = regrid.overview_pyramid(g, levels=2)
    counts = {r.level: r.n for r in
              pyr.groupBy("level").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 16, 1: 4, 2: 1}
    top = pyr.where(F.col("level") == 2).collect()[0]
    assert top.value == 7.5  # global mean


def test_unit_conversions(spark):
    assert units.conversion("K", "degC") == (1.0, -273.15)
    f, o = units.conversion("degC", "K")
    assert f == 1.0 and o == 273.15
    f, o = units.conversion("m", "mm")
    assert f == 1000.0 and o == 0.0
    f, o = units.conversion("mm", "kg m-2")   # met. precipitation context
    assert f == 1.0 and o == 0.0
    f, o = units.conversion("km/h", "m/s")
    np.testing.assert_allclose(f, 1 / 3.6)
    # degF roundtrip: 32F → 0C
    df = spark.range(1).select(F.lit(32.0).alias("v"))
    got = df.select(units.convert(F.col("v"), "degF", "degC").alias("c")).collect()
    np.testing.assert_allclose(got[0].c, 0.0, atol=1e-12)


def test_unit_errors(spark):
    with pytest.raises(units.UndefinedUnitError):
        units.conversion("furlong", "m")
    with pytest.raises(units.IncompatibleUnitsError):
        units.conversion("K", "mm")


@pytest.fixture()
def cal360(spark):
    rows = [(2020, m, d, float(m)) for m in range(1, 13) for d in (1, 30)]
    return spark.createDataFrame(
        rows, "cal_year int, cal_month int, cal_day int, value double")


def test_calendar_season_and_days(spark, cal360):
    djf = cal.season_filter_cal(cal360, "DJF")
    assert {r.cal_month for r in djf.collect()} == {12, 1, 2}
    d = cal360.select(cal.days_in_month("360_day", F.col("cal_month")).alias("n"))
    assert {r.n for r in d.collect()} == {30}
    d2 = cal360.select("cal_month",
                       cal.days_in_month("noleap", F.col("cal_month")).alias("n"))
    got = {r.cal_month: r.n for r in d2.collect()}
    assert got[2] == 28 and got[12] == 31


def test_align_360day_date_mode_drops_impossible(spark):
    rows = [(2021, 2, 28, 1.0), (2021, 2, 30, 2.0), (2021, 6, 15, 3.0)]
    df = spark.createDataFrame(
        rows, "cal_year int, cal_month int, cal_day int, value double")
    out = cal.align_to_gregorian(df, "360_day", align_on="date").collect()
    # Feb-30 doesn't exist in Gregorian → dropped
    assert sorted(r.value for r in out) == [1.0, 3.0]


def test_align_360day_year_mode_keeps_all(spark, cal360):
    out = cal.align_to_gregorian(cal360, "360_day", align_on="year")
    rows = out.collect()
    assert len(rows) == 24  # nothing dropped
    # day 360 of the 360-day year maps to Dec 31 (day 366 of leap 2020)
    last = [r for r in rows if r.cal_month == 12 and r.cal_day == 30][0]
    assert (last.time.month, last.time.day) == (12, 31)
    first = [r for r in rows if r.cal_month == 1 and r.cal_day == 1][0]
    assert (first.time.month, first.time.day) == (1, 1)
