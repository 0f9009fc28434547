"""Temporal operator goldens — mirrors geoprocessing/tests/test_temporal.py:
16-90: 24-month series 0..23 → yearly means (5.5, 17.5); DJF keeps months
{12,1,2}; JJA climatology 13 vs baseline 10 → anomaly 3.0, relative 0.3."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from georiva_spark.operators import temporal, filters
from georiva_spark.testing import grid_from_arrays, month_starts


@pytest.fixture(scope="module")
def cube24(spark):
    # (time=24, y=2, x=3), every pixel at time t equals t
    times = month_starts(dt.datetime(2020, 1, 1), 24)
    arr = np.array([np.full((2, 3), float(t)) for t in range(24)])
    return grid_from_arrays(spark, arr, times)


def test_yearly_resample_means(spark, cube24):
    out = temporal.resample(cube24, "year", "mean")
    got = sorted({(r.time.year, r.value) for r in out.collect()})
    assert got == [(2020, 5.5), (2021, 17.5)]


def test_monthly_resample_identity(spark, cube24):
    out = temporal.resample(cube24, "month", "mean")
    assert out.count() == 24 * 6
    vals = {r.time.month + 12 * (r.time.year - 2020): r.value
            for r in out.collect() if (r.y, r.x) == (0, 0)}
    assert vals[1] == 0.0 and vals[24] == 23.0


def test_djf_selection(spark, cube24):
    out = filters.season_filter(cube24, "DJF")
    months = sorted({(r.time.year, r.time.month) for r in out.collect()})
    # 24 months from 2020-01: DJF ⇒ 2020-01,2020-02,2020-12,2021-01,2021-02,2021-12
    assert months == [(2020, 1), (2020, 2), (2020, 12),
                      (2021, 1), (2021, 2), (2021, 12)]
    assert {m for _, m in months} == {12, 1, 2}


def test_jja_climatology_anomaly(spark):
    # value year (2022): constant 13; baseline years (2020-2021): constant 10
    times = month_starts(dt.datetime(2020, 1, 1), 36)
    arr = np.array([np.full((2, 3), 10.0) for _ in range(24)] +
                   [np.full((2, 3), 13.0) for _ in range(12)])
    g = grid_from_arrays(spark, arr, times)
    value = temporal.climatology(filters.year_window(g, 2022, 2022), "JJA")
    base = temporal.climatology(filters.year_window(g, 2020, 2021), "JJA")
    anom = temporal.anomaly(value, base)
    rel = temporal.anomaly(value, base, relative=True)
    assert {r.value for r in anom.collect()} == {3.0}
    np.testing.assert_allclose([r.value for r in rel.collect()],
                               np.full(6, 0.3), rtol=1e-12)


def test_trend_slope_matches_polyfit(spark):
    # per-pixel yearly means 2.0, 5.0, 8.0 over 2020-2022 → slope 3.0/yr
    times = month_starts(dt.datetime(2020, 1, 1), 36)
    arr = np.array([np.full((1, 2), 2.0 + 3.0 * (i // 12)) for i in range(36)])
    g = grid_from_arrays(spark, arr, times)
    out = temporal.trend(g, season="annual")
    vals = [r.value for r in out.collect()]
    np.testing.assert_allclose(vals, [3.0, 3.0], rtol=1e-12)
    # cross-check vs numpy polyfit closed form
    np.testing.assert_allclose(
        np.polyfit([2020, 2021, 2022], [2.0, 5.0, 8.0], 1)[0], 3.0, rtol=1e-12)


def test_trend_single_year_is_null(spark):
    times = month_starts(dt.datetime(2020, 1, 1), 12)
    arr = np.array([np.full((1, 1), float(i)) for i in range(12)])
    g = grid_from_arrays(spark, arr, times)
    out = temporal.trend(g).collect()
    assert out[0].value is None  # var_pop(year)=0 → safe_divide → null


def test_collapse_and_nearest_time(spark, cube24):
    from georiva_spark.operators.timeseries import nearest_time
    tgt = dt.datetime(2020, 3, 10)
    out = nearest_time(cube24, tgt)
    assert {r.value for r in out.collect()} == {2.0}  # 2020-03-01 is nearest
    mid = dt.datetime(2020, 3, 16, 12)  # equidistant 03-01/04-01 → earlier
    out2 = nearest_time(cube24, mid)
    assert {r.value for r in out2.collect()} == {2.0}


def test_nearest_time_timestamp_ntz(spark, tmp_path):
    # Parquet written with no-tz timestamp[us] reads back as TIMESTAMP_NTZ
    # in Spark 4; nearest_time must not cast it to double (illegal).
    import pyarrow as pa
    import pyarrow.parquet as pq
    from georiva_spark.operators.timeseries import nearest_time

    tbl = pa.table({
        "collection": ["c", "c", "c"],
        "variable": ["v", "v", "v"],
        "y": pa.array([0, 0, 0], pa.int64()),
        "x": pa.array([0, 0, 0], pa.int64()),
        "lat": [0.5, 0.5, 0.5],
        "lon": [0.5, 0.5, 0.5],
        "time": pa.array(
            [dt.datetime(2020, 3, 1), dt.datetime(2020, 4, 1),
             dt.datetime(2020, 5, 1)],
            pa.timestamp("us")),
        "value": [2.0, 3.0, 4.0],
    })
    path = str(tmp_path / "ntz.parquet")
    pq.write_table(tbl, path)
    g = spark.read.parquet(path)
    assert dict(g.dtypes)["time"] == "timestamp_ntz"
    out = nearest_time(g, dt.datetime(2020, 3, 10)).collect()
    assert len(out) == 1 and out[0].value == 2.0
