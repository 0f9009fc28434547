"""Point / area time-series extraction (SURVEY.md §3.3, J4/J5/A2) — the
analysis read path of analysis/timeseries/service.py.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, functions as F

from georiva_spark.functions.geo import affine_index
from georiva_spark.operators.filters import time_filter


def point_timeseries(grid: DataFrame, lat: float, lon: float,
                     lat0: float, lon0: float, res: float,
                     start: _dt.datetime | None = None,
                     end: _dt.datetime | None = None) -> DataFrame:
    """J4 — nearest-pixel series at (lat, lon).

    The spatial as-of join resolves to exact affine index arithmetic
    (service.py:92-97 sel(method='nearest')) → an equi-filter on (y, x)
    that partition/min-max prunes; no join, no shuffle at any scale.
    """
    y, x = affine_index(lat0, lon0, res, lat, lon)
    out = time_filter(grid, start, end)
    return (out.where((F.col("y") == y) & (F.col("x") == x))
               .select("collection", "variable", "time", "y", "x",
                       "lat", "lon", "value")
               .orderBy("time"))


def nearest_time(grid: DataFrame, ts: _dt.datetime) -> DataFrame:
    """J5 — per-pixel value at the timestep nearest to ``ts``
    (formats/netcdf.py:130-134): min_by over |time − ts|, tie → earlier
    (xarray nearest keeps the lower index on exact ties).

    One aggregation, no window shuffle: min_by on the (distance, time)
    struct gives the argmin directly.
    """
    # unix_micros over a timestamp_ltz cast handles both TIMESTAMP and
    # TIMESTAMP_NTZ inputs (parquet with no-tz timestamp[us] reads as NTZ,
    # and CAST(TIMESTAMP_NTZ AS DOUBLE) is illegal in Spark 4).
    t_us = F.unix_micros(F.col("time").cast("timestamp_ltz"))
    ts_us = F.unix_micros(F.lit(ts).cast("timestamp_ltz"))
    dist = F.abs(t_us - ts_us)
    # struct comparison is lexicographic: min distance first, then earlier
    # time on exact ties (xarray nearest keeps the lower index).
    key = F.struct(dist.alias("d"), F.col("time").alias("t"))
    return (grid.groupBy("collection", "variable", "y", "x", "lat", "lon")
                .agg(F.min_by(F.struct("time", "value"), key).alias("_nv"))
                .select("collection", "variable", "y", "x", "lat", "lon",
                        F.col("_nv.time").alias("time"),
                        F.col("_nv.value").alias("value")))
