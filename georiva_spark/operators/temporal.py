"""Temporal operators (SURVEY.md §2.4 A3–A6): resample, climatology,
anomaly, trend.

All expressed as groupBy aggregations over the long grid so they get
map-side partial aggregation; per-pixel groupings key on (y, x) which is
uniform by construction (every timestep has every pixel) — no skew. The
time dimension collapses, so shuffle width is bounded by #pixels, not
#rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from georiva_spark.functions.scalars import safe_divide
from georiva_spark.operators.filters import season_filter

_AGG_FNS = {
    "mean": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "std": F.stddev_pop,   # numpy default ddof=0 (SURVEY §7 float parity)
    "count": F.count,
}

PIXEL_KEY = ["collection", "variable", "y", "x", "lat", "lon"]


def _agg(how: str, col: str = "value") -> Column:
    try:
        return _AGG_FNS[how](F.col(col))
    except KeyError:
        raise ValueError(f"unsupported aggregation {how!r}") from None


def resample(grid: DataFrame, freq: str, how: str = "mean",
             time_col: str = "time") -> DataFrame:
    """A3 — group timesteps to a calendar cadence and reduce.

    freq ∈ {year, month, week, day, hour} — month-start/year-start label
    convention matches the reference's pandas resample("MS"/"YS")
    (geoprocessing/temporal.py:52-74): the bucket label is the period start.
    """
    bucket = F.date_trunc(freq, F.col(time_col)).alias("time")
    return (grid.groupBy(*PIXEL_KEY, bucket)
                .agg(_agg(how).alias("value")))


def collapse_time(grid: DataFrame, how: str = "mean") -> DataFrame:
    """A3 whole-series collapse: one value per pixel."""
    return grid.groupBy(*PIXEL_KEY).agg(_agg(how).alias("value"))


def climatology(grid: DataFrame, season: str = "annual",
                how: str = "mean") -> DataFrame:
    """A4 — season-filter then collapse time to a per-pixel value
    (geoprocessing/temporal.py:77-87, recipes/climatology.py:131-147)."""
    return collapse_time(season_filter(grid, season), how)


def anomaly(grid: DataFrame, baseline: DataFrame,
            relative: bool = False) -> DataFrame:
    """A5 — value − baseline per pixel; relative = safe_divide(diff, base)
    with ÷0 → null (geoprocessing/temporal.py:107-124, algebra.py:16-30).

    baseline: per-pixel (y, x → value) climatology. Joined with a broadcast
    hint — a climatology is one row per pixel (≤ tens of MB even for the
    global 25.9 M-px grid at float64, and far smaller after bbox subset),
    while the series side is #pixels × #timesteps; broadcasting avoids
    shuffling the big side entirely (SURVEY §2.3 J6).
    """
    base = F.broadcast(
        baseline.select(F.col("collection"), F.col("variable"),
                        F.col("y"), F.col("x"),
                        F.col("value").alias("_base")))
    joined = grid.join(base, on=["collection", "variable", "y", "x"], how="left")
    diff = F.col("value") - F.col("_base")
    out = safe_divide(diff, F.col("_base")) if relative else diff
    # works on a time series or an already-collapsed climatology slice
    keep = [c for c in ("collection", "variable", "time", "y", "x", "lat", "lon")
            if c in grid.columns]
    return joined.select(*keep, out.alias("value"))


def trend(grid: DataFrame, season: str = "annual",
          yearly_how: str = "mean") -> DataFrame:
    """A6 — per-pixel slope per year: season-filter → yearly reduce →
    degree-1 least squares (geoprocessing/temporal.py:90-104).

    numpy ``polyfit(deg=1)`` slope == covar_pop(year, value)/var_pop(year),
    computed exactly by Spark's built-in aggregates — no UDF, single
    shuffle, closed form (SURVEY §2.4 A6).
    """
    yearly = (season_filter(grid, season)
              .groupBy(*PIXEL_KEY, F.year("time").alias("yr"))
              .agg(_agg(yearly_how).alias("yval")))
    return (yearly.groupBy(*PIXEL_KEY)
            .agg(safe_divide(F.covar_pop("yr", "yval"),
                             F.var_pop("yr")).alias("value")))
