"""Deterministic events→grid projection.

The driver testdata has no raster files, so the engine's long-format grid
table (schemas.GRID_SCHEMA, SURVEY.md §1.4) is derived deterministically
from the ``events`` table: each user_id is a pixel on a fixed H×W grid with
a fixed affine transform, each event a (time, pixel, value) sample, the
event_type the variable channel. Both the Spark implementation and the
DuckDB oracle SQL share these constants, so grid operators are
hash-checkable end-to-end.

Affine contract mirrors the reference (virtual_zarr/virtual_zarr.py:326-344):
pixel center  lat = LAT0 + RES*(y+0.5), lon = LON0 + RES*(x+0.5), north-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from georiva_spark.sources.tables import load_table

GRID_H = 12          # rows
GRID_W = 15          # cols
LAT0 = -6.0          # north edge latitude minus... grid origin (south-west corner lat)
LON0 = -7.5          # grid origin lon
RES = 1.0            # degrees per pixel


def events_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → long-format grid rows (org/catalog/collection fixed)."""
    ev = load_table(spark, sf_dir, "events")
    y = ev.user_id % GRID_H
    x = (ev.user_id / GRID_H).cast("bigint") % GRID_W  # user_id >= 0: floor==trunc
    return ev.select(
        F.lit("default").alias("org"),
        F.lit("t").alias("catalog"),
        F.lit("events").alias("collection"),
        F.col("event_type").alias("variable"),
        F.col("ts").alias("time"),
        F.lit(None).cast("timestamp").alias("reference_time"),
        y.alias("y"),
        x.alias("x"),
        (F.lit(LAT0) + (y + F.lit(0.5)) * F.lit(RES)).alias("lat"),
        (F.lit(LON0) + (x + F.lit(0.5)) * F.lit(RES)).alias("lon"),
        F.col("value").alias("value"),
    )


# The same projection as ANSI SQL (DuckDB oracle side). Kept adjacent to the
# Spark code so the two can only drift in review, not silently.
EVENTS_GRID_SQL = f"""
SELECT
  'default' AS org,
  't' AS catalog,
  'events' AS collection,
  event_type AS variable,
  ts AS time,
  CAST(NULL AS TIMESTAMP) AS reference_time,
  user_id % {GRID_H} AS y,
  CAST(FLOOR(user_id / {GRID_H}) AS BIGINT) % {GRID_W} AS x,
  CAST({LAT0} + (user_id % {GRID_H} + 0.5) * {RES} AS DOUBLE) AS lat,
  CAST({LON0} + (CAST(FLOOR(user_id / {GRID_H}) AS BIGINT) % {GRID_W} + 0.5) * {RES} AS DOUBLE) AS lon,
  value AS value
FROM events
"""
