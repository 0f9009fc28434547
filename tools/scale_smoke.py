"""Scale smoke: run the headline raster operators at the reference's
"global grid" size (7200×3600 ≈ 25.9 M pixels per timestep,
ingestion/asset_writer.py:199-203) — the size the COG pipeline was built
around — generated in-flight from spark.range (no I/O), multiple
timesteps.

Usage: python tools/scale_smoke.py [timesteps]
Prints one timing line per operator; appends nothing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from georiva_spark.operators import regrid, temporal, zonal
from georiva_spark.session import get_spark

W, H = 7200, 3600          # global grid (asset_writer.py:199-203)
RES = 0.05
LAT0, LON0 = -90.0, -180.0


def global_grid(spark, timesteps: int):
    """25.9M pixels × T timesteps, value = deterministic f(t, y, x)."""
    px = spark.range(W * H).select(
        (F.col("id") % H).alias("y"), (F.col("id") / H).cast("long").alias("x"))
    ts = spark.range(timesteps).select(
        F.expr("timestamp'2020-01-01' + make_interval(0,1,0,0,0,0,0) * id")
        .alias("time"))
    g = px.crossJoin(ts)
    return g.select(
        F.lit("global").alias("collection"), F.lit("v").alias("variable"),
        "time", "y", "x",
        (F.lit(LAT0) + (F.col("y") + 0.5) * F.lit(RES)).alias("lat"),
        (F.lit(LON0) + (F.col("x") + 0.5) * F.lit(RES)).alias("lon"),
        (F.sin(F.col("y") / 100.0) * F.cos(F.col("x") / 100.0) * 10.0
         + F.month("time")).alias("value"))


def main():
    t_n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("scale-smoke",
                      extra_conf={"spark.driver.memory": "48g"})
    grid = global_grid(spark, t_n)
    n = W * H * t_n

    t0 = time.perf_counter()
    c = temporal.climatology(grid, "annual").count()
    el = time.perf_counter() - t0
    print(f"climatology: {el:.1f}s over {n/1e6:.1f}M rows "
          f"({n/el/1e6:.1f}M rows/s) -> {c} pixels")

    boxes = [(1, 1, "africa", -20.0, -35.0, 52.0, 38.0),
             (2, 1, "europe", -11.0, 35.0, 40.0, 71.0),
             (3, 1, "pacific", 140.0, -50.0, 180.0, 10.0)]
    rows = []
    for bid, level, name, w, s, e, nn in boxes:
        gj = ('{"type": "Polygon", "coordinates": [[[%f, %f], [%f, %f], '
              '[%f, %f], [%f, %f], [%f, %f]]]}' % (w, s, e, s, e, nn, w, nn, w, s))
        rows.append((bid, level, name, gj))
    boundaries = spark.createDataFrame(
        rows, "boundary_id long, level int, name string, geometry string")
    t0 = time.perf_counter()
    z = zonal.zonal_stats(grid, boundaries, keys=("variable", "time")).count()
    el = time.perf_counter() - t0
    print(f"zonal_stats(3 boundaries): {el:.1f}s over {n/1e6:.1f}M rows "
          f"({n/el/1e6:.1f}M rows/s) -> {z} stat rows")

    t0 = time.perf_counter()
    r = temporal.resample(grid, "month").count()
    el = time.perf_counter() - t0
    print(f"resample(month): {el:.1f}s ({n/el/1e6:.1f}M rows/s) -> {r} rows")

    t0 = time.perf_counter()
    zr = zonal.zonal_rollup(grid, boundaries, keys=("variable",)).count()
    el = time.perf_counter() - t0
    print(f"zonal_rollup(GROUPING SETS, 3 boundaries + levels): {el:.1f}s "
          f"({n/el/1e6:.1f}M rows/s) -> {zr} rows")

    # bilinear 2x downsample of one timestep: 25.9M -> 6.5M target pixels,
    # broadcast 4-neighbour weighted join
    one = grid.where(F.col("time") == F.lit("2020-01-01").cast("timestamp"))
    t0 = time.perf_counter()
    b = regrid.regrid_bilinear(
        one, src=(LAT0, LON0, RES), dst=(LAT0, LON0, RES * 2),
        dst_shape=(H // 2, W // 2), src_shape=(H, W)).count()
    el = time.perf_counter() - t0
    n1 = W * H
    print(f"regrid_bilinear(2x down, 1 step): {el:.1f}s "
          f"({n1/el/1e6:.1f}M src rows/s) -> {b} rows")


if __name__ == "__main__":
    main()
