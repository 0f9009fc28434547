"""Regridding (reference: geoprocessing/regrid.py — rasterio.warp.reproject
over numpy arrays) re-expressed as DataFrame index arithmetic.

For axis-aligned lat/lon grids (the reference's only tested path,
geoprocessing/tests/test_regrid.py: 2×2→4×4 nearest upsample + identity),
resampling needs no raster library:

- **nearest**: each target pixel center maps to exactly one source pixel by
  affine arithmetic — a generated (ty → sy, tx → sx) projection, zero
  shuffle when upsampling within a partition, one equi-join otherwise.
- **average** (downsample / overview pyramids): source pixels groupBy their
  containing target cell — one partial-aggregated shuffle. This is also the
  COG overview-pyramid analog (SURVEY §4: LOD tables via y div 2, x div 2).
- **bilinear**: each target pixel joins its 4 surrounding source pixels
  (generated neighbour keys) with arithmetic weights — 4-row explode +
  groupBy, still fully JVM-side.

General CRS reprojection (non-4326) would plug a pyproj UDF into the same
index-mapping seam; not needed for the reference's tested surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

PIXEL_COLS = ["collection", "variable", "time"]


def _src_index(coord, origin: float, res: float):
    return F.floor((coord - F.lit(origin)) / F.lit(res)).cast("long")


def regrid_nearest(grid: DataFrame,
                   src: tuple[float, float, float],
                   dst: tuple[float, float, float],
                   dst_shape: tuple[int, int]) -> DataFrame:
    """Nearest-neighbour regrid src=(lat0, lon0, res) → dst grid.

    Built from the target side: generate the (ty, tx) lattice once (a tiny
    local relation), compute each target center's containing source pixel
    arithmetically, and equi-join against the source grid — the big side
    shuffles once on (y, x) key, or broadcasts the lattice when small.
    """
    s_lat0, s_lon0, s_res = src
    d_lat0, d_lon0, d_res = dst
    h, w = dst_shape
    spark = grid.sparkSession
    target = (spark.range(h).select(F.col("id").alias("ty"))
              .crossJoin(spark.range(w).select(F.col("id").alias("tx"))))
    t_lat = F.lit(d_lat0) + (F.col("ty") + 0.5) * F.lit(d_res)
    t_lon = F.lit(d_lon0) + (F.col("tx") + 0.5) * F.lit(d_res)
    target = target.select(
        "ty", "tx", t_lat.alias("t_lat"), t_lon.alias("t_lon"),
        _src_index(t_lat, s_lat0, s_res).alias("sy"),
        _src_index(t_lon, s_lon0, s_res).alias("sx"))
    joined = grid.join(
        F.broadcast(target),
        (F.col("y") == F.col("sy")) & (F.col("x") == F.col("sx")), "inner")
    return joined.select(
        *PIXEL_COLS,
        F.col("ty").alias("y"), F.col("tx").alias("x"),
        F.col("t_lat").alias("lat"), F.col("t_lon").alias("lon"),
        "value")


def regrid_bilinear(grid: DataFrame,
                    src: tuple[float, float, float],
                    dst: tuple[float, float, float],
                    dst_shape: tuple[int, int],
                    src_shape: tuple[int, int]) -> DataFrame:
    """Bilinear regrid (rasterio Resampling.bilinear analog,
    geoprocessing/regrid.py:17,45): each target pixel center interpolates
    its 4 surrounding source pixel centers with arithmetic weights.

    Shape: the target lattice (a generated relation) explodes into ≤4
    weighted neighbour keys; when the lattice is small (tile renders,
    window exports — the common case) it is broadcast and the big source
    grid equi-joins WITHOUT shuffling. For full-grid regrids the lattice
    is the same order as the grid, so past `broadcast_max_targets` the
    join falls back to a shuffle equi-join on (y, x) — both sides hash
    once, which is the floor for an all-to-all regrid. Either way the
    final groupBy per target pixel (Σw·v / Σw) partial-aggregates
    map-side. Renormalizing by Σw degrades gracefully at edges (indices
    clamp, duplicate neighbours merge) and where source pixels are
    missing.
    """
    return _regrid_bilinear(grid, src, dst, dst_shape, src_shape)


def _regrid_bilinear(grid: DataFrame,
                     src: tuple[float, float, float],
                     dst: tuple[float, float, float],
                     dst_shape: tuple[int, int],
                     src_shape: tuple[int, int],
                     broadcast_max_targets: int = 2_000_000) -> DataFrame:
    s_lat0, s_lon0, s_res = src
    d_lat0, d_lon0, d_res = dst
    h, w = dst_shape
    sh, sw = src_shape
    spark = grid.sparkSession
    target = (spark.range(h).select(F.col("id").alias("ty"))
              .crossJoin(spark.range(w).select(F.col("id").alias("tx"))))
    t_lat = F.lit(d_lat0) + (F.col("ty") + F.lit(0.5)) * F.lit(d_res)
    t_lon = F.lit(d_lon0) + (F.col("tx") + F.lit(0.5)) * F.lit(d_res)
    fy = (t_lat - F.lit(s_lat0)) / F.lit(s_res) - F.lit(0.5)
    fx = (t_lon - F.lit(s_lon0)) / F.lit(s_res) - F.lit(0.5)
    y0, x0 = F.floor(fy), F.floor(fx)
    wy, wx = fy - y0, fx - x0

    def clamp(c, hi: int):
        return F.greatest(F.lit(0).cast("long"),
                          F.least(c.cast("long"), F.lit(hi - 1).cast("long")))

    neigh = F.array(*[
        F.struct(clamp(y0 + dy, sh).alias("sy"),
                 clamp(x0 + dx, sw).alias("sx"),
                 ((wy if dy else F.lit(1.0) - wy) *
                  (wx if dx else F.lit(1.0) - wx)).alias("wt"))
        for dy in (0, 1) for dx in (0, 1)])
    tgt = (target.select("ty", "tx", t_lat.alias("t_lat"),
                         t_lon.alias("t_lon"), F.explode(neigh).alias("nb"))
           .select("ty", "tx", "t_lat", "t_lon",
                   F.col("nb.sy").alias("sy"), F.col("nb.sx").alias("sx"),
                   F.col("nb.wt").alias("wt"))
           .where(F.col("wt") > 0))
    if h * w <= broadcast_max_targets:
        tgt = F.broadcast(tgt)
    joined = grid.join(
        tgt, (F.col("y") == F.col("sy")) & (F.col("x") == F.col("sx")),
        "inner")
    return (joined.groupBy(*PIXEL_COLS, "ty", "tx", "t_lat", "t_lon")
            .agg((F.sum(F.col("wt") * F.col("value"))
                  / F.sum("wt")).alias("value"))
            .select(*PIXEL_COLS,
                    F.col("ty").alias("y"), F.col("tx").alias("x"),
                    F.col("t_lat").alias("lat"), F.col("t_lon").alias("lon"),
                    "value"))


def regrid_average(grid: DataFrame,
                   dst: tuple[float, float, float]) -> DataFrame:
    """Average-resample onto a coarser grid: source pixels group into their
    containing target cell (rasterio Resampling.average analog). One
    partial-aggregated shuffle; NaN/null pixels drop out natively."""
    d_lat0, d_lon0, d_res = dst
    ty = _src_index(F.col("lat"), d_lat0, d_res)
    tx = _src_index(F.col("lon"), d_lon0, d_res)
    return (grid.groupBy(*PIXEL_COLS, ty.alias("y"), tx.alias("x"))
            .agg(F.avg("value").alias("value"),
                 F.count("value").alias("n_source"))
            .withColumn("lat", F.lit(d_lat0) + (F.col("y") + 0.5) * F.lit(d_res))
            .withColumn("lon", F.lit(d_lon0) + (F.col("x") + 0.5) * F.lit(d_res)))


def overview_pyramid(grid: DataFrame, levels: int) -> DataFrame:
    """COG overview-pyramid analog (asset_writer.py:188-211): LOD tables by
    successive 2× index decimation, unioned with a ``level`` column.
    Level 0 = full resolution. Each level is one groupBy on (y>>k, x>>k)."""
    grid = grid.select(*PIXEL_COLS, "y", "x", "lat", "lon", "value")
    out = grid.withColumn("level", F.lit(0))
    for k in range(1, levels + 1):
        lod = (grid.groupBy(*PIXEL_COLS,
                            (F.col("y") / (2 ** k)).cast("long").alias("y"),
                            (F.col("x") / (2 ** k)).cast("long").alias("x"))
               .agg(F.avg("value").alias("value"),
                    F.min("lat").alias("lat"), F.min("lon").alias("lon"))
               .withColumn("level", F.lit(k))
               .select(*out.columns))
        out = out.unionByName(lod)
    return out
