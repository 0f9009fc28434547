"""Tile-array variant of the grid (SURVEY §1.4.3, TILES_SCHEMA): per-tile
row-major value arrays matching COG 256/512 blocking — the efficient shape
for texture/tile export and block-wise numpy interop.

`to_tiles` packs the long grid into fixed-size tiles (one groupBy);
`from_tiles` explodes back (posexplode, pure JVM). Missing pixels inside a
tile become nulls so the array layout is always dense tile_h×tile_w.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

KEY = ["collection", "variable", "time"]


def to_tiles(grid: DataFrame, tile_size: int = 256,
             grid_w: int | None = None, grid_h: int | None = None) -> DataFrame:
    """Long grid → dense tile arrays.

    Pixels group by (tile_y, tile_x); within the tile each pixel lands at
    offset (y % ts)*ts + (x % ts) via a map built from collected pairs —
    map_from_entries + dense sequence keeps it JVM-side with one shuffle.
    """
    ts = tile_size
    tile_y = (F.col("y") / ts).cast("int")
    tile_x = (F.col("x") / ts).cast("int")
    off = ((F.col("y") % ts) * ts + (F.col("x") % ts)).cast("int")
    packed = (grid
              .select(*KEY, tile_y.alias("tile_y"), tile_x.alias("tile_x"),
                      off.alias("off"), "value")
              .groupBy(*KEY, "tile_y", "tile_x")
              .agg(F.map_from_entries(
                      F.collect_list(F.struct("off", "value"))).alias("_m")))
    # try_element_at: absent offsets → null (ANSI-safe), giving dense tiles
    dense = F.transform(F.sequence(F.lit(0), F.lit(ts * ts - 1)),
                        lambda i: F.try_element_at(F.col("_m"), i))
    return packed.select(*KEY, "tile_y", "tile_x",
                         F.lit(ts).alias("tile_h"), F.lit(ts).alias("tile_w"),
                         dense.alias("values"))


def from_tiles(tiles: DataFrame) -> DataFrame:
    """Tile arrays → long grid rows (posexplode; lat/lon re-derivable from
    the affine transform by the caller)."""
    exploded = tiles.select(
        *KEY, "tile_y", "tile_x", "tile_h", "tile_w",
        F.posexplode("values").alias("off", "value"))
    y = F.col("tile_y").cast("long") * F.col("tile_h") + \
        (F.col("off") / F.col("tile_w")).cast("long")
    x = F.col("tile_x").cast("long") * F.col("tile_w") + \
        F.col("off") % F.col("tile_w")
    return exploded.select(*KEY, y.alias("y"), x.alias("x"), "value")
