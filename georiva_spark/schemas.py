"""Engine table schemas (SURVEY.md §1, FIXTURES.md).

The central decision (SURVEY.md §1.4): pixel data lives in a long-format
``grid`` DataFrame — one row per pixel per timestep — partitioned by
(collection, variable, date(time)). Raster algebra becomes column
expressions; zonal/temporal operators become groupBys; COG chunking is
subsumed by Spark partitioning. NaN→null is the nodata sentinel
(reference: geoprocessing/algebra.py:6).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- grid: the analysis-ready cube (reference: virtual_zarr/virtual_zarr.py:242-324) ---
GRID_SCHEMA = T.StructType([
    T.StructField("org", T.StringType()),
    T.StructField("catalog", T.StringType()),
    T.StructField("collection", T.StringType()),
    T.StructField("variable", T.StringType()),
    T.StructField("time", T.TimestampType()),
    T.StructField("reference_time", T.TimestampType(), nullable=True),
    T.StructField("y", T.LongType()),          # row index, 0 = north
    T.StructField("x", T.LongType()),          # column index
    T.StructField("lat", T.DoubleType()),      # pixel center: f + e*(y+0.5)
    T.StructField("lon", T.DoubleType()),      # pixel center: c + a*(x+0.5)
    T.StructField("value", T.DoubleType(), nullable=True),  # null = nodata
])

# Partition spec for grid writes; at 100 TB this gives partition pruning on
# every (collection, variable, time-range) query — the Spark analog of the
# reference's TimescaleDB hypertable keyed (collection, time)
# (core/models/item.py:20-28).
GRID_PARTITION_COLS = ["collection", "variable", "date"]

# --- tiles variant: per-tile arrays for regridding / export (SURVEY §1.4.3) ---
TILES_SCHEMA = T.StructType([
    T.StructField("collection", T.StringType()),
    T.StructField("variable", T.StringType()),
    T.StructField("time", T.TimestampType()),
    T.StructField("tile_y", T.IntegerType()),
    T.StructField("tile_x", T.IntegerType()),
    T.StructField("tile_h", T.IntegerType()),
    T.StructField("tile_w", T.IntegerType()),
    T.StructField("values", T.ArrayType(T.DoubleType())),  # row-major tile_h*tile_w
])

# --- catalog tables (reference: core/models/{item,base,variable,collection}.py) ---
ITEMS_SCHEMA = T.StructType([
    T.StructField("item_id", T.LongType()),
    T.StructField("org", T.StringType()),
    T.StructField("catalog", T.StringType()),
    T.StructField("collection", T.StringType()),
    T.StructField("tier", T.StringType()),      # published | staging (staging/models.py:28)
    T.StructField("time", T.TimestampType()),
    T.StructField("reference_time", T.TimestampType(), nullable=True),
    T.StructField("bounds", T.ArrayType(T.DoubleType())),  # [west, south, east, north]
    T.StructField("geometry", T.StringType(), nullable=True),  # GeoJSON
    T.StructField("crs", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("resolution", T.DoubleType(), nullable=True),
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
])

ASSETS_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("item_id", T.LongType()),
    T.StructField("variable", T.StringType()),
    T.StructField("format", T.StringType()),    # cog|geotiff|netcdf|grib2|zarr|png|json
    T.StructField("roles", T.ArrayType(T.StringType())),
    T.StructField("href", T.StringType()),
    T.StructField("checksum", T.StringType()),
    T.StructField("stats_min", T.DoubleType(), nullable=True),
    T.StructField("stats_max", T.DoubleType(), nullable=True),
    T.StructField("stats_mean", T.DoubleType(), nullable=True),
    T.StructField("stats_std", T.DoubleType(), nullable=True),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("bands", T.IntegerType()),
    T.StructField("extra_fields", T.MapType(T.StringType(), T.StringType())),
])

VARIABLE_SOURCE_SCHEMA = T.StructType([
    T.StructField("role", T.StringType()),           # main | u | v (variable.py:24-75)
    T.StructField("source_name", T.StringType()),
    T.StructField("vertical_dimension", T.StringType(), nullable=True),
    T.StructField("vertical_value", T.DoubleType(), nullable=True),
])

VARIABLES_SCHEMA = T.StructType([
    T.StructField("collection", T.StringType()),
    T.StructField("slug", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("transform_type", T.StringType()),  # passthrough|vector_magnitude|vector_direction
    T.StructField("source_unit", T.StringType(), nullable=True),
    T.StructField("unit", T.StringType(), nullable=True),
    T.StructField("value_min", T.DoubleType(), nullable=True),
    T.StructField("value_max", T.DoubleType(), nullable=True),
    T.StructField("scale_type", T.StringType()),      # linear|log|sqrt|diverging
    T.StructField("sources", T.ArrayType(VARIABLE_SOURCE_SCHEMA)),
])

COLLECTIONS_SCHEMA = T.StructType([
    T.StructField("org", T.StringType()),
    T.StructField("catalog", T.StringType()),
    T.StructField("collection", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("visibility", T.StringType()),  # public|private|internal (collection.py:64-100)
    T.StructField("is_active", T.BooleanType()),
    T.StructField("catalog_is_active", T.BooleanType()),
    T.StructField("is_forecast", T.BooleanType()),
    T.StructField("admin_levels", T.ArrayType(T.IntegerType())),  # 1..3
])

# --- boundaries (FIXTURES §F2; analysis/zonal_stats) ---
BOUNDARIES_SCHEMA = T.StructType([
    T.StructField("boundary_id", T.LongType()),
    T.StructField("level", T.IntegerType()),
    T.StructField("name", T.StringType()),
    T.StructField("geometry", T.StringType()),  # GeoJSON, EPSG:4326
])

# --- zonal stats output (analysis/zonal_stats/models.py:7-90) ---
ZONAL_STATS_SCHEMA = T.StructType([
    T.StructField("time", T.TimestampType()),
    T.StructField("collection", T.StringType()),
    T.StructField("variable", T.StringType()),
    T.StructField("boundary_id", T.LongType()),
    T.StructField("mean", T.DoubleType(), nullable=True),
    T.StructField("min", T.DoubleType(), nullable=True),
    T.StructField("max", T.DoubleType(), nullable=True),
    T.StructField("sum", T.DoubleType(), nullable=True),
    T.StructField("std", T.DoubleType(), nullable=True),   # population std (numpy ddof=0)
    T.StructField("count", T.LongType()),
])

# --- derivation ledger (FIXTURES §F4; processing/engine.py, staging/models.py:165) ---
RUN_STATUSES = ("pending", "running", "completed", "skipped", "not_ready", "failed")

RUNS_SCHEMA = T.StructType([
    T.StructField("recipe_type", T.StringType()),
    T.StructField("recipe_version", T.StringType()),
    T.StructField("unit_key", T.StringType()),      # canonical JSON of the ProductionUnit
    T.StructField("unit_hash", T.StringType()),     # sha256
    T.StructField("status", T.StringType()),
    T.StructField("input_hash", T.StringType(), nullable=True),
    T.StructField("origin", T.StringType(), nullable=True),
    T.StructField("reason", T.StringType(), nullable=True),
    T.StructField("produced_item_id", T.LongType(), nullable=True),
    T.StructField("updated_at", T.TimestampType()),
])

LINEAGE_SCHEMA = T.StructType([
    T.StructField("derived_item_id", T.LongType()),
    T.StructField("source_item_id", T.LongType()),
    T.StructField("source_tier", T.StringType()),   # staging | published
    T.StructField("recipe_id", T.StringType()),
    T.StructField("recipe_version", T.StringType()),
    T.StructField("input_hash", T.StringType()),
])

# --- documents / embeddings (LLM-pipeline tables, TESTDATA.md) ---
DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

EMBEDDINGS_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])

# --- multimodal assets: opaque binary + typed metadata (north-star ops) ---
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),          # image|audio|video
    T.StructField("content", T.BinaryType()),
    T.StructField("mime", T.StringType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

TPCH_TABLES = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents", "embeddings")
