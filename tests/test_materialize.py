"""Shared materialization seam (ingestion/materialization.py parity):
mask → stats → idempotent write → item upsert → extent EXPAND, one
sequence serving both ingestion and derivation outputs."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from georiva_spark.sources.materialize import materialize


def _grid(spark, collection="rain", day=1, lo=0, hi=4, value=1.0):
    rows = [(collection, "precip", dt.datetime(2024, 1, day), y, x,
             -6.0 + (y + 0.5), -7.5 + (x + 0.5), value + y)
            for y in range(lo, hi) for x in range(lo, hi)]
    return spark.createDataFrame(
        rows, "collection string, variable string, time timestamp, "
              "y long, x long, lat double, lon double, value double")


def test_materialize_returns_items_with_stats(spark):
    out = materialize(_grid(spark), checksum="abc")
    [item] = out["items"].collect()
    assert item.collection == "rain" and item.variable == "precip"
    assert item.n_pixels == 16
    assert item.height == 4 and item.width == 4
    assert item.stats_min == 1.0 and item.stats_max == 4.0
    assert item.valid_count == 16 and item.checksum == "abc"
    [ext] = out["extent"].collect()
    assert (ext.west, ext.east) == (-7.0, -4.0)


def test_materialize_mask_drops_outside_pixels(spark):
    # triangle covering roughly the lower-left half of the 4x4 block
    tri = ('{"type": "Polygon", "coordinates": '
           '[[[-7.5, -6.0], [-3.0, -6.0], [-7.5, -1.5], [-7.5, -6.0]]]}')
    out = materialize(_grid(spark), boundary_geojson=tri)
    n = out["grid"].count()
    assert 0 < n < 16  # strictly fewer pixels than the full block
    [item] = out["items"].collect()
    assert item.n_pixels == n  # stats computed AFTER the mask


def test_materialize_idempotent_write_and_extent_expand(spark, tmp_path):
    grid_path = str(tmp_path / "grid")
    catalog = str(tmp_path / "catalog")
    g1 = _grid(spark, day=1)
    materialize(g1, grid_path=grid_path, catalog_dir=catalog)
    # re-materializing the SAME slice is idempotent (no row duplication)
    materialize(g1, grid_path=grid_path, catalog_dir=catalog)
    stored = spark.read.parquet(grid_path)
    assert stored.count() == 16
    items = spark.read.parquet(os.path.join(catalog, "items"))
    assert items.count() == 1

    # a later, spatially smaller batch EXPANDS the collection extent
    g2 = _grid(spark, day=9, lo=1, hi=2)  # 1 pixel, inside g1's bbox
    materialize(g2, grid_path=grid_path, catalog_dir=catalog)
    [ext] = (spark.read.parquet(os.path.join(catalog, "collections"))
             .collect())
    assert ext.time_min == dt.datetime(2024, 1, 1)   # kept from g1
    assert ext.time_max == dt.datetime(2024, 1, 9)   # expanded by g2
    assert (ext.west, ext.east) == (-7.0, -4.0)      # never shrunk
    # both slices live side by side in the grid table; one item row per
    # (collection, variable, time) — re-read, the upsert swapped files
    assert spark.read.parquet(grid_path).count() == 17
    items2 = spark.read.parquet(os.path.join(catalog, "items"))
    assert items2.count() == 2


def test_materialize_serves_ingestion_and_derivation_alike(spark, tmp_path):
    """The drift-prevention contract: a derived output and an ingested
    one pass through the SAME sequence and get identical catalog shape."""
    catalog = str(tmp_path / "catalog")
    ingested = _grid(spark, collection="raw", day=1)
    derived = (_grid(spark, collection="raw", day=1)
               .withColumn("collection", F.lit("raw-anomaly"))
               .withColumn("value", F.col("value") - 2.0))
    materialize(ingested, catalog_dir=catalog)
    materialize(derived, catalog_dir=catalog)
    items = spark.read.parquet(os.path.join(catalog, "items"))
    cols = {r.collection for r in items.collect()}
    assert cols == {"raw", "raw-anomaly"}
    # derived item carries the same stats/extent columns — no extent-less
    # derived collections
    colls = spark.read.parquet(os.path.join(catalog, "collections"))
    assert {r.collection for r in colls.collect()} == {"raw", "raw-anomaly"}
    for r in colls.collect():
        assert r.west is not None and r.time_min is not None


def test_rematerialize_derived_only_touches_derived(spark, tmp_path):
    """processing/test_rematerialize.py: the backfill replays the shared
    materialization over items with a derivation marker, skips plain
    ingested ones, and dry-run writes nothing."""
    from georiva_spark.sources.grid_store import write_grid
    from georiva_spark.sources.materialize import rematerialize_derived

    grid_path = str(tmp_path / "grid")
    catalog_dir = str(tmp_path / "catalog")
    write_grid(_grid(spark, collection="anom", day=1), grid_path)
    write_grid(_grid(spark, collection="plain", day=1), grid_path)
    items = [
        {"collection": "anom", "variable": "precip",
         "time": dt.datetime(2024, 1, 1), "checksum": "h1",
         "properties": {"derivation.input_hash": "h1"}},
        {"collection": "plain", "variable": "precip",
         "time": dt.datetime(2024, 1, 1), "properties": {}},
        {"collection": "anom", "variable": "precip",
         "time": dt.datetime(2024, 2, 2), "checksum": "h2",
         "properties": {"derivation.input_hash": "h2"}},  # no grid rows
    ]
    out = rematerialize_derived(spark, grid_path, items,
                                catalog_dir=catalog_dir, dry_run=True)
    assert out["selected"] == 2
    assert all(r["action"] == "would_rematerialize" for r in out["results"])
    assert not os.path.exists(os.path.join(catalog_dir, "items"))  # dry

    out = rematerialize_derived(spark, grid_path, items,
                                catalog_dir=catalog_dir)
    actions = {(r["collection"], str(r["time"])): r["action"]
               for r in out["results"]}
    assert actions[("anom", "2024-01-01 00:00:00")] == "rematerialized"
    assert actions[("anom", "2024-02-02 00:00:00")] == "skipped_no_rows"
    cat_items = spark.read.parquet(os.path.join(catalog_dir, "items"))
    got = {(r.collection, r.checksum) for r in cat_items.collect()}
    assert got == {("anom", "h1")}  # plain item untouched, no row created
