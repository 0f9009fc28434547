"""Palette interpolation and catalog-upsert tests."""

import pytest
from pyspark.sql import functions as F

from georiva_spark.functions.styling import palette_color, scale_transform
from georiva_spark.sources.catalog_store import read_catalog, upsert_by_key

PALETTE = [(0.0, (0, 0, 255, 255)),      # blue
           (50.0, (255, 255, 0, 255)),   # yellow
           (100.0, (255, 0, 0, 255))]    # red


def test_palette_interpolation(spark):
    df = spark.createDataFrame(
        [(-10.0,), (0.0,), (25.0,), (50.0,), (75.0,), (100.0,), (150.0,),
         (None,)], "v double")
    out = df.select("v", palette_color(F.col("v"), PALETTE).alias("c")).collect()
    got = {r.v: (None if r.c is None else (r.c.r, r.c.g, r.c.b, r.c.a))
           for r in out}
    assert got[-10.0] == (0, 0, 255, 255)       # clamp below
    assert got[0.0] == (0, 0, 255, 255)
    assert got[25.0] == (128, 128, 128, 255)    # halfway blue→yellow
    assert got[50.0] == (255, 255, 0, 255)
    assert got[75.0] == (255, 128, 0, 255)      # halfway yellow→red
    assert got[100.0] == (255, 0, 0, 255)
    assert got[150.0] == (255, 0, 0, 255)       # clamp above
    assert got[None] is None                     # nodata transparent


def test_palette_validation(spark):
    with pytest.raises(ValueError):
        palette_color(F.col("v"), [(0.0, (0, 0, 0, 0))])
    with pytest.raises(ValueError):
        palette_color(F.col("v"), [(1.0, (0,) * 4), (0.0, (0,) * 4)])


def test_scale_transforms(spark):
    df = spark.createDataFrame([(0.0,), (25.0,), (100.0,)], "v double")
    out = df.select(
        scale_transform(F.col("v"), "linear", 0, 100).alias("lin"),
        scale_transform(F.col("v"), "sqrt", 0, 100).alias("sq"),
        scale_transform(F.col("v"), "diverging", 0, 100).alias("div")).collect()
    assert [r.lin for r in out] == [0.0, 0.25, 1.0]
    assert out[1].sq == 0.5             # sqrt(25/100)
    assert [r.div for r in out] == [0.0, 0.25, 1.0]


def test_upsert_by_key(spark, tmp_path):
    path = str(tmp_path / "zonal_stats")
    first = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0)], "boundary_id long, v string, mean double")
    upsert_by_key(first, path, keys=["boundary_id", "v"])
    # overlapping key 2 updated, key 3 inserted
    second = spark.createDataFrame(
        [(2, "a", 99.0), (3, "a", 30.0)], "boundary_id long, v string, mean double")
    upsert_by_key(second, path, keys=["boundary_id", "v"])
    got = {(r.boundary_id, r.v): r.mean
           for r in read_catalog(spark, path).collect()}
    assert got == {(1, "a"): 10.0, (2, "a"): 99.0, (3, "a"): 30.0}
    # idempotent re-upsert
    upsert_by_key(second, path, keys=["boundary_id", "v"])
    assert read_catalog(spark, path).count() == 3


def _partition_files(root):
    out = {}
    for dirpath, _, files in __import__("os").walk(root):
        for f in files:
            p = __import__("os").path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[__import__("os").path.relpath(p, root)] = fh.read()
    return out


def test_upsert_partition_scoped(spark, tmp_path):
    """An upsert touching only collection 'a' must leave collection 'b'
    partition files byte-identical (replaceWhere-style scoped rewrite)."""
    path = str(tmp_path / "items")
    first = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 5.0), ("b", 2, 6.0)],
        "collection string, item_id long, score double")
    upsert_by_key(first, path, keys=["collection", "item_id"],
                  partition_by=["collection"])
    b_before = _partition_files(str(tmp_path / "items" / "collection=b"))
    assert b_before  # partitioned layout actually produced files

    second = spark.createDataFrame(
        [("a", 2, 99.0), ("a", 3, 30.0)],
        "collection string, item_id long, score double")
    upsert_by_key(second, path, keys=["collection", "item_id"],
                  partition_by=["collection"])
    got = {(r.collection, r.item_id): r.score
           for r in read_catalog(spark, path).collect()}
    assert got == {("a", 1): 10.0, ("a", 2): 99.0, ("a", 3): 30.0,
                   ("b", 1): 5.0, ("b", 2): 6.0}
    b_after = _partition_files(str(tmp_path / "items" / "collection=b"))
    assert b_after == b_before  # untouched partition bytes unchanged

    # empty updates: a no-op (not a reduce-of-empty crash)
    empty = second.limit(0)
    upsert_by_key(empty, path, keys=["collection", "item_id"],
                  partition_by=["collection"])
    assert read_catalog(spark, path).count() == 5
