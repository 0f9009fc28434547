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


class TestColorRamps:
    """core/tests/test_color_ramps.py semantics on the value-free layer."""

    def test_colors_without_positions_spread_evenly(self):
        from georiva_spark.functions.styling import spread_positions
        assert spread_positions([None, None, None]) == [0.0, 0.5, 1.0]
        assert spread_positions([None]) == [0.0]

    def test_explicit_positions_are_honoured(self):
        from georiva_spark.functions.styling import spread_positions
        assert spread_positions([0.0, 0.2, 1.0]) == [0.0, 0.2, 1.0]
        # mixed: None entries fall back to even spread slots
        assert spread_positions([None, 0.9, None]) == [0.0, 0.9, 1.0]

    def test_out_of_order_positions_clamped_non_decreasing(self):
        from georiva_spark.functions.styling import spread_positions
        assert spread_positions([0.5, 0.2, 0.8]) == [0.5, 0.5, 0.8]

    def test_continuous_apply_stretches_over_range(self):
        from georiva_spark.functions.styling import generate_stops
        stops = generate_stops(
            [(0, 0, 0, 255), (255, 255, 255, 255)], [None, None], 10.0, 30.0)
        assert stops == [(10.0, (0, 0, 0, 255)), (30.0, (255, 255, 255, 255))]

    def test_stepped_qualitative_cycles_verbatim_hard_edges(self):
        from georiva_spark.functions.styling import generate_stops
        red, green = (255, 0, 0, 255), (0, 255, 0, 255)
        stops = generate_stops([red, green], [None, None], 0.0, 30.0,
                               ramp_type="qualitative", mode="stepped",
                               steps=3)
        # 3 classes, colors cycled red,green,red; hard double boundaries
        assert stops == [(0.0, red), (10.0, red), (10.0, green),
                         (20.0, green), (20.0, red), (30.0, red)]

    def test_stepped_sequential_samples_along_ramp(self):
        from georiva_spark.functions.styling import generate_stops
        stops = generate_stops(
            [(0, 0, 0, 255), (200, 200, 200, 255)], [None, None],
            0.0, 10.0, mode="stepped", steps=2)
        assert stops[0][1] == (0, 0, 0, 255)        # t=0
        assert stops[2][1] == (200, 200, 200, 255)  # t=1
        assert len(stops) == 4

    def test_stepped_stops_feed_palette_color_with_flat_classes(self, spark):
        from pyspark.sql import functions as F
        from georiva_spark.functions.styling import (
            generate_stops, palette_color)
        red, green = (255, 0, 0, 255), (0, 255, 0, 255)
        stops = generate_stops([red, green], [None, None], 0.0, 20.0,
                               ramp_type="qualitative", mode="stepped",
                               steps=2)
        df = spark.createDataFrame([(2.0,), (9.9,), (10.1,), (19.0,)],
                                   ["v"])
        got = [tuple(r.c) for r in df.select(
            palette_color(F.col("v"), stops).alias("c")).collect()]
        assert got[0] == red and got[1] == red     # flat within class 1
        assert got[2] == green and got[3] == green  # flat within class 2
