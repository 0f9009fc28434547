"""Streaming ingest tests: file-arrival → grid append → derivation trigger
(T1/T2), exactly-once across restarts via checkpoint, sweep recovery (T7)."""

import datetime as dt
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from georiva_spark.plans import CatalogContext, DerivationEngine, RecipeRegistry
from georiva_spark.plans.recipes import PromotionRecipe
from georiva_spark.streaming import start_grid_ingest, run_sweep_now
from georiva_spark.testing import grid_from_arrays

T0 = dt.datetime(2020, 1, 1)


def _drop_file(spark, landing, i, value):
    g = grid_from_arrays(spark, np.full((2, 2), value),
                         [T0 + dt.timedelta(days=i)], collection="stream-src")
    g.coalesce(1).write.mode("append").parquet(os.path.join(landing, f"drop{i}"))


@pytest.fixture()
def dirs(tmp_path):
    landing = tmp_path / "landing"
    grid = tmp_path / "grid"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()
    return str(landing), str(grid), str(ckpt)


def test_stream_ingest_appends_and_triggers(spark, dirs):
    landing, grid_dir, ckpt = dirs
    # two parquet drops in separate subdirs → glob the whole landing dir
    _drop_file(spark, landing, 0, 1.0)
    _drop_file(spark, landing, 1, 2.0)

    ctx = CatalogContext(spark, [], grid_loader=lambda it: None)
    reg = RecipeRegistry()
    reg.register(PromotionRecipe("stream-src", "stream-pub"))
    engine = DerivationEngine(spark, reg, ctx)

    q = start_grid_ingest(spark, landing + "/*", grid_dir, ckpt,
                          engine=engine, available_now=True)
    q.awaitTermination(120)

    out = spark.read.parquet(grid_dir)
    assert out.count() == 8  # 2 drops × 4 pixels
    # partition layout for pruning
    assert {r.collection for r in out.select("collection").distinct().collect()} \
        == {"stream-src"}
    # T2: each arrived timestep routed to its promotion unit
    statuses = [r.status for r in engine.runs.values()]
    assert statuses.count("completed") == 2
    origins = {r.origin for r in engine.runs.values()}
    assert all(o.startswith("stream-batch-") for o in origins)


def test_stream_exactly_once_on_restart(spark, dirs):
    landing, grid_dir, ckpt = dirs
    _drop_file(spark, landing, 0, 1.0)
    q = start_grid_ingest(spark, landing + "/*", grid_dir, ckpt,
                          available_now=True)
    q.awaitTermination(120)
    n1 = spark.read.parquet(grid_dir).count()
    # restart with same checkpoint: old file NOT reprocessed, new one is
    _drop_file(spark, landing, 1, 2.0)
    q2 = start_grid_ingest(spark, landing + "/*", grid_dir, ckpt,
                           available_now=True)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(grid_dir).count()
    assert n1 == 4 and n2 == 8


def test_sweep_recovers_not_ready(spark, dirs):
    ctx = CatalogContext(spark, [], grid_loader=lambda it: None)
    reg = RecipeRegistry()
    from georiva_spark.plans.recipes import ClimatologyRecipe
    reg.register(ClimatologyRecipe("src", "clim", periods=[(2020, 2020)],
                                   quantities=["value"]))
    engine = DerivationEngine(spark, reg, ctx)
    engine.run_all()
    assert [r.status for r in engine.runs.values()] == ["not_ready"]
    # source arrives later; the T7 sweep resurrects and completes
    from tests.test_engine import _staging_catalog
    full = _staging_catalog(spark, 12)
    engine.catalog.items = full.items
    engine.catalog._grid_loader = full._grid_loader
    result = run_sweep_now(engine)
    assert result["resurrected"] == 1
    assert [r.status for r in engine.runs.values()] == ["completed"]
