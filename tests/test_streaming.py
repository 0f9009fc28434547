"""Streaming ingest tests: file-arrival → grid append → derivation trigger
(T1/T2), exactly-once across restarts via checkpoint, sweep recovery (T7)."""

import datetime as dt
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from georiva_spark.plans import CatalogContext, DerivationEngine, RecipeRegistry
from georiva_spark.plans.recipes import PromotionRecipe
from georiva_spark.streaming import (
    grid_file_stream, run_sweep_now, start_grid_ingest, windowed_stats,
)
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


def _drop_events(spark, landing, name, rows):
    """rows: [(hour_offset_minutes, value)] → one grid-schema parquet drop."""
    g = grid_from_arrays(spark, np.full((1, 1), 0.0), [T0],
                         collection="wstream")
    base = [r.asDict() for r in g.collect()][0]
    out = []
    for minutes, v in rows:
        row = dict(base)
        row["time"] = T0 + dt.timedelta(minutes=minutes)
        row["value"] = v
        out.append(row)
    (spark.createDataFrame(out, g.schema).coalesce(1)
     .write.mode("append").parquet(os.path.join(landing, name)))


def test_windowed_stats_watermark_late_data(spark, dirs):
    """Append-mode tumbling window: a late row inside the allowed
    lateness folds into its window before it finalizes; a row older than
    the watermark is dropped. Three availableNow passes over one
    checkpoint emulate the arrival timeline."""
    landing, out_dir, ckpt = dirs
    sink_ckpt = ckpt + "-sink"

    def run_pass():
        stream = grid_file_stream(spark, landing + "/*")
        agg = windowed_stats(stream, window="1 hour",
                             watermark="30 minutes")
        q = (agg.writeStream.format("parquet")
             .option("path", out_dir).option("checkpointLocation", sink_ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # batch A: on-time rows at 10:05 and 10:20 (window 10:00-11:00)
    _drop_events(spark, landing, "a", [(605, 1.0), (620, 2.0)])
    run_pass()
    assert not os.path.exists(out_dir) or \
        spark.read.parquet(out_dir).count() == 0  # window still open
    # batch B: watermark advancer at 13:00, LATE row 10:40 (accepted —
    # watermark is still 09:50), TOO-LATE row 08:00 (dropped)
    _drop_events(spark, landing, "b", [(780, 3.0), (640, 4.0), (480, 5.0)])
    run_pass()
    # batch C: watermark (12:30) has passed 11:00 → window finalizes
    _drop_events(spark, landing, "c", [(960, 6.0)])
    run_pass()

    got = spark.read.parquet(out_dir).collect()
    finalized = {(r.window_start.hour, r.n, r.sum) for r in got}
    # the 10:00-11:00 window contains the two on-time rows AND the late
    # 10:40 row; the too-late 08:00 row is absent entirely
    assert (10, 3, 7.0) in finalized
    assert not any(r.window_start.hour == 8 for r in got)


def test_windowed_stats_batch_equivalence(spark):
    g = grid_from_arrays(spark, np.full((1, 1), 0.0), [T0])
    base = g.collect()[0].asDict()
    rows = [dict(base, time=T0 + dt.timedelta(minutes=m), value=v)
            for m, v in [(5, 1.0), (20, 2.0), (70, 3.0)]]
    df = spark.createDataFrame(rows, g.schema)
    out = {(r.window_start.minute + r.window_start.hour * 60, r.n, r.sum)
           for r in windowed_stats(df, window="1 hour").collect()}
    assert out == {(0, 2, 3.0), (60, 1, 3.0)}


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


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Redelivered rows are suppressed across micro-batches and across a
    restart (state comes back from the checkpoint)."""
    from georiva_spark.streaming import dedup_stream

    landing = tmp_path / "dedup_landing"
    landing.mkdir()
    outdir, ckpt = str(tmp_path / "dedup_out"), str(tmp_path / "dedup_ckpt")
    schema = "event_id long, ts timestamp, value double"

    def drop(batch, rows):
        (spark.createDataFrame(rows, schema).coalesce(1)
         .write.mode("append").parquet(str(landing / f"b{batch}")))

    def cycle():
        src = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", "1")
               .parquet(str(landing) + "/*"))
        q = (dedup_stream(src, keys=["event_id"], time_col="ts")
             .writeStream.format("parquet").option("path", outdir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # batch 1 carries an in-batch duplicate of key 2
    drop(0, [(1, T0, 1.0), (2, T0, 2.0), (2, T0, 2.0)])
    cycle()
    got = sorted(r.event_id for r in spark.read.parquet(outdir).collect())
    assert got == [1, 2]

    # restart: keys 2 redelivered in a later file, key 3 is new
    drop(1, [(2, T0 + dt.timedelta(minutes=5), 2.0),
             (3, T0 + dt.timedelta(minutes=5), 3.0)])
    cycle()
    got = sorted(r.event_id for r in spark.read.parquet(outdir).collect())
    assert got == [1, 2, 3]

    # batch path: same call, plain dropDuplicates
    b = spark.createDataFrame([(7, T0, 1.0), (7, T0, 1.0)], schema)
    assert dedup_stream(b, keys=["event_id"]).count() == 1
