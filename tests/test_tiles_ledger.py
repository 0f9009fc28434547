"""Tile pack/unpack round-trip and derivation-ledger persistence tests."""

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from georiva_spark.operators import tiles
from georiva_spark.testing import grid_from_arrays

T0 = dt.datetime(2020, 1, 1)


def test_tiles_roundtrip(spark):
    arr = np.arange(30, dtype=float).reshape(5, 6)
    arr[0, 0] = np.nan
    g = grid_from_arrays(spark, arr, [T0])
    t = tiles.to_tiles(g, tile_size=4)
    rows = t.collect()
    # 5×6 grid with ts=4 → tiles (0,0),(0,1),(1,0),(1,1)
    assert {(r.tile_y, r.tile_x) for r in rows} == {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert all(len(r.values) == 16 for r in rows)
    t00 = [r for r in rows if (r.tile_y, r.tile_x) == (0, 0)][0]
    assert t00.values[0] is None          # NaN pixel → null
    assert t00.values[1] == 1.0           # (y=0,x=1)
    assert t00.values[4] == 6.0           # (y=1,x=0)

    back = tiles.from_tiles(t).where(F.col("value").isNotNull())
    got = {(r.y, r.x): r.value for r in back.collect()}
    want = {(y, x): float(arr[y, x]) for y in range(5) for x in range(6)
            if not np.isnan(arr[y, x])}
    assert got == want


def test_tiles_padding_is_null_only(spark):
    g = grid_from_arrays(spark, [[1.0, 2.0]], [T0])
    t = tiles.to_tiles(g, tile_size=4)
    vals = t.collect()[0].values
    assert vals[:2] == [1.0, 2.0] and set(vals[2:]) == {None}


def test_ledger_persistence_roundtrip(spark, tmp_path):
    import tests.test_engine as te
    from georiva_spark.plans import DerivationEngine, RecipeRegistry
    from georiva_spark.plans.recipes import PromotionRecipe
    ctx = te._staging_catalog(spark, 3)
    reg = RecipeRegistry()
    reg.register(PromotionRecipe("src", "pub"))
    eng = DerivationEngine(spark, reg, ctx)
    eng.run_all()
    path = str(tmp_path / "ledger")
    eng.save_ledger(path)

    eng2 = DerivationEngine(spark, reg, ctx)
    eng2.load_ledger(path)
    # load no longer collects the ledger — the table is the store of
    # record and the dict only caches what gets touched
    assert eng2.runs == {}
    got = {r.unit_hash for r in eng2.runs_df().collect()}
    assert got == set(eng.runs)
    # restored hashes drive idempotency: re-run skips everything (each
    # lookup probes the parquet table)
    again = eng2.run_all()
    assert {r.status for r in again} == {"skipped"}
    assert eng2.lineage_df().count() == len(eng.lineage)


def test_ledger_roundtrip_keeps_multi_input_lineage(spark, tmp_path):
    """Regression: the snapshot must give each derived item's edge
    batch ONE seq — a distinct seq per edge made lineage_df() (which
    keeps only the max-seq batch per derived item) drop all but one
    edge of every multi-input unit after save/load."""
    import tests.test_engine as te
    from georiva_spark.plans import DerivationEngine, RecipeRegistry
    from georiva_spark.plans.recipes import ClimatologyRecipe, PromotionRecipe

    ctx = te._staging_catalog(spark, 24)
    reg = RecipeRegistry()
    reg.register(ClimatologyRecipe(
        "src", "clim", periods=[(2020, 2021)], seasons=["annual"],
        quantities=["value"]))
    eng = DerivationEngine(spark, reg, ctx)
    eng.run_all()      # climatology units consume many monthly sources
    multi = {}
    for e in eng.lineage:
        multi.setdefault(e.derived_item_id, set()).add(e.source_item_id)
    assert any(len(v) > 1 for v in multi.values()), "fixture has no " \
        "multi-input unit; adjust the recipe window"

    path = str(tmp_path / "ledger")
    eng.save_ledger(path)
    eng2 = DerivationEngine(spark, reg, ctx)
    eng2.load_ledger(path)
    got = {}
    for r in eng2.lineage_df().collect():
        got.setdefault(r.derived_item_id, set()).add(r.source_item_id)
    assert got == multi
