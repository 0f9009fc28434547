"""Derivation-engine behaviour tests — mirrors the reference's
processing/tests/test_engine.py / test_invocation.py scenarios:
idempotency skip, hash-change recompute, readiness park + resurrection,
origin stamping, lineage writes, transitive invalidation, reclaim."""

import datetime as dt

import numpy as np
import pytest

from georiva_spark.plans import (
    CatalogContext, DerivationEngine, RecipeRegistry, Trigger,
)
from georiva_spark.plans.recipes import ClimatologyRecipe, PromotionRecipe
from georiva_spark.testing import grid_from_arrays, month_starts


def _staging_catalog(spark, n_months=24, collection="src", start_year=2020):
    """One staging item per monthly slice; constant value = year index + 1."""
    times = month_starts(dt.datetime(start_year, 1, 1), n_months)
    items, grids = [], {}
    for i, t in enumerate(times):
        val = float(t.year - start_year + 1)
        items.append({"item_id": i + 1, "collection": collection,
                      "variable": "v", "time": t, "tier": "staging",
                      "checksum": f"sha-{i}-{val}"})
        grids[i + 1] = grid_from_arrays(spark, np.full((2, 2), val), [t],
                                        collection=collection)
    return CatalogContext(spark, items,
                          grid_loader=lambda it: grids.get(it["item_id"]))


@pytest.fixture()
def clim_engine(spark):
    ctx = _staging_catalog(spark, 24)
    reg = RecipeRegistry()
    reg.register(ClimatologyRecipe(
        "src", "clim", periods=[(2020, 2021)], seasons=["annual", "JJA"],
        quantities=["value", "anomaly"], baseline=(2020, 2020)))
    return DerivationEngine(spark, reg, ctx)


def test_unit_enumeration_and_completion(spark, clim_engine):
    recs = clim_engine.run_all(origin="backfill")
    # 1 period × 2 seasons × 2 quantities = 4 units
    assert len(recs) == 4
    assert all(r.status == "completed" for r in recs)
    assert all(r.origin == "backfill" for r in recs)
    # derived items registered as published tier
    derived = [i for i in clim_engine.catalog.items if i["tier"] == "published"]
    assert len(derived) == 4


def test_idempotency_skip_and_hash_recompute(spark, clim_engine):
    first = clim_engine.run_all()
    assert {r.status for r in first} == {"completed"}
    again = clim_engine.run_all()
    assert {r.status for r in again} == {"skipped"}
    assert all(r.reason == "input_hash unchanged" for r in again)
    # item ids stable across re-runs (overwrite-in-place)
    assert {r.produced_item_id for r in again} == \
        {r.produced_item_id for r in first}
    # change one source checksum → only sweep_stale recomputes
    clim_engine.catalog.items[0]["checksum"] = "sha-CHANGED"
    redone = clim_engine.sweep_stale()
    assert len(redone) == 4 and {r.status for r in redone} == {"completed"}
    assert all(r.origin == "stale-sweep" for r in redone)


def test_repeat_triggers_stay_skipped(spark, clim_engine):
    """A skipped record is as authoritative as a completed one: the
    third (and every later) identical run must keep skipping, never
    silently re-run the transform (round-2 review finding)."""
    first = clim_engine.run_all()
    items_after = len(clim_engine.catalog.items)
    for _ in range(3):
        again = clim_engine.run_all()
        assert {r.status for r in again} == {"skipped"}
    assert len(clim_engine.catalog.items) == items_after
    assert {r.produced_item_id for r in again} == \
        {r.produced_item_id for r in first}


def test_stale_units_df_matches_driver_hash(spark, clim_engine):
    """The distributed stale scan must agree with the driver-side
    input_hash: clean ledger → empty; one mutated source checksum →
    exactly the affected units, with the Spark-computed hash equal to
    what the python recompute produces."""
    from georiva_spark.plans.recipe import input_hash

    clim_engine.run_all()
    assert clim_engine.stale_units_df().count() == 0
    clim_engine.catalog.items[0]["checksum"] = "sha-CHANGED"
    stale = clim_engine.stale_units_df().collect()
    assert len(stale) == 4   # every unit consumes the mutated month
    # Spark-side sha256 equals the canonical-JSON driver hash
    from georiva_spark.plans.engine import _dedup_checksums
    recipe = clim_engine.registry.get("climatology")
    import json as _json
    for row in stale:
        unit = _json.loads(row.unit_key)
        resolved = recipe.resolve_inputs(unit, clim_engine.catalog)
        want = input_hash(_dedup_checksums(resolved), recipe.version)
        assert row.current_input_hash == want
        assert row.recorded_input_hash != want
    # the driver executor then recomputes exactly that work list
    redone = clim_engine.sweep_stale()
    assert len(redone) == 4
    assert clim_engine.stale_units_df().count() == 0


def test_anomaly_values_from_transform(spark, clim_engine):
    clim_engine.run_all()
    # anomaly vs 2020 baseline: mean over 2020-2021 = 1.5, baseline = 1.0
    import json
    recs = [r for r in clim_engine.runs.values()
            if json.loads(r.unit_key)["quantity"] == "anomaly"
            and json.loads(r.unit_key)["season"] == "annual"]
    assert len(recs) == 1
    # lineage: anomaly unit consumed both series (24) and baseline (12,
    # dedup'd to 24 distinct source items since baseline ⊂ series)
    edges = [e for e in clim_engine.lineage
             if e.derived_item_id == recs[0].produced_item_id]
    assert len(edges) == 24


def test_readiness_park_and_resurrection(spark):
    ctx = CatalogContext(spark, [], grid_loader=None)
    reg = RecipeRegistry()
    reg.register(ClimatologyRecipe("src", "clim", periods=[(2020, 2021)],
                                   quantities=["value"]))
    eng = DerivationEngine(spark, reg, ctx)
    recs = eng.run_all()
    assert {r.status for r in recs} == {"not_ready"}
    assert "missing inputs" in recs[0].reason
    # inputs arrive → resurrection sweep completes the parked unit (T4)
    full = _staging_catalog(spark, 24)
    eng.catalog.items = full.items
    eng.catalog._grid_loader = full._grid_loader
    revived = eng.sweep_not_ready()
    assert {r.status for r in revived} == {"completed"}
    assert all(r.origin == "resurrection" for r in revived)


def test_trigger_routing_promotion(spark):
    ctx = _staging_catalog(spark, 3)
    reg = RecipeRegistry()
    reg.register(PromotionRecipe("src", "pub"))
    eng = DerivationEngine(spark, reg, ctx)
    # one trigger → exactly one unit (1:1 promotion)
    recs = eng.dispatch_for_trigger(
        Trigger(kind="staging_item", item=ctx.items[0]), origin="event")
    assert len(recs) == 1 and recs[0].status == "completed"
    assert recs[0].origin == "event"
    # unrelated collection → no units
    other = {"item_id": 999, "collection": "other", "time": dt.datetime(2020, 1, 1),
             "tier": "staging", "checksum": "x"}
    assert eng.dispatch_for_trigger(Trigger(kind="staging_item", item=other)) == []


def test_trigger_routing_climatology_by_year(spark, clim_engine):
    # item in 2020 (covered) routes to all 4 units; item in 2030 → none
    it2020 = clim_engine.catalog.items[0]
    recs = clim_engine.dispatch_for_trigger(Trigger("staging_item", it2020))
    assert len(recs) == 4
    far = dict(it2020, time=dt.datetime(2030, 1, 1))
    assert clim_engine.dispatch_for_trigger(Trigger("staging_item", far)) == []


def test_invalidate_downstream_transitive(spark):
    ctx = _staging_catalog(spark, 12)
    reg = RecipeRegistry()
    reg.register(PromotionRecipe("src", "pub"))
    eng = DerivationEngine(spark, reg, ctx)
    rec = eng.dispatch_for_trigger(Trigger("staging_item", ctx.items[0]))[0]
    promoted = rec.produced_item_id
    # chain: promoted item feeds a second-level recipe
    reg2 = RecipeRegistry()
    reg2.register(PromotionRecipe("pub", "pub2"))
    eng.registry = reg2
    pub_item = [i for i in ctx.items if i["item_id"] == promoted][0]
    rec2 = eng.dispatch_for_trigger(Trigger("staging_item",
                                            dict(pub_item, tier="staging")))[0]
    # invalidation from the original staging item reaches both levels (T5)
    affected = eng.invalidate_downstream([ctx.items[0]["item_id"]])
    assert promoted in affected and rec2.produced_item_id in affected


def test_reclaim_stale_running(spark):
    ctx = _staging_catalog(spark, 3)
    reg = RecipeRegistry()
    reg.register(PromotionRecipe("src", "pub"))
    now = [dt.datetime(2020, 1, 1, 0, 0)]
    eng = DerivationEngine(spark, reg, ctx, now_fn=lambda: now[0])
    from georiva_spark.plans.engine import RunRecord
    eng.runs["stuck"] = RunRecord("promotion", "1", "{}", "stuck",
                                  "running", updated_at=now[0])
    now[0] = dt.datetime(2020, 1, 1, 1, 0)   # 1h later > 30min timeout
    assert eng.reclaim_stale_running() == 1
    assert eng.runs["stuck"].status == "pending"


def test_status_rollup_over_runs_df(spark, clim_engine):
    clim_engine.run_all()
    clim_engine.run_all()
    from georiva_spark.operators.stats import status_rollup
    got = {r.status: r.n for r in status_rollup(clim_engine.runs_df()).collect()}
    assert got == {"skipped": 4}  # ledger keeps latest run per unit


def test_time_limit_ladder_and_soft_limit_path(spark):
    """test_task_time_limits.py invariant: soft < hard < lock timeout, and
    the graceful soft-limit path marks the unit failed (retryable) with
    the lock freed immediately."""
    from georiva_spark.plans.engine import (
        RUN_UNIT_HARD_TIME_LIMIT, RUN_UNIT_SOFT_TIME_LIMIT, RUNNING_TIMEOUT,
        UnitSoftTimeLimit, check_time_budget,
    )

    assert RUN_UNIT_SOFT_TIME_LIMIT < RUN_UNIT_HARD_TIME_LIMIT
    assert RUN_UNIT_HARD_TIME_LIMIT < RUNNING_TIMEOUT

    t0 = dt.datetime(2020, 1, 1)
    check_time_budget(t0, now=t0 + dt.timedelta(minutes=24))  # under budget
    with pytest.raises(UnitSoftTimeLimit):
        check_time_budget(t0, now=t0 + dt.timedelta(minutes=26))

    # a recipe that blows its soft budget fails gracefully and is
    # immediately re-runnable (lock freed now, not at the reclaim sweep)
    ctx = _staging_catalog(spark, 2)
    reg = RecipeRegistry()
    slow = PromotionRecipe("src", "pub")
    orig_transform = slow.transform
    calls = {"n": 0}

    def timed_transform(s, unit, resolved):
        calls["n"] += 1
        if calls["n"] <= 2:  # first pass over both units: out of budget
            check_time_budget(t0, now=t0 + dt.timedelta(minutes=26))
        return orig_transform(s, unit, resolved)

    slow.transform = timed_transform
    reg.register(slow)
    eng = DerivationEngine(spark, reg, ctx)
    first = eng.run_all()
    assert {r.status for r in first} == {"failed"}
    assert all("soft time limit" in r.reason for r in first)
    second = eng.run_all()  # no reclaim needed — lock already free
    assert {r.status for r in second} == {"completed"}


def test_table_primary_ledger_end_to_end(spark, tmp_path):
    """With ledger_dir set, the parquet table is the store of record:
    the dict stays bounded (cache_cap), idempotency lookups fall back to
    pruned table probes, and a fresh engine on the same dir skips all
    work without ever collecting the ledger."""
    ctx = _staging_catalog(spark, 6)
    reg = RecipeRegistry()
    reg.register(PromotionRecipe("src", "pub"))
    led = str(tmp_path / "led")
    eng = DerivationEngine(spark, reg, ctx, ledger_dir=led, cache_cap=2)
    recs = eng.run_all()
    assert {r.status for r in recs} == {"completed"}
    assert len(eng.runs) <= 2              # bounded working set
    assert eng.runs_df().count() == 6      # table holds everything
    again = eng.run_all()                  # probes the table on cache miss
    assert {r.status for r in again} == {"skipped"}
    assert {r.produced_item_id for r in again} == \
        {r.produced_item_id for r in recs}

    eng2 = DerivationEngine(spark, reg, ctx, ledger_dir=led)
    assert eng2.runs == {}                 # nothing collected on attach
    third = eng2.run_all()
    assert {r.status for r in third} == {"skipped"}


def test_table_ledger_distributed_stale_sweep(spark, tmp_path):
    """Ledger mode routes sweep_stale through the distributed
    stale_units_df planner over the parquet tables."""
    ctx = _staging_catalog(spark, 24)
    reg = RecipeRegistry()
    reg.register(ClimatologyRecipe(
        "src", "clim", periods=[(2020, 2021)], seasons=["annual", "JJA"],
        quantities=["value", "anomaly"], baseline=(2020, 2020)))
    eng = DerivationEngine(spark, reg, ctx,
                           ledger_dir=str(tmp_path / "led"))
    eng.run_all()
    assert eng.stale_units_df().count() == 0
    ctx.items[0]["checksum"] = "sha-CHANGED"
    redone = eng.sweep_stale()
    assert len(redone) == 4 and {r.status for r in redone} == {"completed"}
    assert all(r.origin == "stale-sweep" for r in redone)
    assert eng.stale_units_df().count() == 0


def test_table_ledger_reclaim_and_resurrection(spark, tmp_path):
    """T6/T4 over the table: a running row older than the lock timeout is
    reclaimed via a table filter and the pending event lands in the
    ledger; parked units resurrect from the table too."""
    ctx = CatalogContext(spark, [], grid_loader=None)
    reg = RecipeRegistry()
    reg.register(PromotionRecipe("src", "pub"))
    now = [dt.datetime(2020, 1, 1, 0, 0)]
    eng = DerivationEngine(spark, reg, ctx, now_fn=lambda: now[0],
                           ledger_dir=str(tmp_path / "led"))
    from georiva_spark.plans.engine import RunRecord
    stuck = RunRecord("promotion", "1", "{}", "stuck", "running",
                      updated_at=now[0])
    eng._put_run(stuck)
    eng._append_run(stuck)
    eng.runs.clear()                        # force the table path
    now[0] = dt.datetime(2020, 1, 1, 1, 0)  # 1h later > 30min timeout
    assert eng.reclaim_stale_running() == 1
    latest = {r.unit_hash: r.status for r in eng.runs_df().collect()}
    assert latest["stuck"] == "pending"


def test_table_ledger_invalidate_downstream(spark, tmp_path):
    """Transitive invalidation walks the lineage TABLE per round in
    ledger mode (frontier semi-joins, no wholesale edge collect)."""
    ctx = _staging_catalog(spark, 12)
    reg = RecipeRegistry()
    reg.register(PromotionRecipe("src", "pub"))
    eng = DerivationEngine(spark, reg, ctx,
                           ledger_dir=str(tmp_path / "led"))
    rec = eng.dispatch_for_trigger(Trigger("staging_item", ctx.items[0]))[0]
    promoted = rec.produced_item_id
    reg2 = RecipeRegistry()
    reg2.register(PromotionRecipe("pub", "pub2"))
    eng.registry = reg2
    pub_item = [i for i in ctx.items if i["item_id"] == promoted][0]
    rec2 = eng.dispatch_for_trigger(
        Trigger("staging_item", dict(pub_item, tier="staging")))[0]
    eng.lineage.clear()                     # force the table path
    affected = eng.invalidate_downstream([ctx.items[0]["item_id"]])
    assert promoted in affected and rec2.produced_item_id in affected


def test_ledger_compaction_preserves_views_and_recovery(spark, tmp_path):
    """T7 compaction: the event files fold into a latest-state snapshot
    — runs_df/lineage_df identical before and after, superseded event
    files gone, and a fresh engine attaching the compacted dir recovers
    seq/item-id scalars and still skips completed work."""
    import os as _os
    ctx = _staging_catalog(spark, 6)
    reg = RecipeRegistry()
    reg.register(PromotionRecipe("src", "pub"))
    led = str(tmp_path / "led")
    eng = DerivationEngine(spark, reg, ctx, ledger_dir=led, cache_cap=2)
    eng.run_all()
    # force extra transitions so units hold multiple events
    ctx.items[0]["checksum"] = "sha-CHANGED"
    eng.sweep_stale()
    runs_dir = _os.path.join(led, "runs")
    n_before = len([f for f in _os.listdir(runs_dir)
                    if f.endswith(".parquet")])
    assert n_before > 6                       # events, not state
    before_runs = sorted(map(tuple, eng.runs_df().collect()))
    before_lin = sorted(map(tuple, eng.lineage_df().collect()))
    seq_before = eng._seq
    out = eng.compact_ledger()
    assert out["files_removed"] > 0
    n_after = len([f for f in _os.listdir(runs_dir)
                   if f.endswith(".parquet")])
    assert n_after < n_before
    assert sorted(map(tuple, eng.runs_df().collect())) == before_runs
    assert sorted(map(tuple, eng.lineage_df().collect())) == before_lin
    # recovery from the compacted table
    eng2 = DerivationEngine(spark, reg, ctx, ledger_dir=led)
    assert eng2._seq == seq_before
    third = eng2.run_all()
    assert {r.status for r in third} == {"skipped"}
    # sweep() auto-compacts only past the file threshold
    eng2.compact_threshold_files = 0
    res = eng2.sweep()
    assert "compacted_files" in res


def test_compaction_preserves_item_id_high_water_mark(spark, tmp_path):
    """A re-triggered unit's latest event carries produced_item_id=None;
    compaction drops its completed event — the sidecar must still let a
    restarted engine recover the historical max item id, or it would
    re-issue ids colliding with live catalog items."""
    import json as _json
    import os as _os
    ctx = _staging_catalog(spark, 3)
    reg = RecipeRegistry()
    reg.register(PromotionRecipe("src", "pub"))
    led = str(tmp_path / "led")
    eng = DerivationEngine(spark, reg, ctx, ledger_dir=led)
    recs = eng.run_all()
    max_item = max(r.produced_item_id for r in recs)
    # append a superseding event WITHOUT a produced item (as a failed
    # retry would), for the unit that produced the max id
    victim = [r for r in recs if r.produced_item_id == max_item][0]
    seq = eng._seq
    eng._seq += 1
    eng._write_event_file(
        f"{led}/runs",
        [(victim.recipe_id, victim.recipe_version, victim.unit_key,
          victim.unit_hash, "not_ready", victim.input_hash, "retrigger",
          None, None, victim.updated_at, 0, seq)],
        eng._runs_pa_schema(), seq)
    eng.compact_ledger()
    meta = _json.load(open(_os.path.join(led, "_compact_meta.json")))
    assert meta["max_item_id"] >= max_item
    eng2 = DerivationEngine(spark, reg, ctx, ledger_dir=led)
    assert eng2._next_item_id > max_item
