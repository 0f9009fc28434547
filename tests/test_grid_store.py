"""Grid-store tests: partition layout, pruning visible in the physical
plan, dynamic-overwrite idempotency (the T3 primitive)."""

import datetime as dt

import numpy as np

from georiva_spark.sources import grid_store
from georiva_spark.testing import grid_from_arrays

T0 = dt.datetime(2020, 1, 1)
T1 = dt.datetime(2020, 1, 2)


def _mk(spark, val, t, variable="v"):
    return grid_from_arrays(spark, np.full((2, 2), val), [t], variable=variable)


def test_write_read_prune(spark, tmp_path):
    path = str(tmp_path / "grid")
    grid_store.write_grid(_mk(spark, 1.0, T0, "a"), path)
    grid_store.write_grid(_mk(spark, 2.0, T1, "a"), path)
    grid_store.write_grid(_mk(spark, 3.0, T0, "b"), path)

    out = grid_store.read_grid(spark, path, variable="a", end=T0)
    assert [r.value for r in out.collect()] == [1.0] * 4

    # pruning is physical: the plan's PartitionFilters carry the predicates
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "variable" in pf and "date" in pf


def test_overwrite_slice_idempotent(spark, tmp_path):
    path = str(tmp_path / "grid")
    grid_store.write_grid(_mk(spark, 1.0, T0, "a"), path)
    grid_store.write_grid(_mk(spark, 2.0, T1, "a"), path)
    # re-derive the T0 slice with new values: only that partition replaced
    grid_store.overwrite_slice(_mk(spark, 9.0, T0, "a"), path)
    grid_store.overwrite_slice(_mk(spark, 9.0, T0, "a"), path)  # idempotent
    out = grid_store.read_grid(spark, path, variable="a")
    by_day = {}
    for r in out.collect():
        by_day.setdefault(r.time.day, set()).add(r.value)
    assert by_day == {1: {9.0}, 2: {2.0}}
    assert out.count() == 8  # no duplicate rows from the double overwrite
