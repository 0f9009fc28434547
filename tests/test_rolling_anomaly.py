"""Rolling-anomaly recipe test (ADR-0007 shape): trailing 3-step sums
compared to same-calendar-month climatological accumulation."""

import datetime as dt

import numpy as np

from georiva_spark.plans import DerivationEngine, RecipeRegistry
from georiva_spark.plans.recipes import RollingAnomalyRecipe
from tests.test_engine import _staging_catalog


def test_rolling_anomaly_values(spark):
    # 24 monthly slices: value = year index + 1 (2020→1.0, 2021→2.0)
    ctx = _staging_catalog(spark, 24)
    reg = RecipeRegistry()
    recipe = RollingAnomalyRecipe("src", "roll", window_steps=3)
    reg.register(recipe)
    eng = DerivationEngine(spark, reg, ctx)
    recs = eng.run_all()
    assert len(recs) == 1 and recs[0].status == "completed"

    resolved = recipe.resolve_inputs({"window": 3}, ctx)
    _, out = recipe.transform(spark, {"window": 3}, resolved)
    rows = out.where("y = 0 AND x = 0").orderBy("time").collect()
    # first full window ends at month 3 → 22 output steps per pixel
    assert len(rows) == 22
    # 2020 windows inside the year sum to 3.0; within-2021 to 6.0
    r_mar20 = [r for r in rows if r.time == dt.datetime(2020, 3, 1)][0]
    assert r_mar20.rolling_sum == 3.0
    r_mar21 = [r for r in rows if r.time == dt.datetime(2021, 3, 1)][0]
    assert r_mar21.rolling_sum == 6.0
    # baseline per calendar month over both years: (3+6)/2 = 4.5 for March
    np.testing.assert_allclose(r_mar20.anomaly, 3.0 - 4.5)
    np.testing.assert_allclose(r_mar21.anomaly, 6.0 - 4.5)
    np.testing.assert_allclose(r_mar21.relative_anomaly, 1.5 / 4.5)
    # idempotency holds for the new recipe too
    again = eng.run_all()
    assert again[0].status == "skipped"
