"""Derived-product enable/disable invariant + readiness gate.

Mirrors sources/test_product_service.py + test_product_readiness.py:
enabling gates on the transitive dependency closure, disabling cascades
to dependents, readiness requires non-empty required input collections.
"""

import pytest

from georiva_spark.plans.declarations import (
    DerivedProductDefinition, InputRef, OutputRef,
)
from georiva_spark.plans.products import (
    ProductActionError, ProductRow, dependencies_closure, dependents_closure,
    disable_product, enable_product, product_readiness, readiness_df,
)


def _defs():
    # raw → daily → anomaly ; daily → monthly (diamond-free chain + fork)
    return [
        DerivedProductDefinition(
            key="daily", recipe_type="resample", label="Daily",
            inputs=(InputRef(role="src", collection="raw", tier="published"),),
            outputs=(OutputRef(role="out", collection="daily"),)),
        DerivedProductDefinition(
            key="anomaly", recipe_type="anomaly", label="Anomaly",
            inputs=(InputRef(role="src", collection="daily", tier="published"),),
            outputs=(OutputRef(role="out", collection="anomaly"),)),
        DerivedProductDefinition(
            key="monthly", recipe_type="resample", label="Monthly",
            inputs=(InputRef(role="src", collection="daily", tier="published"),
                    InputRef(role="mask", collection="masks",
                             tier="published", required=False)),
            outputs=(OutputRef(role="out", collection="monthly"),)),
    ]


def _rows(**enabled):
    return {k: ProductRow(definition_key=k, is_enabled=enabled.get(k, False))
            for k in ("daily", "anomaly", "monthly")}


def test_closures():
    d = _defs()
    assert dependencies_closure(d, "anomaly") == {"daily"}
    assert dependencies_closure(d, "daily") == set()
    assert dependents_closure(d, "daily") == {"anomaly", "monthly"}
    assert dependents_closure(d, "monthly") == set()


def test_enable_gates_on_closure():
    d = _defs()
    rows = _rows()
    with pytest.raises(ProductActionError, match="Anomaly needs Daily"):
        enable_product(d, rows, "anomaly")
    assert not rows["anomaly"].is_enabled  # gate failure leaves row unchanged
    enable_product(d, rows, "daily")
    enable_product(d, rows, "anomaly")
    assert rows["anomaly"].is_enabled


def test_disable_cascades_to_dependents():
    d = _defs()
    rows = _rows(daily=True, anomaly=True, monthly=True)
    disabled = disable_product(d, rows, "daily")
    assert [r.definition_key for r in disabled] == \
        ["daily", "anomaly", "monthly"]
    assert not any(r.is_enabled for r in rows.values())
    # invariant holds: nothing enabled depends on a disabled product
    rows2 = _rows(daily=True, anomaly=True, monthly=False)
    disabled = disable_product(d, rows2, "anomaly")
    assert [r.definition_key for r in disabled] == ["anomaly"]
    assert rows2["daily"].is_enabled  # upstream untouched


def test_label_override_in_errors():
    d = _defs()
    rows = _rows()
    rows["daily"].label_override = "Daily (v2)"
    with pytest.raises(ProductActionError, match=r"Daily \(v2\)"):
        enable_product(d, rows, "anomaly")


def test_product_readiness_required_vs_optional():
    d = _defs()
    monthly = d[2]
    r = product_readiness(monthly, {"daily": 10})
    assert r.ready  # optional 'masks' input empty → never blocks
    r = product_readiness(monthly, {"daily": 0, "masks": 5})
    assert not r.ready and r.blocked_by == "daily"
    assert "empty" in r.reason


def test_readiness_df_one_pass(spark):
    d = _defs()
    grid = spark.createDataFrame(
        [("raw", 1.0)] * 3 + [("daily", 2.0)] * 2,
        "collection string, value double")
    out = readiness_df(grid, d)
    assert out["daily"].ready            # raw present
    assert out["anomaly"].ready          # daily present
    assert out["monthly"].ready          # daily present, masks optional
    empty = spark.createDataFrame([("other", 0.0)],
                                  "collection string, value double")
    out = readiness_df(empty, d)
    assert not out["daily"].ready and out["daily"].blocked_by == "raw"
