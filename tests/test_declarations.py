"""Derived-product declaration layer: dataclass validation, config
coercion, chain DAG, and end-to-end derivation chaining through the
engine (reference core/derived_products/definitions.py:24-192,
sources/derivation_chain.py:52-111)."""

import datetime as dt

import numpy as np
import pytest

from georiva_spark.plans import (
    CatalogContext, DerivationEngine, OutputItem, RecipeRegistry,
    ResolvedInput, Trigger,
)
from georiva_spark.plans.declarations import (
    ChainGraph, ConfigField, DerivedProductDefinition, InputRef, OutputRef,
    build_chain_graph, downstream_keys, product_edges,
)
from georiva_spark.plans.recipes import PromotionRecipe
from georiva_spark.testing import grid_from_arrays

T0 = dt.datetime(2020, 1, 1)


def _definition(key="p1", **kw):
    base = dict(key=key, recipe_type="promotion", label="Promote",
                inputs=(InputRef("source", "raw", "staging"),),
                outputs=(OutputRef("out", "clean"),))
    base.update(kw)
    return DerivedProductDefinition(**base)


def test_refs_validate():
    with pytest.raises(ValueError, match="tier"):
        InputRef("source", "raw", "nope")
    with pytest.raises(ValueError, match="required"):
        InputRef("", "raw", "staging")
    with pytest.raises(ValueError, match="visibility"):
        OutputRef("out", "clean", visibility="secret")
    with pytest.raises(ValueError, match="trigger_mode"):
        _definition(trigger_mode="sometimes")
    with pytest.raises(ValueError, match="depends_on"):
        _definition(depends_on=("p1",))


def test_config_schema_validation():
    d = _definition(config_schema=(
        ConfigField("window", "int", default=3),
        ConfigField("mode", "choice", default="mean",
                    choices=("mean", "sum")),
        ConfigField("scale", "float", default=1.0)))
    cleaned = d.validate_config({"window": "5", "mode": "sum"})
    assert cleaned == {"window": 5, "mode": "sum", "scale": 1.0}
    with pytest.raises(ValueError, match="unknown config"):
        d.validate_config({"bogus": 1})
    with pytest.raises(ValueError, match="not among"):
        d.validate_config({"mode": "median"})
    with pytest.raises(ValueError, match="not a valid int"):
        d.validate_config({"window": "lots"})
    with pytest.raises(ValueError, match="choice type"):
        ConfigField("m", "choice")
    with pytest.raises(ValueError, match="type must be"):
        ConfigField("m", "json")


def test_chain_graph_states_and_edges():
    defs = [
        _definition("promote"),
        _definition("scale", recipe_type="scale", label="Scale",
                    inputs=(InputRef("source", "clean", "published"),),
                    outputs=(OutputRef("out", "final"),)),
        _definition("audit", recipe_type="audit", label="Audit",
                    inputs=(), outputs=(), depends_on=("promote",)),
    ]
    g = build_chain_graph(defs, rows={
        "promote": {"enabled": True, "label": "Promote raw"},
        "scale": {"enabled": False},
        "legacy": {"label": "Old", "recipe_type": "gone"},
    })
    assert isinstance(g, ChainGraph)
    assert g.nodes == ["raw", "clean", "final"]
    by_key = {e.key: e for e in g.edges}
    assert by_key["promote"].state == "enabled"
    assert by_key["promote"].label == "Promote raw"
    assert by_key["scale"].state == "disabled"
    assert by_key["audit"].state == "new"
    assert by_key["legacy"].state == "orphaned" and by_key[
        "legacy"].inputs == []

    assert product_edges(defs) == [("promote", "audit"), ("promote", "scale")]
    assert downstream_keys(defs, "clean") == ["scale"]
    with pytest.raises(ValueError, match="unknown product"):
        product_edges([_definition("x", depends_on=("ghost",))])


class _ScaleRecipe:
    """Downstream recipe consuming a *published* collection — the chained
    step a derivation.completed event dispatches."""
    recipe_id = "scale"
    version = "1"

    def __init__(self, source: str, target: str):
        self.source, self.target = source, target

    def enumerate_units(self, ctx):
        return [{"source_item_id": it["item_id"]}
                for it in ctx.find(collection=self.source, tier="published")]

    def candidate_units(self, trigger, ctx):
        it = trigger.item
        if (trigger.kind == "derivation.completed" and it is not None
                and it.get("collection") == self.source):
            return [{"source_item_id": it["item_id"]}]
        return []

    def resolve_inputs(self, unit, ctx):
        m = ctx.find(item_id=unit["source_item_id"])
        if not m:
            return [ResolvedInput(role="source", tier="published",
                                  item_id=None, checksum="", required=True)]
        it = m[0]
        return [ResolvedInput(role="source", tier=it["tier"],
                              item_id=it["item_id"],
                              checksum=it["checksum"])]

    def transform(self, spark, unit, resolved):
        return OutputItem(collection=self.target, variable="v",
                          time=T0), None


def test_derivation_chaining_end_to_end(spark):
    """promotion completes into 'clean' → the declared DAG dispatches the
    scale product automatically; re-runs are idempotent."""
    items = [{"item_id": 1, "collection": "raw", "variable": "v",
              "time": T0, "tier": "staging", "checksum": "sha-1"}]
    grids = {1: grid_from_arrays(spark, np.ones((2, 2)), [T0],
                                 collection="raw")}
    ctx = CatalogContext(spark, items,
                         grid_loader=lambda it: grids.get(it["item_id"]))
    reg = RecipeRegistry()
    reg.register(PromotionRecipe("raw", "clean"))
    reg.register(_ScaleRecipe("clean", "final"))
    defs = [
        _definition("promote_raw"),
        _definition("scale_clean", recipe_type="scale", label="Scale",
                    inputs=(InputRef("source", "clean", "published"),),
                    outputs=(OutputRef("out", "final"),)),
    ]
    eng = DerivationEngine(spark, reg, ctx, definitions=defs)
    # arrival event → promotion runs → completion chains the scale step
    # (run_all would later re-enumerate and overwrite the ledger record,
    # so drive via the trigger to observe the chain origin directly)
    eng.dispatch_for_trigger(Trigger(kind="staging_item", item=items[0]))
    chained = [r for r in eng.runs.values()
               if r.origin == "chain:scale_clean"]
    assert len(chained) == 1 and chained[0].status == "completed"
    finals = [i for i in eng.catalog.items if i["collection"] == "final"]
    assert len(finals) == 1 and finals[0]["tier"] == "published"
    # chained item's lineage points at the intermediate clean item
    clean_id = next(i["item_id"] for i in eng.catalog.items
                    if i["collection"] == "clean")
    edges = [e for e in eng.lineage
             if e.derived_item_id == finals[0]["item_id"]]
    assert [e.source_item_id for e in edges] == [clean_id]
    # second pass: everything idempotently skips, no duplicate finals
    again = eng.run_all()
    assert {r.status for r in again} == {"skipped"}
    assert len([i for i in eng.catalog.items
                if i["collection"] == "final"]) == 1
