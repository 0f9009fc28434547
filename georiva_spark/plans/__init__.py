"""Derivation planner: georiva's processing engine re-expressed Spark-first.

The reference fans out one Celery task per production unit executing serial
numpy (processing/engine.py:441-488); here the planner is driver-side
control flow and each unit's transform is a distributed DataFrame job with
a deterministic, idempotent output partition — Spark task retry plus
overwrite-by-unit replaces the reference's distributed locks (T3/T6).
"""

from georiva_spark.plans.recipe import (
    CatalogContext, ProductionUnit, ResolvedInput, OutputItem, Recipe,
    RecipeRegistry, canonical_json, unit_hash, input_hash,
)
from georiva_spark.plans.engine import DerivationEngine, RunRecord, Trigger
from georiva_spark.plans.declarations import (
    ChainGraph, ConfigField, DerivedProductDefinition, InputRef, OutputRef,
    build_chain_graph, downstream_keys, product_edges,
)

__all__ = ["CatalogContext", "ProductionUnit", "ResolvedInput", "OutputItem",
           "Recipe", "RecipeRegistry", "canonical_json", "unit_hash",
           "input_hash", "DerivationEngine", "RunRecord", "Trigger",
           "ChainGraph", "ConfigField", "DerivedProductDefinition",
           "InputRef", "OutputRef", "build_chain_graph", "downstream_keys",
           "product_edges"]
