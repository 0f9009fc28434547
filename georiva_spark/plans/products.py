"""Derived-product enable/disable + readiness: the single write-path.

Mirrors ``sources/product_service.py`` (structural invariant: *no enabled
product may have a disabled or missing dependency*) and
``sources/derivation_tracking.py:27-50`` (``product_readiness``: data
availability is a separate RUNTIME gate — a whole chain may be enabled
before any upstream data exists).

- Enabling gates on the transitive dependency closure: every upstream
  product must exist and be enabled, else ``ProductActionError`` names
  the offenders (by display label, sorted).
- Disabling cascades to the transitive dependent closure atomically; the
  closure is recomputed here from the declarations — never trusted from
  a caller — so a stale or forged list can't leave an enabled product
  with a disabled dependency.
- Readiness: every *required* declared input collection must be
  non-empty in the catalog. Spark-first: one grouped count over the grid
  table answers readiness for ALL products at once (``readiness_df``),
  instead of one existence probe per input row.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, Optional

from pyspark.sql import DataFrame, functions as F

from georiva_spark.plans.declarations import (
    DerivedProductDefinition, product_edges,
)


class ProductActionError(Exception):
    """An enable/disable action would break the dependency invariant."""


@dataclass
class ProductRow:
    """The engine's DerivedProduct row: one per provisioned definition."""
    definition_key: str
    is_enabled: bool = False
    label_override: str = ""

    def display_label(self, definitions) -> str:
        if self.label_override:
            return self.label_override
        for d in definitions:
            if d.key == self.definition_key:
                return d.label
        return self.definition_key  # orphan


def dependencies_closure(definitions: list[DerivedProductDefinition],
                         key: str) -> set[str]:
    """Transitive upstream product keys of ``key`` (chain.py
    dependencies_closure): data-flow edges ∪ explicit depends_on."""
    up: dict[str, set[str]] = {}
    for a, b in product_edges(definitions):
        up.setdefault(b, set()).add(a)
    seen: set[str] = set()
    stack = list(up.get(key, ()))
    while stack:
        k = stack.pop()
        if k not in seen:
            seen.add(k)
            stack.extend(up.get(k, ()))
    return seen


def dependents_closure(definitions: list[DerivedProductDefinition],
                       key: str) -> set[str]:
    """Transitive downstream product keys of ``key``."""
    down: dict[str, set[str]] = {}
    for a, b in product_edges(definitions):
        down.setdefault(a, set()).add(b)
    seen: set[str] = set()
    stack = list(down.get(key, ()))
    while stack:
        k = stack.pop()
        if k not in seen:
            seen.add(k)
            stack.extend(down.get(k, ()))
    return seen


def _label(definitions, rows: dict, key: str) -> str:
    row = rows.get(key)
    if row is not None:
        return row.display_label(definitions)
    for d in definitions:
        if d.key == key:
            return d.label
    return key


def enable_product(definitions: list[DerivedProductDefinition],
                   rows: dict[str, ProductRow], key: str) -> ProductRow:
    """Enable ``rows[key]`` after gating on the transitive dependency
    closure (product_service.py:318-352). Atomic — a gate failure leaves
    every row unchanged."""
    if key not in rows:
        raise ProductActionError(f"no product row for {key!r}")
    needed = dependencies_closure(definitions, key)
    missing = [
        _label(definitions, rows, k)
        for k in sorted(needed)
        if rows.get(k) is None or not rows[k].is_enabled
    ]
    if missing:
        raise ProductActionError(
            f"{_label(definitions, rows, key)} needs "
            f"{', '.join(missing)} to be enabled first.")
    rows[key].is_enabled = True
    return rows[key]


def disable_product(definitions: list[DerivedProductDefinition],
                    rows: dict[str, ProductRow], key: str
                    ) -> list[ProductRow]:
    """Disable ``rows[key]`` and every enabled transitive dependent in
    one step (product_service.py:486-502). Returns the rows touched —
    the product first, then its dependents — closure recomputed from the
    declarations."""
    if key not in rows:
        raise ProductActionError(f"no product row for {key!r}")
    dependents = [rows[k] for k in sorted(dependents_closure(definitions, key))
                  if k in rows and rows[k].is_enabled]
    disabled = []
    for row in [rows[key], *dependents]:
        row.is_enabled = False
        disabled.append(row)
    return disabled


def collection_routes_to_staging(definitions: list[DerivedProductDefinition],
                                 rows: dict[str, ProductRow],
                                 collection: str) -> bool:
    """Auto-derived target tier (derivation_invocation.py:76-100): a
    collection routes to staging iff some ENABLED product consumes it at
    the staging tier; otherwise it publishes directly — "no derivation,
    no staging". The tier is a computed consequence of the configured
    products, not a stored field, so it can never drift from them."""
    for d in definitions:
        row = rows.get(d.key)
        if row is None or not row.is_enabled:
            continue
        for ref in d.inputs:
            if ref.collection == collection and ref.tier == "staging":
                return True
    return False


@dataclass
class ProductReadiness:
    ready: bool
    blocked_by: Optional[str] = None
    reason: Optional[str] = None


def product_readiness(definition: DerivedProductDefinition,
                      item_counts: dict[str, int]) -> ProductReadiness:
    """A product is ready iff every *required* declared input collection
    is non-empty (derivation_tracking.py:27-50). Optional inputs never
    block. Names the first offender in declaration order."""
    for ref in definition.inputs:
        if not ref.required:
            continue
        if item_counts.get(ref.collection, 0) <= 0:
            return ProductReadiness(ready=False, blocked_by=ref.collection,
                                    reason=f"{ref.collection} empty")
    return ProductReadiness(ready=True)


def readiness_df(grid: DataFrame,
                 definitions: Iterable[DerivedProductDefinition],
                 collection_col: str = "collection") -> dict[str, ProductReadiness]:
    """Readiness for EVERY definition from one grouped count over the
    catalog/grid table — the scale path: the reference probes
    ``collection.items.exists()`` per input row; here a single
    aggregation answers all products (and Catalyst reads it from
    partition metadata when the table is partitioned by collection)."""
    wanted = {r.collection
              for d in definitions for r in d.inputs if r.required}
    counts = {}
    if wanted:
        counts = {
            r["c"]: r["n"]
            for r in (grid.where(F.col(collection_col).isin(sorted(wanted)))
                      .groupBy(F.col(collection_col).alias("c"))
                      .agg(F.count(F.lit(1)).alias("n")).collect())
        }
    return {d.key: product_readiness(d, counts) for d in definitions}
