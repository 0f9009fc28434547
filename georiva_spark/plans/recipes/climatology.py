"""Climatology recipe family (reference: processing/recipes/climatology.py):
units = periods × seasons × quantities over a source series collection;
quantity ∈ {value, anomaly, relative_anomaly, trend}; the transform slices
calendar years, season-filters, and reduces per pixel with the temporal
operator library (climatology.py:131-162 → operators/temporal.py here).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, functions as F

from georiva_spark.operators import filters, temporal
from georiva_spark.plans.recipe import (
    CatalogContext, OutputItem, ProductionUnit, ResolvedInput,
)

QUANTITIES = ("value", "anomaly", "relative_anomaly", "trend")


class ClimatologyRecipe:
    recipe_id = "climatology"
    version = "1"

    def __init__(self, source_collection: str, target_collection: str,
                 periods: list[tuple[int, int]],
                 seasons: list[str] = ("annual",),
                 quantities: list[str] = ("value",),
                 baseline: tuple[int, int] | None = None):
        for q in quantities:
            if q not in QUANTITIES:
                raise ValueError(f"unknown quantity {q!r}")
        self.source_collection = source_collection
        self.target_collection = target_collection
        self.periods = [tuple(p) for p in periods]
        self.seasons = list(seasons)
        self.quantities = list(quantities)
        self.baseline = tuple(baseline) if baseline else None

    # ---- unit enumeration (periods × seasons × quantities) ----------------
    def enumerate_units(self, ctx: CatalogContext) -> list[ProductionUnit]:
        return [{"period": list(p), "season": s, "quantity": q}
                for p in self.periods for s in self.seasons
                for q in self.quantities]

    def candidate_units(self, trigger, ctx: CatalogContext) -> list[ProductionUnit]:
        """A new source timestep affects every unit whose period covers its
        year (event→unit routing, T2)."""
        it = trigger.item
        if (trigger.kind != "staging_item" or it is None
                or it.get("collection") != self.source_collection):
            return []
        year = it["time"].year
        needs_baseline = {"anomaly", "relative_anomaly"}
        out = []
        for unit in self.enumerate_units(ctx):
            a, b = unit["period"]
            covered = a <= year <= b
            if not covered and self.baseline and unit["quantity"] in needs_baseline:
                covered = self.baseline[0] <= year <= self.baseline[1]
            if covered:
                out.append(unit)
        return out

    # ---- input resolution -------------------------------------------------
    def _series_items(self, ctx: CatalogContext,
                      years: tuple[int, int]) -> list[dict]:
        return [it for it in ctx.find(collection=self.source_collection,
                                      tier="staging")
                if years[0] <= it["time"].year <= years[1]]

    def resolve_inputs(self, unit: ProductionUnit,
                       ctx: CatalogContext) -> list[ResolvedInput]:
        period = tuple(unit["period"])
        out: list[ResolvedInput] = []
        series = self._series_items(ctx, period)
        if not series:
            out.append(ResolvedInput(role="series", tier="staging",
                                     item_id=None, checksum="", required=True))
        for it in series:
            out.append(ResolvedInput(role="series", tier="staging",
                                     item_id=it["item_id"],
                                     checksum=it["checksum"],
                                     load=ctx.loader_for(it)))
        if unit["quantity"] in ("anomaly", "relative_anomaly"):
            if self.baseline is None:
                out.append(ResolvedInput(role="baseline", tier="staging",
                                         item_id=None, checksum="",
                                         required=True))
            else:
                base = self._series_items(ctx, self.baseline)
                if not base:
                    out.append(ResolvedInput(role="baseline", tier="staging",
                                             item_id=None, checksum="",
                                             required=True))
                for it in base:
                    out.append(ResolvedInput(role="baseline", tier="staging",
                                             item_id=it["item_id"],
                                             checksum=it["checksum"],
                                             load=ctx.loader_for(it)))
        return out

    # ---- pure compute ------------------------------------------------------
    def _concat(self, inputs: list[ResolvedInput], role: str) -> DataFrame | None:
        dfs = [r.load() for r in inputs if r.role == role and r.load is not None]
        if not dfs:
            return None
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)   # U1 multi-file concat along time
        return out

    def transform(self, spark: SparkSession, unit: ProductionUnit,
                  resolved: list[ResolvedInput]) -> tuple[OutputItem, DataFrame]:
        period = tuple(unit["period"])
        season, quantity = unit["season"], unit["quantity"]
        series = self._concat(resolved, "series")
        series = filters.year_window(series, period[0], period[1])

        if quantity == "trend":
            out = temporal.trend(series, season=season)
        else:
            clim = temporal.climatology(series, season=season)
            if quantity == "value":
                out = clim
            else:
                base_series = self._concat(resolved, "baseline")
                base_series = filters.year_window(
                    base_series, self.baseline[0], self.baseline[1])
                base = temporal.climatology(base_series, season=season)
                out = temporal.anomaly(clim, base,
                                       relative=(quantity == "relative_anomaly"))
        out = out.withColumn("collection", F.lit(self.target_collection))
        item_time = dt.datetime(period[0], 1, 1)
        return (OutputItem(
            collection=self.target_collection, variable=quantity,
            time=item_time,
            properties={"season": season, "period": f"{period[0]}-{period[1]}",
                        "quantity": quantity}), out)
