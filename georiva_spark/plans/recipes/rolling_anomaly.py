"""Rolling-anomaly recipe (reference: CHIRPS rolling anomaly product,
docs/adr/0007-chirps-rolling-anomaly-product-structure.md): for each new
timestep, the trailing N-step accumulation compared against the per-pixel
climatological accumulation for the same calendar window.

Spark shape: one range-frame window (W4) over the series gives every
trailing accumulation in a single pass — the reference derives one product
per arriving timestep; here all timesteps' outputs materialize together
and the engine's hash-skip keeps re-runs incremental.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from georiva_spark.functions.scalars import safe_divide
from georiva_spark.plans.recipe import (
    CatalogContext, OutputItem, ProductionUnit, ResolvedInput,
)


class RollingAnomalyRecipe:
    recipe_id = "rolling_anomaly"
    version = "1"

    def __init__(self, source_collection: str, target_collection: str,
                 window_steps: int = 3, baseline_years: tuple[int, int] = None):
        self.source_collection = source_collection
        self.target_collection = target_collection
        self.window_steps = window_steps
        self.baseline_years = tuple(baseline_years) if baseline_years else None

    def enumerate_units(self, ctx: CatalogContext) -> list[ProductionUnit]:
        return [{"window": self.window_steps}]

    def candidate_units(self, trigger, ctx: CatalogContext) -> list[ProductionUnit]:
        it = trigger.item
        if (trigger.kind == "staging_item" and it is not None
                and it.get("collection") == self.source_collection):
            return self.enumerate_units(ctx)
        return []

    def resolve_inputs(self, unit: ProductionUnit,
                       ctx: CatalogContext) -> list[ResolvedInput]:
        series = ctx.find(collection=self.source_collection, tier="staging")
        if not series:
            return [ResolvedInput(role="series", tier="staging",
                                  item_id=None, checksum="", required=True)]
        return [ResolvedInput(role="series", tier="staging",
                              item_id=it["item_id"], checksum=it["checksum"],
                              load=ctx.loader_for(it))
                for it in series]

    def transform(self, spark: SparkSession, unit: ProductionUnit,
                  resolved: list[ResolvedInput]) -> tuple[OutputItem, DataFrame]:
        dfs = [r.load() for r in resolved if r.load is not None]
        series = dfs[0]
        for d in dfs[1:]:
            series = series.unionByName(d)
        n = unit["window"]
        w = (Window.partitionBy("collection", "variable", "y", "x")
             .orderBy("time").rowsBetween(-(n - 1), 0))
        rolled = series.select(
            "collection", "variable", "time", "y", "x", "lat", "lon",
            F.sum("value").over(w).alias("rolling_sum"),
            F.count("value").over(w).alias("_n"))
        # only full windows produce a product (ADR-0007: product exists
        # once N inputs accumulated)
        rolled = rolled.where(F.col("_n") == n).drop("_n")
        base_src = rolled
        if self.baseline_years is not None:
            a, b = self.baseline_years
            base_src = rolled.where(F.year("time").between(a, b))
        base = (base_src.groupBy("variable", "y", "x",
                                 F.month("time").alias("_m"))
                .agg(F.avg("rolling_sum").alias("_base")))
        out = (rolled.withColumn("_m", F.month("time"))
               .join(F.broadcast(base), ["variable", "y", "x", "_m"], "left")
               .select("collection", "variable", "time", "y", "x",
                       "lat", "lon", "rolling_sum",
                       (F.col("rolling_sum") - F.col("_base")).alias("anomaly"),
                       safe_divide(F.col("rolling_sum") - F.col("_base"),
                                   F.col("_base")).alias("relative_anomaly"))
               .withColumn("collection", F.lit(self.target_collection)))
        return (OutputItem(collection=self.target_collection,
                           variable="rolling_anomaly",
                           time=dt.datetime(1970, 1, 1),
                           properties={"window_steps": str(n)}), out)
