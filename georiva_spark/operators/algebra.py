"""Raster algebra (SURVEY.md §2.3 J2, §2.4 A7): element-wise combines of
aligned grids, n-ary nan-aware reductions, weighted mean.

Spark-first shape: instead of aligning k numpy arrays in one process
(geoprocessing/algebra.py:33-74), the k input grids are unioned and reduced
with one groupBy on the pixel key — map-side combine halves the shuffle, and
the plan is identical for k=2 and k=200.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from georiva_spark.functions.scalars import safe_divide

PIXEL_TIME_KEY = ["collection", "time", "y", "x"]


def align(a: DataFrame, b: DataFrame, how: str = "inner",
          a_name: str = "a", b_name: str = "b",
          key: Sequence[str] = ("collection", "time", "y", "x")) -> DataFrame:
    """J2 — raster × raster alignment on the pixel-time key.

    Same-grid precondition as the reference (algebra.py:33-44): inputs share
    the affine/grid. Equi-join on the pixel key; when one side is a single
    slice vs a long series, pass it pre-broadcast (see temporal.anomaly).
    """
    left = a.select(*key, F.col("value").alias(a_name))
    right = b.select(*key, F.col("value").alias(b_name))
    return left.join(right, on=list(key), how=how)


def combine(grids: Sequence[DataFrame], how: str = "sum",
            key: Sequence[str] = ("collection", "time", "y", "x")) -> DataFrame:
    """A7 — n-ary nan-aware combine: sum/product/min/max/mean across k
    aligned grids (geoprocessing/algebra.py:33-74).

    NaN semantics mirror numpy nan-reductions *with* the reference's
    all-NaN-stays-NaN rule (algebra.py:46-47): value null everywhere on the
    pixel → null; any non-null input → nan-skipped reduction.
    """
    stacked = grids[0]
    for g in grids[1:]:
        stacked = stacked.unionByName(g)
    aggs = {
        "sum": F.sum("value"),
        "min": F.min("value"),
        "max": F.max("value"),
        "mean": F.avg("value"),
        # nan-aware product over positives would be exp(sum(log)); signs
        # handled via parity of negatives — exact, still one aggregation.
        "product": (
            F.when(F.sum(F.when(F.col("value") == 0, 1).otherwise(0)) > 0, F.lit(0.0))
            .otherwise(
                F.exp(F.sum(F.log(F.abs(F.col("value"))))) *
                F.pow(F.lit(-1.0),
                      F.sum(F.when(F.col("value") < 0, 1).otherwise(0))))
        ),
    }
    if how not in aggs:
        raise ValueError(f"unsupported combine {how!r}")
    return (stacked.groupBy(*key)
            .agg(aggs[how].alias("value")))


def weighted_mean(grids: Sequence[DataFrame], weights: Sequence[float],
                  key: Sequence[str] = ("collection", "time", "y", "x")) -> DataFrame:
    """A7 weighted mean with per-cell renormalization over valid inputs
    (geoprocessing/algebra.py:52-74): cells where some inputs are null
    renormalize by the sum of weights of the *valid* inputs."""
    if len(grids) != len(weights):
        raise ValueError("one weight per grid")
    stacked = None
    for g, w in zip(grids, weights):
        tagged = g.select(*key, "value", F.lit(float(w)).alias("_w"))
        stacked = tagged if stacked is None else stacked.unionByName(tagged)
    valid_w = F.sum(F.when(F.col("value").isNotNull(), F.col("_w")))
    return (stacked.groupBy(*key)
            .agg(safe_divide(F.sum(F.col("value") * F.col("_w")), valid_w)
                 .alias("value")))
