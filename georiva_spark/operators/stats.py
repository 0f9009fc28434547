"""Catalog/rollup aggregations (SURVEY.md §2.4 A8, A11–A13).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def global_stats(grid: DataFrame, keys: Sequence[str] = ("collection", "variable"),
                 value: str = "value") -> DataFrame:
    """A8 — NaN-aware min/max/mean/std per channel (ingestion/extractor.py:
    243-299). The reference's lazy-dask fallback for big rasters is
    automatic here (distributed agg)."""
    v = F.col(value)
    return grid.groupBy(*keys).agg(
        F.min(v).alias("stats_min"), F.max(v).alias("stats_max"),
        F.avg(v).alias("stats_mean"), F.stddev_pop(v).alias("stats_std"),
        F.count(v).alias("valid_count"))


def status_rollup(runs: DataFrame, keys: Sequence[str] = ("status",)) -> DataFrame:
    """A11 — GROUP BY status COUNT(*) progress rollup
    (processing/engine.py:249-284)."""
    return runs.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def collection_extent(df: DataFrame,
                      keys: Sequence[str] = ("collection",)) -> DataFrame:
    """A12 — running union of temporal+spatial extent
    (ingestion/handlers/extent_handler.py:13-64), recomputed as one agg."""
    return df.groupBy(*keys).agg(
        F.min("time").alias("time_min"), F.max("time").alias("time_max"),
        F.min("lon").alias("west"), F.max("lon").alias("east"),
        F.min("lat").alias("south"), F.max("lat").alias("north"))


def distinct_times(df: DataFrame, keys: Sequence[str] = ("collection",),
                   time_col: str = "time") -> DataFrame:
    """A13 — distinct temporal values for EDR extents
    (edr/serializers.py:195-260)."""
    return df.select(*keys, time_col).distinct()
