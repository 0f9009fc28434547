"""Skew mitigation: salted two-phase aggregation (SURVEY §7 hard part 6).

AQE's skew handling covers skewed *joins*; a skewed *aggregation* key
(one boundary covering most of a grid, one hot collection) still funnels
every pre-aggregated partial for that key to a single reducer. Salting
splits the hot key across `salt_buckets` reducers in phase 1 and merges
the per-salt partials in phase 2 — both phases map-side combine, so the
extra shuffle moves only #keys × salt rows.

Only algebraic aggregates decompose this way; the helper supports the
sum/count/min/max family (mean = sum/count at merge) that every grid
operator in this engine needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_stats(df: DataFrame, keys: Sequence[str], value_col: str = "value",
                 salt_buckets: int = 16) -> DataFrame:
    """Two-phase salted aggregation → (keys…, n, sum, min, max, mean).

    Equivalent to ``df.groupBy(keys).agg(...)`` for any input, but a key
    owning 90% of the rows spreads its phase-1 partials over
    ``salt_buckets`` reducers instead of one.
    """
    v = F.col(value_col)
    salt = (F.xxhash64(F.monotonically_increasing_id())
            % salt_buckets).alias("_salt")
    phase1 = (df.select(*keys, v.alias("_v"), salt)
              .groupBy(*keys, "_salt")
              .agg(F.count("_v").alias("_n"), F.sum("_v").alias("_s"),
                   F.min("_v").alias("_min"), F.max("_v").alias("_max")))
    return (phase1.groupBy(*keys)
            .agg(F.sum("_n").alias("n"), F.sum("_s").alias("sum"),
                 F.min("_min").alias("min"), F.max("_max").alias("max"))
            .withColumn("mean", F.col("sum") / F.col("n")))
