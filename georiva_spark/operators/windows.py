"""Window-function patterns (SURVEY.md §2.5 W1–W4) and sort/limit idioms
(§2.6 O1): latest-per-group, latest forecast run, keyset pagination.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def latest_per_group(df: DataFrame, group_cols: Sequence[str],
                     order_col: str = "time",
                     tiebreak_cols: Sequence[str] = ()) -> DataFrame:
    """W1 — latest row per group (core/models/item.py:279-285) via
    row_number; deterministic with explicit tiebreak columns."""
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") == 1).drop("_rn"))


def latest_run_steps(df: DataFrame, group_cols: Sequence[str],
                     run_col: str = "reference_time") -> DataFrame:
    """W2 — all rows of the latest forecast run per group
    (core/models/item.py:286-299): max(run) over group, keep matching."""
    w = Window.partitionBy(*group_cols)
    return (df.withColumn("_mx", F.max(run_col).over(w))
              .where(F.col(run_col) == F.col("_mx")).drop("_mx"))


def keyset_page(df: DataFrame, order_col: str = "time",
                token=None, limit: int = 100,
                tiebreak_col: str | None = None) -> DataFrame:
    """W3/O1 — keyset pagination: strictly-before-token filter, descending
    order, limit (stac/views.py:359-369,437-444; page cap 1000).

    Keyset beats OFFSET at scale: the filter is partition-prunable on the
    time-partitioned table, so page N costs the same as page 1.
    """
    limit = min(limit, 1000)
    out = df
    if token is not None:
        out = out.where(F.col(order_col) < F.lit(token))
    order = [F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    return out.orderBy(*order).limit(limit)
