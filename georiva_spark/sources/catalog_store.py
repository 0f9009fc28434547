"""Keyed upsert for catalog tables (items/assets/zonal_stats) — the Spark
analog of the reference's bulk_create(update_conflicts=True) writes
(analysis/zonal_stats/service.py:147-153, ingestion Asset upsert).

Parquet has no in-place merge, so upsert = anti-join survivors ∪ updates,
written two-phase (tmp dir then atomic swap) so a concurrent reader never
sees a half-written table. At warehouse scale this becomes a Delta/Iceberg
MERGE; the call-site contract is identical.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def upsert_by_key(updates: DataFrame, path: str,
                  keys: Sequence[str]) -> None:
    """Rows in ``updates`` replace existing rows with the same key; all
    other existing rows survive."""
    spark = updates.sparkSession
    if not os.path.exists(path):
        updates.write.mode("overwrite").parquet(path)
        return
    current = spark.read.parquet(path)
    survivors = current.join(updates.select(*keys).distinct(),
                             on=list(keys), how="left_anti")
    merged = survivors.unionByName(updates)
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def read_catalog(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
