"""Keyed upsert for catalog tables (items/assets/zonal_stats) — the Spark
analog of the reference's bulk_create(update_conflicts=True) writes
(analysis/zonal_stats/service.py:147-153, ingestion Asset upsert).

Parquet has no in-place merge, so upsert = anti-join survivors ∪ updates,
written two-phase (tmp dir then atomic swap) so a concurrent reader never
sees a half-written table. With ``partition_by`` the table is hive-
partitioned and an upsert reads + rewrites ONLY the partitions its
updates touch (replaceWhere analog — the same partition-scoped overwrite
plans/engine.py uses for unit outputs); untouched partitions' files stay
byte-identical, so cost is O(touched partitions), not O(table). At
warehouse scale this becomes a Delta/Iceberg MERGE; the call-site
contract is identical.
"""

from __future__ import annotations

import functools
import operator
import os
import shutil
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def upsert_by_key(updates: DataFrame, path: str, keys: Sequence[str],
                  partition_by: Sequence[str] | None = None) -> None:
    """Rows in ``updates`` replace existing rows with the same key; all
    other existing rows survive. ``partition_by`` (prefix of the layout,
    e.g. ["collection"]) scopes the rewrite to touched partitions —
    without it the whole table rewrites, acceptable only for small dims.
    Partition values must be non-null slugs (no hive escaping needed)."""
    # the upsert lifecycle commits via DIRECTORY renames, which no
    # pointer backend can express (r13: the commit seam covers tokens
    # and single-file installs) — this site legitimately requires a
    # rename filesystem; the object-store analog is a real table
    # format's MERGE (the docstring's Delta/Iceberg note)
    from georiva_spark.sources.commit import require_rename_fs
    require_rename_fs(path, who="upsert_by_key")
    if partition_by:
        _upsert_partitioned(updates, path, list(keys), list(partition_by))
        return
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


def _upsert_partitioned(updates: DataFrame, path: str,
                        keys: list[str], parts: list[str]) -> None:
    spark = updates.sparkSession
    if not os.path.exists(path):
        updates.write.mode("overwrite").partitionBy(*parts).parquet(path)
        return
    touched = [tuple(r) for r in
               updates.select(*parts).distinct().collect()]
    if not touched:          # empty updates: a no-op, like the flat path
        return
    current = spark.read.parquet(path)
    # partition-pruned read: only touched partitions' files are scanned
    pred = functools.reduce(operator.or_, [
        functools.reduce(operator.and_,
                         [F.col(c) == v for c, v in zip(parts, t)])
        for t in touched])
    survivors = (current.where(pred)
                 .join(updates.select(*keys).distinct(),
                       on=keys, how="left_anti"))
    merged = survivors.unionByName(updates)
    run = uuid.uuid4().hex[:8]
    tmp = f"{path}__tmp_{run}"
    merged.write.mode("overwrite").partitionBy(*parts).parquet(tmp)
    # per-partition directory swap; old dirs parked OUTSIDE the table root
    # so a concurrent partition discovery never sees them
    for i, t in enumerate(touched):
        sub = "/".join(f"{c}={v}" for c, v in zip(parts, t))
        src, dst = os.path.join(tmp, sub), os.path.join(path, sub)
        if not os.path.exists(src):
            continue
        old = f"{path}__old_{run}_{i}"
        if os.path.exists(dst):
            os.rename(dst, old)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.rename(src, dst)
        if os.path.exists(old):
            shutil.rmtree(old)
    shutil.rmtree(tmp)


def read_catalog(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
