"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query DataFrame on /root/testdata/sf0.001
queries()     -> {name: fn(spark, sf_dir) -> DataFrame} per SURVEY.md §2 op
oracle_sql()  -> {name: equivalent DuckDB SQL} for the correctness gate
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from georiva_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


# Queries the driver's rotating correctness window has not recorded yet
# (the r13 additions) — surfaced first so the next window reaches them.
_SURFACE_FIRST = [
    "minhash_retract_docs", "ann_retract_docs", "image_retract_docs",
    "token_takedown", "takedown_e2e", "takedown_hold",
    "takedown_report", "token_retire", "corpus_expire",
]


def _reorder(d: dict) -> dict:
    head = {k: d[k] for k in _SURFACE_FIRST if k in d}
    return {**head, **{k: v for k, v in d.items() if k not in head}}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _reorder(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _reorder(dict(ORACLES))
