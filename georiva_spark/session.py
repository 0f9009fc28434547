"""SparkSession scaffolding.

Defaults are tuned for the test environment (local[32], 128 GiB) but every
knob is the one you'd set on a 1000-executor cluster reading 100 TB:
AQE on (runtime re-plan, skew-join splitting, partition coalescing),
explicit shuffle partitioning, Arrow for the few Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFIGS: dict[str, str] = {
    # Adaptive execution: runtime shuffle-partition coalescing + skew-join
    # splitting. At 100 TB this is what keeps one hot (collection, time)
    # partition from stalling a stage (SURVEY.md §7 "Skew").
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Local default; on a real cluster size to ~2-3x total cores and let AQE
    # coalesce down. Overridable via env.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # Arrow for pandas_udf / mapInPandas / toPandas interchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scans: keep split size at the default 128 MiB contract but be
    # explicit — partition count at 100 TB derives from this.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Timestamps are UTC everywhere (reference: ingestion/utils.py:57 ensure_utc).
    "spark.sql.session.timeZone": "UTC",
    # Broadcast threshold: dimension tables (variables, collections,
    # boundaries) stay broadcast up to 64 MiB.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Runtime bloom-filter join pruning: when a selective dim-side
    # predicate survives to a shuffle join, inject a bloom filter on the
    # fact side so the 100-TB scan drops non-matching rows before the
    # exchange. (The companion semiJoinReduction rewrite measurably hung
    # the oracle gate on local[32] in Spark 4.1 — left off.)
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # local[32] shares one JVM: size the heap like 32 executors' worth
    # (only effective at JVM launch; ignored on an existing session).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def get_spark(app_name: str = "georiva-spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    for k, v in {**DEFAULT_CONFIGS, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
