"""Bucketed-table materialization — the co-located-join storage layout.

A join between two tables bucketed by the SAME key into the SAME bucket
count needs NO exchange at read time: each task joins bucket i of both
sides (Spark's bucketed scan reports the hash distribution to the
planner, which elides both shuffles — and with sortBy, the sort too).
At 100 TB this is the difference between re-shuffling the fact table on
every join and paying the shuffle ONCE at write time; the reference's
engine re-partitions per query (processing/executor.py joins), so this
is a strictly-better Spark-native capability, not a port.

Bucket-count guidance: pick so one bucket of the larger table ≈ one
task's memory (128-512 MB) — e.g. 100 TB / 4096 buckets ≈ 25 GB per
bucket per table-wide scan, split further by parquet row groups. The
bucket count is part of the table contract: both join sides must match
(Spark 4 can coalesce mismatched counts when one divides the other —
spark.sql.bucketing.coalesceBucketsInJoin.enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   n_buckets: int, path: str,
                   sort: bool = True,
                   one_file_per_bucket: bool = False) -> None:
    """Materialize ``df`` as an external parquet table bucketed (and by
    default sorted) by ``key`` — the pay-shuffle-once step. ``path``
    keeps the data outside the session warehouse so tests and callers
    control the lifecycle; re-running overwrites idempotently.

    ``bucketBy`` writes one file per (task × bucket-present-in-task):
    an initial corpus write keeps full write parallelism, but a
    COMPACTION rewrite would then emit as many files as the fragmented
    input has scan partitions. ``one_file_per_bucket=True``
    pre-repartitions on the bucket keys into exactly ``n_buckets``
    partitions — Spark's HashPartitioning and its bucket spec share
    the Murmur3 hash, so each task holds exactly one bucket and the
    table lands as ONE file per bucket (write parallelism capped at
    n_buckets: right for compaction, where n_buckets was sized for
    the corpus anyway; wrong for a first bulk write).

    When ``df`` IS a matching bucketed-table scan (every compaction),
    the scan already satisfies that distribution, so the planner
    elides the repartition — and would then run
    DisableUnnecessaryBucketedScan, falling back to one task per FILE
    and re-fragmenting the output. Pinning autoBucketedScan off for
    the write keeps the bucket-aligned read: one task per bucket,
    ZERO exchange — the compaction never shuffles at all."""
    keys = [key] if isinstance(key, str) else list(key)
    auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    spark = df.sparkSession
    old = spark.conf.get(auto)
    if one_file_per_bucket:
        df = df.repartition(n_buckets, *keys)
        spark.conf.set(auto, "false")
    try:
        w = (df.write.mode("overwrite").format("parquet")
             .option("path", path)
             .bucketBy(n_buckets, *keys))
        if sort:
            w = w.sortBy(*keys)
        w.saveAsTable(table)
    finally:
        if one_file_per_bucket:
            spark.conf.set(auto, old)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry (external data stays at ``path``)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def atomic_swap_table(spark: SparkSession, table: str) -> None:
    """Swap a staged ``{table}_compact`` into place as ``{table}`` so
    that EVERY intermediate state leaves a probeable table under SOME
    name (rename-out / rename-in / drop-old — never drop-then-rename,
    whose crash window strands the data under the staging name):

      state 0: ``{table}`` live, ``{table}_compact`` staged
      after 1: ``{table}_old`` live (probeable), ``_compact`` staged
      after 2: ``{table}`` live (the new data), ``{table}_old`` retired
      after 3: ``{table}`` live

    Each ALTER/DROP is one catalog statement — atomic per statement,
    NOT across the sequence. A reader mid-swap sees the old table, the
    new table, or a retriable 'table not found'; never a mix of files.
    Crash recovery: if ``{table}`` is missing, rename whichever of
    ``{table}_compact`` / ``{table}_old`` still exists back to
    ``{table}`` (prefer ``_compact`` — it is the newer data); the
    leftover ``_old`` from a crashed drop is cleared up front here.
    Callers must fully stamp TBLPROPERTIES on the ``_compact`` table
    BEFORE calling, so every probeable state is also param-valid."""
    spark.sql(f"DROP TABLE IF EXISTS {table}_old")
    spark.sql(f"ALTER TABLE {table} RENAME TO {table}_old")
    spark.sql(f"ALTER TABLE {table}_compact RENAME TO {table}")
    spark.sql(f"DROP TABLE {table}_old")
