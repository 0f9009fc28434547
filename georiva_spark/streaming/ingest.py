"""Event-driven ingestion as Structured Streaming (SURVEY.md §2.9).

The reference's MinIO-notification → Redis → consumer → Celery chain
(docs/architecture/runtime-flow.md:136-150) collapses to a Spark file
stream: files landing in a directory are discovered by the source, each
micro-batch appends to the grid table and drives the derivation planner
over exactly the new keys (T1 + T2). Exactly-once comes from checkpointed
source offsets + idempotent unit overwrites (T3) instead of locks.

Recovery doctrine matches the reference (runtime-flow.md:189-205): no
per-event retry; a periodic AvailableNow pass (T7) re-runs the planner
sweeps (resurrection, stale recompute, reclaim).
"""

from __future__ import annotations

import datetime as dt
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from georiva_spark.plans.engine import DerivationEngine, Trigger
from georiva_spark.schemas import GRID_SCHEMA


def grid_file_stream(spark: SparkSession, landing_dir: str,
                     schema=GRID_SCHEMA) -> DataFrame:
    """T1 — file-arrival source over a landing directory of parquet drops.

    At scale: maxFilesPerTrigger bounds batch size; the stream only lists
    new files (checkpointed), so a 100 TB history directory costs nothing
    per batch.
    """
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 64)
            .parquet(landing_dir))


def start_grid_ingest(spark: SparkSession, landing_dir: str, grid_dir: str,
                      checkpoint_dir: str,
                      engine: DerivationEngine | None = None,
                      on_batch: Callable[[DataFrame, int], None] | None = None,
                      available_now: bool = False) -> StreamingQuery:
    """T1/T2 — append new slices to the partitioned grid table, then route
    each arrived (collection, variable, time) key to exactly the derivation
    units it feeds.

    foreachBatch is the planner seam: the batch DataFrame is written once
    (partitioned by collection/variable/date for pruning), then the *keys*
    (a few rows — one per arrived slice, aggregated from the batch, never
    the pixels) drive the engine.
    """

    def process(batch: DataFrame, batch_id: int) -> None:
        if on_batch is not None:
            on_batch(batch, batch_id)
        (batch.withColumn("date", F.to_date("time"))
              .write.mode("append")
              .partitionBy("collection", "variable", "date")
              .parquet(grid_dir))
        if engine is not None:
            keys = (batch.groupBy("collection", "variable", "time")
                    .count().collect())
            for i, k in enumerate(keys):
                item = {"item_id": hash((k.collection, k.variable, k.time)) & 0x7FFFFFFF,
                        "collection": k.collection, "variable": k.variable,
                        "time": k.time, "tier": "staging",
                        "checksum": f"stream-{batch_id}-{i}"}
                engine.catalog.items.append(item)
                engine.dispatch_for_trigger(Trigger("staging_item", item),
                                            origin=f"stream-batch-{batch_id}")

    writer = (grid_file_stream(spark, landing_dir)
              .writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 seconds")
    return writer.start()


def run_sweep_now(engine: DerivationEngine) -> dict[str, int]:
    """T7 — the 5-minute recovery sweep (processing/tasks.py:19-37),
    runnable from any scheduler: reclaim stale RUNNING, resurrect
    not_ready, recompute stale-input units."""
    return engine.sweep()


CORPUS_SCHEMA = ("doc_id long, text string, lang string, "
                 "source string, shard string")


def start_corpus_ingest(spark: SparkSession, landing_dir: str,
                        corpus_dir: str, checkpoint_dir: str,
                        engine: DerivationEngine,
                        schema: str = CORPUS_SCHEMA,
                        max_files_per_trigger: int = 64,
                        available_now: bool = False,
                        token_layout: str | None = None,
                        merges: list[tuple[str, str]] | None = None,
                        context_len: int = 2048,
                        num_shards: int = 64,
                        token_alphabet: str = "") -> StreamingQuery:
    """T1 for the CORPUS product chain (r11): crawl-shard files land
    in a directory; each micro-batch (a) overwrites exactly the
    arrived shards' partitions of the corpus table (dynamic partition
    overwrite — a crawl shard is immutable-once-delivered, so a
    foreachBatch REPLAY rewrites identical bytes instead of
    duplicating rows), (b) registers/updates one staging item per
    arrived shard with a CONTENT checksum (order-independent
    bit_xor of row hashes — a re-delivered identical shard keeps its
    checksum), and (c) dispatches each shard's staging_item trigger
    through the engine, which runs its clean unit and chains the
    declared corpus products (datacard, token shards).

    End-to-end replay idempotency: a replayed batch re-lands the same
    partitions, recomputes the same checksums, and the engine's
    input-hash check (T3) SKIPS every unit — no duplicate rollups,
    no re-tokenization. The caller's engine must hold a grid_loader
    that reads crawl shards from ``corpus_dir`` (partition-pruned by
    shard) and derived items from the engine's output_dir.

    ``token_layout`` (+ ``merges``, r11): ALSO grow the physical
    trainer layout per arrived shard — after the engine chain runs,
    each shard's CLEAN docs (the engine-produced corpus-clean item)
    append to the token-shard layout via the exactly-once delta
    (generation = ``{shard}-{content checksum}``): a replayed batch
    is a no-op, a re-crawled shard fails by name (an immutable
    training layout can't silently swap a generation — rebuild), and
    the first arrival bootstraps the layout with a full export (the
    vocab pins then — pass ``token_alphabet`` with the tokenizer's
    full character set so it does not depend on which characters the
    first crawl happened to contain; later shards with characters
    outside it still fail by name rather than silently corrupting
    ids). Known recovery window: a crash BETWEEN the bootstrap
    export and its marker commit makes the replay fail by name at
    the duplicate guard — the layout then holds exactly that one
    uncommitted generation, so the recovery is to wipe it and
    replay (every later generation commits through the staged
    exactly-once protocol and has no such window)."""

    if token_layout is not None and merges is None:
        raise ValueError(
            "start_corpus_ingest: token_layout needs the pinned "
            "merges table")

    def _grow_layout(shard: str) -> None:
        import hashlib
        import os

        from georiva_spark.sources.tables import (
            commit_generation_marker, export_token_shards,
            export_token_shards_delta, generation_digest)
        item = next((it for it in engine.catalog.items
                     if it["collection"] == "corpus-clean"
                     and it["variable"] == shard), None)
        if item is None:
            return                    # clean unit parked or failed
        loader = engine.catalog.loader_for(item)
        if loader is None:
            return
        clean = loader()
        digest = generation_digest(clean)
        # generation name = sanitized (shard, content) key — a replay
        # reuses it (no-op), a re-crawl makes a NEW one (whose docs
        # then fail the duplicate guard by name: immutable layout)
        gen = hashlib.md5(
            f"{shard}:{digest}".encode()).hexdigest()[:16]
        if not os.path.isdir(os.path.join(token_layout,
                                          "_georiva_manifest")):
            # bootstrap: the first generation full-exports (vocab
            # pins here) and commits its marker so a replayed first
            # batch is a no-op, not a duplicate-doc failure
            export_token_shards(clean, token_layout, merges,
                                context_len=context_len,
                                num_shards=num_shards,
                                extra_alphabet=token_alphabet)
            commit_generation_marker(token_layout, gen, digest)
            return
        export_token_shards_delta(clean, token_layout, merges,
                                  generation=gen)

    def process(batch: DataFrame, batch_id: int) -> None:
        # the conf must be set on the MICRO-BATCH's cloned session —
        # foreachBatch writes run there, not on the outer session
        # (the same per-session trap as the r7 relation-cache lesson)
        bsp = batch.sparkSession
        old = bsp.conf.get("spark.sql.sources.partitionOverwriteMode")
        bsp.conf.set("spark.sql.sources.partitionOverwriteMode",
                     "dynamic")
        try:
            (batch.write.mode("overwrite").partitionBy("shard")
             .parquet(corpus_dir))
        finally:
            bsp.conf.set("spark.sql.sources.partitionOverwriteMode",
                         old)
        digests = (batch.groupBy("shard")
                   .agg(F.bit_xor(F.xxhash64("doc_id", "text"))
                        .alias("digest"),
                        F.count(F.lit(1)).alias("n"))
                   .collect())
        for d in sorted(digests, key=lambda r: r.shard):
            checksum = f"crawl-{d.shard}-{d.digest}-{d.n}"
            item = next((it for it in engine.catalog.items
                         if it["collection"] == "crawl-shards"
                         and it["variable"] == d.shard), None)
            if item is None:
                item = {"item_id": hash(("crawl", d.shard))
                        & 0x7FFFFFFF,
                        "collection": "crawl-shards",
                        "variable": d.shard, "time": None,
                        "tier": "staging", "checksum": checksum}
                engine.catalog.items.append(item)
            else:
                item["checksum"] = checksum
            engine.dispatch_for_trigger(
                Trigger("staging_item", item),
                origin=f"corpus-stream-batch-{batch_id}")
            if token_layout is not None:
                _grow_layout(d.shard)

    writer = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(landing_dir)
              .writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 seconds")
    return writer.start()
