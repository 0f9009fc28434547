"""Continuous near-duplicate detection against a GROWING corpus — the
streaming face of the incremental MinHash-LSH index
(operators/dedup.py: minhash_index_write / probe / append).

The growing-corpus dedup shape at 100 TB: the existing corpus lives in
two bucketed index tables (shuffle paid once at write); each arriving
micro-batch of documents (a crawl shard, an upload burst) is probed
against the index — signatures computed for the DELTA only, index side
scanned shuffle-free — and then appended INTO the index in the same
bucket layout, so batch N+1 dedups against everything through batch N.
Nothing about the existing corpus is ever recomputed or re-shuffled.

Idempotency across restarts (foreachBatch is at-least-once): the pair
output for batch B overwrites the deterministic directory
``{out_dir}/batch_id=B`` (a replay rewrites the same bytes), phantom
pairs a replay would see against its OWN docs (appended by the crashed
first attempt) are anti-joined away, and the index append is guarded
by the batch's presence in the SIGNATURE table — append writes bands
first and sigs last, so "any batch doc in _sigs" implies the append
completed. The one partial-failure residue is duplicate BAND rows from
a crash between the two appends; those only duplicate candidates,
which the probe's dropDuplicates already collapses. Same overwrite-
deterministic-partitions policy as the derivation ledger
(plans/engine.py), no lock service required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from georiva_spark.operators.dedup import (minhash_index_append,
                                           minhash_index_params,
                                           minhash_index_probe)


def start_neardup_stream(docs_stream: DataFrame, table: str,
                         out_dir: str, checkpoint_dir: str,
                         threshold: float = 0.5, grow: bool = True):
    """Start the probe-then-grow stream: ``docs_stream`` must carry
    (doc_id, text) with corpus-unique doc_ids; pairs land in
    ``{out_dir}/batch_id=N`` as (doc_new, doc_old, est_jaccard).
    ``grow=False`` probes without appending (audit mode). Returns the
    StreamingQuery."""
    spark = docs_stream.sparkSession
    params = minhash_index_params(spark, table)   # fail fast on launch

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.persist()
        try:
            ids = batch.select("doc_id")
            pairs = minhash_index_probe(
                batch, table, threshold=threshold,
                num_hashes=params["num_hashes"], bands=params["bands"],
                n=params["n"])
            # a replayed batch whose first attempt already appended
            # would otherwise pair its docs against THEMSELVES in the
            # index — drop pairs whose doc_old is in this batch
            pairs = pairs.join(ids.withColumnRenamed("doc_id", "doc_old"),
                               "doc_old", "left_anti")
            (pairs.write.mode("overwrite")
             .parquet(f"{out_dir}/batch_id={batch_id}"))
            if grow:
                applied = (spark.table(f"{table}_sigs")
                           .join(ids, "doc_id", "left_semi")
                           .limit(1).count() > 0)
                if not applied:
                    minhash_index_append(batch, table)
                    # relation caches are per-session: the append ran
                    # (and refreshed) on foreachBatch's cloned session;
                    # without this, the serving session's applied-guard
                    # scans a pre-append file listing on REPLAY and
                    # appends the same batch twice
                    spark.catalog.refreshTable(f"{table}_bands")
                    spark.catalog.refreshTable(f"{table}_sigs")
        finally:
            batch.unpersist()

    return (docs_stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def read_neardup_pairs(spark, out_dir: str) -> DataFrame:
    """Read the accumulated pair output (all batches)."""
    return (spark.read.option("basePath", out_dir)
            .parquet(f"{out_dir}/batch_id=*")
            .select("doc_new", "doc_old", "est_jaccard",
                    F.col("batch_id").cast("long").alias("batch_id")))
