"""Continuous perceptual near-duplicate detection against a GROWING
media corpus — the streaming face of the persistent Hamming index
(operators/dedup.py: hamming_index_write / probe / append), completing
the streamed index triad (neardup.py: MinHash text, annstream.py:
IVF/PQ embeddings, this: perceptual codes).

Each arriving micro-batch of fingerprints (dHash, audio HK, video
spatiotemporal — any code the Hamming engine bands) probes the index —
delta-only banding, index side shuffle-free — then appends INTO it, so
batch N+1 dedups against every clip through batch N. Identical codes
stay pre-collapsed through growth (append's anti-join adds band rows
only for unseen codes).

Idempotency across restarts (foreachBatch is at-least-once): pair
output for batch B overwrites ``{out_dir}/batch_id=B``; phantom pairs
against the batch's OWN ids (appended by a crashed first attempt) are
anti-joined away; the append is guarded by the batch's presence in
``{table}_ids`` — append writes bands first and ids last, so "any
batch id in _ids" implies the append completed. Relation caches are
per-session: append refreshes its own (cloned) session and the loop
refreshes the serving session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from georiva_spark.operators.dedup import (hamming_index_append,
                                           hamming_index_params,
                                           hamming_index_probe)


def start_mediadup_stream(codes_stream: DataFrame, table: str,
                          out_dir: str, checkpoint_dir: str,
                          id_col: str = "media_id",
                          code_col: str = "code", grow: bool = True):
    """Start the probe-then-grow perceptual stream: ``codes_stream``
    must carry (id_col, code_col) with corpus-unique ids; pairs land
    in ``{out_dir}/batch_id=N`` as (id_new, id_old, hamming).
    ``grow=False`` probes without appending (audit mode). Returns the
    StreamingQuery. The per-batch output is the PAIR list — on a
    duplicate-heavy stream (black frames, silence) swap the probe for
    :func:`~georiva_spark.operators.dedup.hamming_index_lookup` in a
    custom loop: a batch item near an M-member group owes M pair rows
    here but one lookup row there."""
    spark = codes_stream.sparkSession
    hamming_index_params(spark, table)              # fail fast

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.persist()
        try:
            ids = batch.select(F.col(id_col).alias("id_old"))
            pairs = hamming_index_probe(batch, table, id_col=id_col,
                                        code_col=code_col)
            pairs = pairs.join(ids, "id_old", "left_anti")
            (pairs.write.mode("overwrite")
             .parquet(f"{out_dir}/batch_id={batch_id}"))
            if grow:
                applied = (spark.table(f"{table}_ids")
                           .join(batch.select(F.col(id_col)
                                              .alias("id")),
                                 "id", "left_semi")
                           .limit(1).count() > 0)
                if not applied:
                    hamming_index_append(batch, table, id_col=id_col,
                                         code_col=code_col)
                    spark.catalog.refreshTable(f"{table}_bands")
                    spark.catalog.refreshTable(f"{table}_ids")
        finally:
            batch.unpersist()

    return (codes_stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def read_mediadup_pairs(spark, out_dir: str) -> DataFrame:
    """Read the accumulated pair output (all batches)."""
    return (spark.read.option("basePath", out_dir)
            .parquet(f"{out_dir}/batch_id=*")
            .select("id_new", "id_old", "hamming",
                    F.col("batch_id").cast("long").alias("batch_id")))
