"""Shared probe-then-grow foreachBatch skeleton — ONE implementation
of the loop the four streamed index families (MinHash text in
neardup.py, IVF/PQ embeddings in annstream.py, Hamming media in
mediadup.py, crawl corpus in corpus.py) each re-implemented through
r7. The r7 double-append hazard (per-session relation caches) had to
be fixed in four places — the smell this module removes: the replay
guard, the deterministic-directory overwrite, and the serving-session
refresh now live once.

Contract per micro-batch:

1. empty batches are skipped; ``prepare`` (optional) transforms the
   raw micro-batch into the working frame (e.g. WARC demux + quality
   gate), which is PERSISTED for the batch's lifetime so probe,
   outputs, guard, and append all see one evaluation;
2. every ``(base_dir, fn)`` in ``outputs`` writes ``fn(work)`` to the
   DETERMINISTIC ``{base_dir}/batch_id={N}`` with mode=overwrite — a
   replay rewrites the same bytes (the derivation-ledger idempotency
   policy, no lock service);
3. when ``grow``: the append runs only if ``guard_keys(work)`` (a
   single-column frame named for ``guard_table``'s key column) has NO
   row already in ``guard_table`` — each family's append writes its
   guard table LAST, so presence implies the prior append completed
   (at-least-once foreachBatch made idempotent);
4. after an append, every table in ``refresh_tables`` refreshes on
   the SERVING session: foreachBatch hands the batch to a CLONED
   session and Spark's table relation cache is per-session state — an
   append refreshes its own session only, and without this step the
   serving session's next applied-guard or probe scans a pre-append
   file listing (double-append / stale-index hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def run_probe_grow(stream_df: DataFrame, checkpoint_dir: str, *,
                   spark, outputs, guard_table: str, guard_keys,
                   append, refresh_tables, prepare=None,
                   grow: bool = True):
    """Start the stream; returns the StreamingQuery. See module doc
    for the per-batch contract. ``spark`` must be the SERVING session
    (the one outer readers and the guard use), not the per-batch
    cloned one."""
    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        work = (prepare(batch) if prepare is not None else batch)
        work = work.persist()
        try:
            for base, fn in outputs:
                (fn(work).write.mode("overwrite")
                 .parquet(f"{base}/batch_id={batch_id}"))
            if grow:
                keys = guard_keys(work)
                applied = (spark.table(guard_table)
                           .join(keys, keys.columns[0], "left_semi")
                           .limit(1).count() > 0)
                if not applied:
                    append(work)
                    for t in refresh_tables:
                        spark.catalog.refreshTable(t)
        finally:
            work.unpersist()

    return (stream_df.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())
