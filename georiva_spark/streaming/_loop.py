"""Shared probe-then-grow foreachBatch skeleton — ONE implementation
of the loop the four streamed index families (MinHash text in
neardup.py, IVF/PQ embeddings in annstream.py, Hamming media in
mediadup.py, crawl corpus in corpus.py) each re-implemented through
r7. The r7 double-append hazard (per-session relation caches) had to
be fixed in four places — the smell this module removes: the replay
guard, the deterministic-directory overwrite, and the serving-session
refresh now live once.

Contract per micro-batch:

0. a batch with fewer partitions than defaultParallelism is
   round-robin repartitioned FIRST (r10): file-source micro-batches
   arrive one partition per file, and a single-file 100k-row batch
   would otherwise run the whole per-row chain — demux, signature
   kernels, probe fan-outs — inside one task (measured in the
   streamed-PQ smoke);
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
   (at-least-once foreachBatch made idempotent). With ``split_col``
   (r13), the batch is sliced per distinct value FIRST and the
   guard + append run PER SLICE: file arrivals straddling shard
   boundaries (maxFilesPerTrigger slicing two deliveries into one
   micro-batch) then append one generation per shard instead of
   failing the whole batch at batch_delivery_gen's one-shard
   contract, and a crash between two shards' appends replays safely
   (the completed shard guard-skips, the other appends);
4. after an append, every table in ``refresh_tables`` refreshes on
   the SERVING session: foreachBatch hands the batch to a CLONED
   session and Spark's table relation cache is per-session state — an
   append refreshes its own session only, and without this step the
   serving session's next applied-guard or probe scans a pre-append
   file listing (double-append / stale-index hazard);
5. every ``compact_every_n_appends`` MAINTENANCE batches,
   ``compact(n)`` runs and the serving tables refresh again — without
   this a long-running stream appends small files forever and probes
   pay one file-open per append per bucket/cell (each family's
   compact is crash-atomic: stamp-then-swap, so a crash mid-compact
   leaves a probeable table). A batch counts toward the cadence when
   it APPENDED (replays a guard skipped don't), or — r13 — when the
   index has PENDING TOMBSTONE RULES (``rules_table``): a
   retract-heavy stream (operator takedowns / re-crawl retractions
   between batches) otherwise accumulates dead rows that every probe
   reads from disk and filters post-scan, with nothing ever
   triggering the physical purge. The counter is in-process
   maintenance cadence, not replay state — a restarted stream counts
   from zero, which at most delays the next compaction by one
   interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from georiva_spark.operators._tombstones import has_rules as _has_rules


def run_probe_grow(stream_df: DataFrame, checkpoint_dir: str, *,
                   spark, outputs, guard_table: str, guard_keys,
                   append, refresh_tables, prepare=None,
                   grow: bool = True,
                   compact_every_n_appends: int | None = None,
                   compact=None, rules_table: str | None = None,
                   split_col: str | None = None,
                   hold_table: str | None = None,
                   hold_id_col: str | None = None):
    """Start the stream; returns the StreamingQuery. See module doc
    for the per-batch contract. ``spark`` must be the SERVING session
    (the one outer readers and the guard use), not the per-batch
    cloned one. ``compact`` is a no-arg-result callable
    ``compact(n) -> None`` (each family closes over its own
    crash-atomic compact + a fresh staging path). ``rules_table``
    (r13) is the family's index base name for
    :func:`~georiva_spark.operators._tombstones.has_rules` — pending
    tombstone rules count a batch toward the compaction cadence even
    when its append was guard-skipped, so retract-heavy streams still
    purge. ``hold_table`` (+ ``hold_id_col``, r13): every batch is
    filtered through the STANDING HOLD list
    (:func:`~georiva_spark.plans.takedown.hold_filter`, a broadcast
    anti-join) after ``prepare`` and before probe AND append — a
    takedown's hold must keep held ids out of the outputs and the
    index forever, not just until the next delivery carries them
    again."""
    if (hold_table is None) != (hold_id_col is None):
        raise ValueError(
            "run_probe_grow: hold_table and hold_id_col must be "
            "passed together")
    if (compact_every_n_appends is None) != (compact is None):
        raise ValueError(
            "run_probe_grow: compact_every_n_appends and compact must "
            "be passed together")
    if compact_every_n_appends is not None \
            and compact_every_n_appends < 1:
        raise ValueError(
            f"run_probe_grow: compact_every_n_appends="
            f"{compact_every_n_appends} must be >= 1")
    n_appends = [0]

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        # a file-source micro-batch arrives with one partition per
        # FILE — a single-file 100k-row batch would then run every
        # per-row stage (WARC demux, signature/fingerprint kernels,
        # probe fan-outs) inside ONE task (the r10 streamed-PQ smoke
        # stall, generalized). One narrow round-robin shuffle of the
        # raw batch restores executor-wide parallelism for the whole
        # per-batch chain; batches already at >= parallelism
        # partitions are left untouched, and a tiny batch shuffles
        # trivially small data.
        par = batch.sparkSession.sparkContext.defaultParallelism
        if batch.rdd.getNumPartitions() < par:
            batch = batch.repartition(par)
        work = (prepare(batch) if prepare is not None else batch)
        if hold_table is not None:
            from georiva_spark.plans.takedown import hold_filter
            work = hold_filter(work, hold_table, hold_id_col)
        work = work.persist()
        try:
            for base, fn in outputs:
                (fn(work).write.mode("overwrite")
                 .parquet(f"{base}/batch_id={batch_id}"))
            if grow:
                slices = [work]
                if split_col is not None:
                    # bounded: a micro-batch carries a handful of
                    # shards (maxFilesPerTrigger files at most);
                    # deterministic order so replays re-run the same
                    # sequence
                    from pyspark.sql import functions as F
                    vals = sorted(r[0] for r in work
                                  .select(split_col).distinct()
                                  .collect())
                    slices = [work.where(F.col(split_col) == v)
                              for v in vals]
                appended = False
                for sl in slices:
                    keys = guard_keys(sl)
                    applied = (spark.table(guard_table)
                               .join(keys, keys.columns[0],
                                     "left_semi")
                               .limit(1).count() > 0)
                    if not applied:
                        append(sl)
                        appended = True
                if appended:
                    for t in refresh_tables:
                        spark.catalog.refreshTable(t)
                if compact is not None:
                    # r13: a guard-skipped batch still advances the
                    # cadence when tombstone rules are PENDING —
                    # otherwise a retract-heavy stream never triggers
                    # the physical purge and every probe keeps
                    # reading dead rows off disk (filtered post-scan)
                    pending = (not appended and rules_table is not None
                               and _has_rules(spark, rules_table))
                    if appended or pending:
                        n_appends[0] += 1
                        if n_appends[0] % compact_every_n_appends == 0:
                            compact(n_appends[0])
                            for t in refresh_tables:
                                spark.catalog.refreshTable(t)
        finally:
            work.unpersist()

    return (stream_df.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def _family_compact(compact_every: int | None, compact_dir: str | None,
                    who: str, run):
    """Build a family launcher's compact closure: validates the
    (compact_every, compact_dir) pairing and hands ``run`` a FRESH
    staging path per invocation (append counter + random suffix — a
    restarted stream's counter resets, so the suffix keeps staging
    dirs collision-free; compaction is a pure layout rewrite, so the
    path needs no replay determinism). Returns None when compaction
    is not requested."""
    if compact_every is None and compact_dir is None:
        return None
    if compact_every is None or compact_dir is None:
        raise ValueError(f"{who}: compact_every and compact_dir must "
                         f"be passed together")
    import uuid

    def compact(n_appends: int) -> None:
        run(f"{compact_dir}/c{n_appends}_{uuid.uuid4().hex[:8]}")
    return compact
