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

Idempotency across restarts (foreachBatch is at-least-once): the
shared probe-then-grow skeleton (streaming/_loop.py) overwrites the
deterministic ``{out_dir}/batch_id=B`` directory, guards the append on
the batch's presence in ``{table}_ids`` (append writes bands first and
ids last, so "any batch id in _ids" implies the append completed), and
refreshes the serving session's relation caches after growth. Phantom
self-matches on replay are anti-joined away (pairs mode) or excluded
from the membership rollup (lookup mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from georiva_spark.operators.dedup import (hamming_index_append,
                                           hamming_index_compact,
                                           hamming_index_lookup,
                                           hamming_index_params,
                                           hamming_index_probe)
from georiva_spark.streaming._loop import _family_compact, run_probe_grow


def start_mediadup_stream(codes_stream: DataFrame, table: str,
                          out_dir: str, checkpoint_dir: str,
                          id_col: str = "media_id",
                          code_col: str = "code", grow: bool = True,
                          output: str = "pairs",
                          compact_every: int | None = None,
                          compact_dir: str | None = None,
                          gen_fn=None,
                          shard_col: str | None = None,
                          hold_table: str | None = None):
    """Start the probe-then-grow perceptual stream: ``codes_stream``
    must carry (id_col, code_col) with corpus-unique ids.
    ``grow=False`` probes without appending (audit mode). Returns the
    StreamingQuery.

    ``output`` picks the per-batch product:

    - ``'pairs'`` (default): (id_new, id_old, hamming) — the full
      pair list via :func:`hamming_index_probe`. QUADRATIC on
      duplicate-heavy streams: a batch item near an M-member
      identical-code group owes M pair rows (34.8 s vs 3.7 s on the
      1 M-code hot-group smoke).
    - ``'lookup'``: (id_new, min_hamming, n_matched_items) — ONE
      keep-or-drop row per matched batch item via
      :func:`hamming_index_lookup`; unmatched items are absent (semi
      shape). The right mode when the downstream decision is
      keep/drop, which is the common dedup-ingest case. Replays stay
      idempotent by excluding the batch's own ids from the
      membership rollup (the lookup-shaped analog of the pair mode's
      id_old anti-join).

    With ``compact_every=N`` (requires ``compact_dir``), every N
    appends the index compacts back to one file per band bucket
    (fresh staging dirs under ``compact_dir``). ``shard_col`` (r13):
    opt into MULTI-SHARD micro-batches — guard + gen-tagged append
    run per shard slice (see start_neardup_stream)."""
    spark = codes_stream.sparkSession
    hamming_index_params(spark, table)              # fail fast
    if output not in ("pairs", "lookup"):
        raise ValueError(
            f"start_mediadup_stream: output={output!r} — expected "
            f"'pairs' or 'lookup'")
    compact = _family_compact(
        compact_every, compact_dir, "start_mediadup_stream",
        lambda path: hamming_index_compact(spark, table, path))

    def pairs(work: DataFrame) -> DataFrame:
        ids = work.select(F.col(id_col).alias("id_old"))
        p = hamming_index_probe(work, table, id_col=id_col,
                                code_col=code_col)
        return p.join(ids, "id_old", "left_anti")

    def lookup(work: DataFrame) -> DataFrame:
        return hamming_index_lookup(
            work, table, id_col=id_col, code_col=code_col,
            exclude_ids=work.select(F.col(id_col)))

    return run_probe_grow(
        codes_stream, checkpoint_dir, spark=spark,
        outputs=[(out_dir, pairs if output == "pairs" else lookup)],
        guard_table=f"{table}_ids",
        guard_keys=lambda w: w.select(F.col(id_col).alias("id")),
        # gen_fn (r12, e.g. _tombstones.batch_delivery_gen) tags each
        # batch's appended memberships so a re-crawled delivery can
        # later be retracted via hamming_index_retract
        append=lambda w: hamming_index_append(w, table,
                                              gen=(gen_fn(w)
                                                   if gen_fn else ""),
                                              id_col=id_col,
                                              code_col=code_col),
        refresh_tables=(f"{table}_bands", f"{table}_ids"),
        grow=grow,
        compact_every_n_appends=(None if compact is None
                                 else compact_every),
        compact=compact, rules_table=table,
        split_col=shard_col, hold_table=hold_table,
        hold_id_col=None if hold_table is None else id_col)


def read_mediadup_pairs(spark, out_dir: str) -> DataFrame:
    """Read the accumulated pair output (all batches)."""
    return (spark.read.option("basePath", out_dir)
            .parquet(f"{out_dir}/batch_id=*")
            .select("id_new", "id_old", "hamming",
                    F.col("batch_id").cast("long").alias("batch_id")))


def read_mediadup_lookup(spark, out_dir: str) -> DataFrame:
    """Read the accumulated lookup output (``output='lookup'``)."""
    return (spark.read.option("basePath", out_dir)
            .parquet(f"{out_dir}/batch_id=*")
            .select("id_new", "min_hamming", "n_matched_items",
                    F.col("batch_id").cast("long").alias("batch_id")))
