"""Generation tombstones — ONE implementation of T5-style retraction
for every persistent index family (r12): MinHash text bands
(operators/dedup.py), Hamming media membership (dedup.py), IVF float
and IVF-PQ embedding cells (operators/similarity.py).

The shared shape: index rows appended from one delivery of one crawl
shard carry a GENERATION tag (``make_gen(shard, digest)`` —
deterministic of (shard, content), so a replayed delivery re-mints
the same tag while a re-crawl mints a new one). Retracting a
re-crawled shard appends ONE rule row (shard, keep_gen, seq) to the
managed ``{table}_dead`` table; the LATEST rule per shard wins
(append-only — no overwrite window for concurrent probes to read an
empty rule set). Probes filter live rows via a BROADCAST anti-join
of the bounded rule table (equi on the shard prefix of the gen,
residual on keep_gen — plans as BroadcastHashJoin LeftAnti,
plan-asserted in tests/test_plan_evidence.py), so retraction is O(1)
at event time and never rewrites or reshuffles the index. Each
family's compaction removes dead rows PHYSICALLY and clears the
rules AFTER its table swaps — a crash between leaves rules that
match nothing (idempotently re-appliable), never a window where dead
rows are live again. Single-writer: retracts and compactions are the
stream's to sequence (the same contract as appends).

Reference analog: ``processing/invocation.py:210-247`` — staleness
is transitive to *everything* derived, including index rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: separator between the shard name and the content digest inside a
#: generation tag — unprintable so it can never occur in a shard
#: name, making shard extraction from a gen unambiguous
GEN_SEP = "\x1f"


def make_gen(shard: str, digest: str) -> str:
    """Generation tag for index rows appended from one delivery of
    one crawl shard: ``shard + GEN_SEP + digest``."""
    if not shard:
        raise ValueError("make_gen: shard must be non-empty")
    if GEN_SEP in shard:
        raise ValueError("make_gen: shard contains the GEN_SEP "
                         "sentinel byte")
    return f"{shard}{GEN_SEP}{digest}"


def _dead_location(spark, table: str) -> str | None:
    """The rule table's on-disk location under the session warehouse
    (local filesystems only — the adoption below is a local-warehouse
    concern; a metastore-backed deployment keeps the catalog entry
    across restarts and never needs it)."""
    import os
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    elif "://" in wh:
        return None
    return os.path.join(wh, f"{table}_dead".lower()) if wh else None


def _ensure_registered(spark, table: str) -> bool:
    """True if the rule table is queryable in THIS session. Spark's
    in-memory catalog forgets tables across driver restarts while the
    warehouse keeps their files — a restarted session must ADOPT the
    prior incarnation's rules (re-register the location), because (a)
    ignoring them would silently resurrect dead rows at the very next
    probe and (b) re-creating a managed table over the existing
    location fails with LOCATION_ALREADY_EXISTS."""
    import os
    dead_t = f"{table}_dead"
    if spark.catalog.tableExists(dead_t):
        return True
    loc = _dead_location(spark, table)
    if loc and os.path.isdir(loc):
        spark.sql(
            f"CREATE TABLE {dead_t} "
            f"(shard STRING, keep_gen STRING, seq BIGINT) "
            f"USING parquet LOCATION '{loc}'")
        return True
    return False


def batch_delivery_gen(shard_col: str, id_col: str,
                       content_col: str):
    """A ready-made ``gen_fn`` for the probe-then-grow stream
    launchers (neardup/annstream/mediadup): the caller lands one
    crawl-shard delivery per micro-batch with a constant
    ``shard_col``; the gen is :func:`make_gen`(shard,
    order-independent content digest) — deterministic across
    replays, new on a re-crawl, so a later
    ``*_index_retract(shard)`` can tombstone exactly the dead
    delivery. A batch carrying more than one shard fails by name
    (the same atomic-delivery contract as start_corpus_ingest)."""
    def fn(work: DataFrame) -> str:
        row = work.agg(
            F.count_distinct(F.col(shard_col)).alias("k"),
            F.first(shard_col).alias("shard"),
            F.bit_xor(F.xxhash64(id_col, content_col)).alias("d"),
            F.count(F.lit(1)).alias("n")).head()
        if row["k"] != 1:
            raise ValueError(
                f"batch_delivery_gen: micro-batch carries "
                f"{row['k']} distinct {shard_col!r} values — one "
                f"delivery per batch (the atomic-delivery contract)")
        return make_gen(str(row["shard"]), f"{row['d']}-{row['n']}")
    return fn


def retract(spark, table: str, shard: str, keep_gen: str = "",
            who: str = "index_retract") -> None:
    """Tombstone every generation of ``shard`` except ``keep_gen``
    (pass the NEW delivery's :func:`make_gen`, or '' to retract the
    shard entirely). The caller validates that the family's
    gen-carrying table actually has a gen column (an unversioned
    pre-r12 layout must fail by name, not accept rules that match
    nothing)."""
    if not shard:
        raise ValueError(
            f"{who}: shard must be non-empty — retracting the "
            f"unversioned '' base would tombstone the whole index")
    dead_t = f"{table}_dead"
    seq = 0
    if _ensure_registered(spark, table):
        seq = (spark.table(dead_t).agg(F.max("seq")).head()[0] or 0) + 1
    from georiva_spark.functions.frames import local_frame
    (local_frame(spark, [(shard, keep_gen, seq)],
                 "shard string, keep_gen string, seq long")
     .write.mode("append").format("parquet").saveAsTable(dead_t))
    spark.catalog.refreshTable(dead_t)


def dead_rules(spark, table: str) -> DataFrame | None:
    """Latest tombstone rule per shard from ``{table}_dead`` (None if
    the index has never retracted anything). Adopts a prior driver
    incarnation's rule files if the in-memory catalog forgot them
    (see _ensure_registered) — a restart must never resurrect dead
    rows."""
    dead_t = f"{table}_dead"
    if not _ensure_registered(spark, table):
        return None
    from pyspark.sql import Window
    w = Window.partitionBy("shard").orderBy(F.col("seq").desc())
    return (spark.table(dead_t)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(F.col("shard").alias("__dead_shard"),
                    F.col("keep_gen").alias("__keep_gen")))


def live_rows(df: DataFrame, dead: DataFrame | None) -> DataFrame:
    """Filter an index-table scan down to LIVE rows: drop rows whose
    gen belongs to a tombstoned shard and is not that shard's
    keep_gen. The rule table is broadcast (bounded by #retracted
    shards), so the anti-join never shuffles the index; unversioned
    layouts (no gen column) pass through untouched."""
    if dead is None or "gen" not in df.columns:
        return df
    shard_of = F.substring_index(F.col("gen"), GEN_SEP, 1)
    cond = ((shard_of == F.col("__dead_shard"))
            & (F.col("gen") != F.col("__keep_gen")))
    return df.join(F.broadcast(dead), cond, "left_anti")


def has_rules(spark, table: str) -> bool:
    """True if the index has pending (uncompacted) tombstone rules."""
    return _ensure_registered(spark, table)


def clear_rules(spark, table: str) -> None:
    """Drop the rule table AND its on-disk location — the compaction
    epilogue, run strictly AFTER the purged tables swapped in
    (applied-then-cleared: a crash between swap and clear leaves
    rules that match nothing). The location is removed explicitly
    because an ADOPTED rule table (post-restart, _ensure_registered)
    is external — DROP alone would strand its files, and the next
    incarnation would adopt stale rules. A no-op when the index has
    no rules: a no-retraction compaction must issue ZERO extra
    catalog statements (its crash-atomicity contract enumerates
    them — tests/test_dedup_index.py's swap failpoints)."""
    import shutil
    if not _ensure_registered(spark, table):
        return
    spark.sql(f"DROP TABLE IF EXISTS {table}_dead")
    loc = _dead_location(spark, table)
    if loc:
        shutil.rmtree(loc, ignore_errors=True)
