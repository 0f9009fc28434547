"""Generation + doc tombstones — ONE implementation of T5-style
retraction for every persistent index family (r12, extended r13):
MinHash text bands (operators/dedup.py), Hamming media membership
(dedup.py), IVF float and IVF-PQ embedding cells
(operators/similarity.py).

Two granularities, one shape:

- **Shard rules** (r12, ``{table}_dead``): index rows appended from
  one delivery of one crawl shard carry a GENERATION tag
  (``make_gen(shard, digest)`` — deterministic of (shard, content),
  so a replayed delivery re-mints the same tag while a re-crawl mints
  a new one). Retracting a re-crawled shard appends ONE rule row
  (shard, keep_gen, seq); the LATEST rule per shard wins (append-only
  — no overwrite window for concurrent probes to read an empty rule
  set).
- **Doc rules** (r13, ``{table}_dead_docs``): a TAKEDOWN /
  right-to-be-forgotten request names specific item ids, not a crawl
  shard — re-crawling the whole shard without the docs would be the
  only r12 path. ``retract_docs`` appends the bounded id list
  (id, seq); rules accumulate (there is no "latest wins" — a
  takedown has no keep side). Works on ANY layout, including
  unversioned pre-r12 indexes (the filter keys on the id column, not
  the gen).

Probes filter live rows via BROADCAST anti-joins of the bounded rule
tables (plans as BroadcastHashJoin LeftAnti, plan-asserted in
tests/test_plan_evidence.py), so retraction is O(1) at event time and
never rewrites or reshuffles the index. Each family's compaction
removes dead rows PHYSICALLY and clears the rules AFTER its table
swaps — a crash between leaves rules that match nothing (idempotently
re-appliable), never a window where dead rows are live again.
Re-admission semantics: once compaction purges a doc rule, a LATER
append may re-introduce the id — new content is a new ingestion
decision; a standing legal hold belongs upstream of the crawler.

Single-writer: retracts and compactions are the stream's to sequence
(the same contract as appends). r13 makes a violation OBSERVABLE:
compactions call :func:`validate_single_writer` first, which fails by
name when two rules for one shard share a seq ("latest rule per
shard" would be ambiguous — two concurrent retracters read-then-
appended the same max(seq)+1).

Fail-by-name adoption (r13): every retract stamps
``georiva.has_tombstones`` / ``georiva.has_doc_tombstones`` on the
family's stamped index table. A restarted driver whose in-memory
catalog forgot the rule table ADOPTS its warehouse files
(:func:`_ensure_registered`); on a warehouse where adoption is
impossible (non-``file:`` scheme + no metastore) the stamp makes the
next probe RAISE instead of silently resurrecting dead rows.

Reference analog: ``processing/invocation.py:210-247`` — staleness
is transitive to *everything* derived, including index rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: separator between the shard name and the content digest inside a
#: generation tag — unprintable so it can never occur in a shard
#: name, making shard extraction from a gen unambiguous
GEN_SEP = "\x1f"

#: rule-table suffix -> (DDL, stamp TBLPROPERTY set at retract time)
_RULE_KINDS = {
    "_dead": ("shard STRING, keep_gen STRING, seq BIGINT",
              "georiva.has_tombstones"),
    "_dead_docs": ("id BIGINT, seq BIGINT",
                   "georiva.has_doc_tombstones"),
}


def make_gen(shard: str, digest: str) -> str:
    """Generation tag for index rows appended from one delivery of
    one crawl shard: ``shard + GEN_SEP + digest``."""
    if not shard:
        raise ValueError("make_gen: shard must be non-empty")
    if GEN_SEP in shard:
        raise ValueError("make_gen: shard contains the GEN_SEP "
                         "sentinel byte")
    return f"{shard}{GEN_SEP}{digest}"


def _dead_location(spark, table: str,
                   suffix: str = "_dead") -> str | None:
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
    return os.path.join(wh, f"{table}{suffix}".lower()) if wh else None


def _ensure_registered(spark, table: str,
                       suffix: str = "_dead") -> bool:
    """True if the rule table is queryable in THIS session. Spark's
    in-memory catalog forgets tables across driver restarts while the
    warehouse keeps their files — a restarted session must ADOPT the
    prior incarnation's rules (re-register the location), because (a)
    ignoring them would silently resurrect dead rows at the very next
    probe and (b) re-creating a managed table over the existing
    location fails with LOCATION_ALREADY_EXISTS."""
    import os
    rule_t = f"{table}{suffix}"
    if spark.catalog.tableExists(rule_t):
        return True
    loc = _dead_location(spark, table, suffix)
    if loc and os.path.isdir(loc):
        spark.sql(
            f"CREATE TABLE {rule_t} ({_RULE_KINDS[suffix][0]}) "
            f"USING parquet LOCATION '{loc}'")
        return True
    return False


def _stamp(spark, stamp_table: str | None, prop: str,
           seq: int) -> None:
    """Record on the family's stamped index table that tombstone
    rules EXIST (the r13 fail-by-name adoption tripwire — see
    :func:`_require_adoptable`)."""
    if stamp_table:
        spark.sql(f"ALTER TABLE {stamp_table} SET TBLPROPERTIES "
                  f"('{prop}'='{seq}')")


def _require_adoptable(spark, table: str, suffix: str,
                       stamp_table: str | None) -> None:
    """The rule table is neither registered nor adoptable — fine iff
    nothing was ever retracted. The stamp on the index table is the
    witness: if it says rules exist, a restarted driver on a
    warehouse where adoption is impossible (non-``file:`` scheme, no
    metastore) must FAIL BY NAME here instead of silently resurrecting
    dead rows at this very probe."""
    if not stamp_table or not spark.catalog.tableExists(stamp_table):
        return
    prop = _RULE_KINDS[suffix][1]
    try:
        props = {r.key: r.value for r in
                 spark.sql(f"SHOW TBLPROPERTIES {stamp_table}")
                 .collect()}
    except Exception:
        # temp-view controls carry no properties (and cannot have
        # been stamped by a retract) — nothing to witness
        return
    if props.get(prop):
        raise ValueError(
            f"index {table!r} is stamped {prop}={props[prop]} but its "
            f"{table}{suffix} rule table is neither registered in "
            f"this session's catalog nor adoptable from the "
            f"warehouse ({spark.conf.get('spark.sql.warehouse.dir', '')!r})"
            f" — probing now would silently resurrect retracted rows."
            f" Re-register the rule table (metastore deployments keep"
            f" it automatically), or compact the index from a session"
            f" that still holds the rules. See SCALE.md §Tombstones.")


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
    (the same atomic-delivery contract as start_corpus_ingest);
    launchers that opt into multi-shard batches split the batch per
    shard FIRST (``split_by_shard``) and call this on each slice."""
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
            who: str = "index_retract",
            stamp_table: str | None = None) -> None:
    """Tombstone every generation of ``shard`` except ``keep_gen``
    (pass the NEW delivery's :func:`make_gen`, or '' to retract the
    shard entirely). The caller validates that the family's
    gen-carrying table actually has a gen column (an unversioned
    pre-r12 layout must fail by name, not accept rules that match
    nothing). ``stamp_table`` (r13): the family's stamped index
    table, marked ``georiva.has_tombstones`` so a later session that
    cannot adopt the rule table fails by name instead of resurrecting
    dead rows."""
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
    _stamp(spark, stamp_table, "georiva.has_tombstones", seq)


def retract_docs(spark, table: str, ids, who: str = "retract_docs",
                 stamp_table: str | None = None) -> None:
    """Takedown (r13): tombstone SPECIFIC item ids out of a
    persistent index — the doc-grained retraction a production corpus
    pipeline needs monthly (legal takedown, right-to-be-forgotten)
    where re-crawling the whole shard without the docs would be the
    only shard-rule path. ``ids`` is the bounded id list of the
    request (a human/legal artifact — never corpus-proportional).
    Appends (id, seq) rows to ``{table}_dead_docs``; probes apply a
    second broadcast anti-join (:func:`live_doc_rows`); compaction
    purges physically and clears the rules. Unlike shard rules there
    is no keep side and rules ACCUMULATE; duplicate ids across
    requests are harmless (anti-join is idempotent)."""
    ids = sorted({int(i) for i in ids})
    if not ids:
        raise ValueError(f"{who}: the takedown id list is empty")
    dead_t = f"{table}_dead_docs"
    seq = 0
    if _ensure_registered(spark, table, "_dead_docs"):
        seq = (spark.table(dead_t).agg(F.max("seq")).head()[0] or 0) + 1
    from georiva_spark.functions.frames import local_frame
    (local_frame(spark, [(i, seq) for i in ids], "id long, seq long")
     .write.mode("append").format("parquet").saveAsTable(dead_t))
    spark.catalog.refreshTable(dead_t)
    _stamp(spark, stamp_table, "georiva.has_doc_tombstones", seq)


def dead_rules(spark, table: str,
               stamp_table: str | None = None) -> DataFrame | None:
    """Latest tombstone rule per shard from ``{table}_dead`` (None if
    the index has never retracted anything). Adopts a prior driver
    incarnation's rule files if the in-memory catalog forgot them
    (see _ensure_registered) — a restart must never resurrect dead
    rows; when adoption is impossible but the index is stamped, fails
    by name (r13)."""
    dead_t = f"{table}_dead"
    if not _ensure_registered(spark, table):
        _require_adoptable(spark, table, "_dead", stamp_table)
        return None
    from pyspark.sql import Window
    w = Window.partitionBy("shard").orderBy(F.col("seq").desc())
    return (spark.table(dead_t)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(F.col("shard").alias("__dead_shard"),
                    F.col("keep_gen").alias("__keep_gen")))


def dead_doc_rules(spark, table: str,
                   stamp_table: str | None = None) -> DataFrame | None:
    """Distinct taken-down ids from ``{table}_dead_docs`` (None if no
    takedown is pending) — same adoption + fail-by-name contract as
    :func:`dead_rules`."""
    if not _ensure_registered(spark, table, "_dead_docs"):
        _require_adoptable(spark, table, "_dead_docs", stamp_table)
        return None
    return (spark.table(f"{table}_dead_docs")
            .select(F.col("id").alias("__dead_id")).distinct())


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


def live_doc_rows(df: DataFrame, dead_docs: DataFrame | None,
                  id_col: str) -> DataFrame:
    """Filter an index-table scan down to rows whose ``id_col`` is
    not taken down (r13) — the doc-grained sibling of
    :func:`live_rows`, same broadcast anti-join shape (the rule table
    is bounded by the takedown request sizes). Frames without the id
    column (e.g. the Hamming distinct-code band table, where
    retraction works at the membership layer) pass through."""
    if dead_docs is None or id_col not in df.columns:
        return df
    return df.join(F.broadcast(dead_docs),
                   F.col(id_col) == F.col("__dead_id"), "left_anti")


def validate_single_writer(spark, table: str) -> None:
    """Make the single-writer rule-table contract OBSERVABLE (r13):
    ``retract`` derives seq via read-then-append, so two CONCURRENT
    retracters can mint the same seq — after which "latest rule per
    shard" is ambiguous (row_number over a tied seq picks an
    arbitrary winner). Compactions call this before purging: a
    duplicate (shard, seq) fails by name instead of physically
    deleting rows chosen by an ambiguous rule."""
    if _ensure_registered(spark, table):
        dup = (spark.table(f"{table}_dead")
               .groupBy("shard", "seq")
               .agg(F.count(F.lit(1)).alias("n"))
               .where(F.col("n") > 1).limit(1).collect())
        if dup:
            r = dup[0]
            raise ValueError(
                f"{table}_dead holds {r['n']} rules for shard "
                f"{r['shard']!r} at seq {r['seq']} — two writers "
                f"retracted concurrently and 'latest rule per shard' "
                f"is ambiguous; the single-writer contract (retracts "
                f"are the stream's to sequence, like appends) was "
                f"violated. Resolve manually before compacting.")


def has_rules(spark, table: str) -> bool:
    """True if the index has pending (uncompacted) tombstone rules —
    shard-grained or doc-grained."""
    return (_ensure_registered(spark, table)
            or _ensure_registered(spark, table, "_dead_docs"))


def clear_rules(spark, table: str,
                stamp_table: str | None = None) -> None:
    """Drop BOTH rule tables AND their on-disk locations — the
    compaction epilogue, run strictly AFTER the purged tables swapped
    in (applied-then-cleared: a crash between swap and clear leaves
    rules that match nothing). The locations are removed explicitly
    because an ADOPTED rule table (post-restart, _ensure_registered)
    is external — DROP alone would strand its files, and the next
    incarnation would adopt stale rules. The has-tombstones stamps
    unset FIRST (before the drops): a crash between unset and drop
    leaves live rules still registered (safe); the reverse order
    would leave a stamp pointing at nothing, tripping the r13
    fail-by-name adoption check on an intact index. A no-op when the
    index has no rules: a no-retraction compaction must issue ZERO
    extra catalog statements (its crash-atomicity contract enumerates
    them — tests/test_dedup_index.py's swap failpoints)."""
    import shutil
    pending = [s for s in _RULE_KINDS
               if _ensure_registered(spark, table, s)]
    if not pending:
        return
    if stamp_table and spark.catalog.tableExists(stamp_table):
        props = ", ".join(f"'{_RULE_KINDS[s][1]}'" for s in pending)
        spark.sql(f"ALTER TABLE {stamp_table} UNSET TBLPROPERTIES "
                  f"IF EXISTS ({props})")
    for s in pending:
        spark.sql(f"DROP TABLE IF EXISTS {table}{s}")
        loc = _dead_location(spark, table, s)
        if loc:
            shutil.rmtree(loc, ignore_errors=True)
