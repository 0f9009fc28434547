"""Parquet table loading for the driver testdata star schema.

At 100 TB these reads stay scan-efficient because every query in the engine
goes through ``select``/``filter`` first — Catalyst pushes predicates and
prunes columns into the parquet scan (verify with .explain: PushedFilters /
ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from georiva_spark.schemas import TPCH_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which the Spark parquet
        # reader rejects; read nanos as long and convert to a microsecond
        # timestamp (DuckDB's native resolution, so oracle values agree).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        if dict(df.dtypes).get("ts") == "bigint":
            # integer div, not double: ns-since-epoch exceeds double's 53-bit
            # mantissa; DuckDB likewise truncates ns → µs.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TPCH_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def write_jsonl_corpus(docs: DataFrame, path: str,
                       compression: str = "gzip") -> None:
    """Materialize a documents table as JSONL (one JSON object per
    line, gzip by default) — the interchange format crawl-processing
    pipelines exchange shards in. Spark's native JSON sink: splittable
    listing, one file per partition, no driver involvement."""
    docs.write.mode("overwrite").option("compression", compression) \
        .json(path)


def export_shards(df: DataFrame, path: str, n_shards: int,
                  key_col: str = "doc_id", fmt: str = "parquet",
                  salt: str = "shuffle") -> DataFrame:
    """Materialize a corpus as TRAINING SHARDS — the last step before
    the training loader: route every row through
    :func:`~georiva_spark.operators.sampling.shuffle_shards`
    (deterministic md5 permutation), then write ONE file per shard
    under ``{path}/shard=N``, rows in pos order — so a loader reading
    shard directories 0..N-1 sequentially replays the exact
    pseudorandom permutation, restartably, on any cluster size.

    Layout mechanics: ``repartition(n_shards, shard)`` makes the task
    the shard (a hash collision putting two shards in one task still
    writes them to separate ``shard=`` directories — each remains one
    file), ``sortWithinPartitions(shard, pos)`` orders rows inside the
    file, and ``partitionBy(shard)`` names the directories. Returns
    the MANIFEST (shard, n_rows, min_pos, max_pos) — the loader's
    bounded table of record counts, derivable (and oracle-checked)
    straight from the shuffle definition. ``fmt='json'`` writes
    gzip JSONL shards (the crawl interchange layout) instead."""
    from georiva_spark.operators.sampling import shuffle_shards

    sharded = shuffle_shards(df, n_shards, key_col=key_col, salt=salt)
    w = (sharded.repartition(n_shards, F.col("shard"))
         .sortWithinPartitions("shard", "pos")
         .write.mode("overwrite").partitionBy("shard"))
    if fmt == "json":
        w.option("compression", "gzip").json(path)
    elif fmt == "parquet":
        w.parquet(path)
    else:
        raise ValueError(f"export_shards: fmt={fmt!r} not in "
                         f"('parquet', 'json')")
    return (sharded.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("pos").alias("min_pos"),
                 F.max("pos").alias("max_pos"))
            .orderBy("shard"))


def export_token_shards(docs: DataFrame, path: str,
                        merges: list[tuple[str, str]],
                        context_len: int = 2048,
                        num_shards: int = 64,
                        text_col: str = "text") -> DataFrame:
    """Materialize a corpus as TOKEN-ID TRAINING SHARDS — the final
    loader handoff (r10, the r9 verdict's top item): where
    :func:`export_shards` ships text rows, this ships what a
    Megatron/GPT-style training loader actually mmaps — fixed-context
    token-id array rows (:func:`~georiva_spark.operators.textops.
    token_shard_bins`: BPE ids, greedy-packed, doc boundaries as
    offsets, right-padded with ``pad_id = |vocab|``), ONE file per
    ``shard=N`` directory with bins in bin_id order, so a loader
    reading shard dirs 0..N-1 sequentially streams deterministic
    fixed-length training examples, restartably, on any cluster size.

    Layout mechanics are export_shards': ``repartition(num_shards,
    shard)`` makes the task the shard, ``sortWithinPartitions(shard,
    bin_id)`` orders bins inside the file, ``partitionBy(shard)``
    names the directories. Returns the extended MANIFEST
    (shard, n_bins, n_docs, n_tokens, context_len, pad_id) — the
    loader's bounded sizing table, derived from the same bin
    definition (and oracle-checked as the ``token_shards`` query)."""
    from georiva_spark.operators.textops import (bpe_token_vocab,
                                                 token_shard_bins)

    vocab = bpe_token_vocab(docs, merges, text_col=text_col)
    bins = token_shard_bins(docs, merges, context_len=context_len,
                            num_shards=num_shards, text_col=text_col,
                            vocab=vocab)
    (bins.repartition(num_shards, F.col("shard"))
     .sortWithinPartitions("shard", "bin_id")
     .write.mode("overwrite").partitionBy("shard").parquet(path))
    pad_id = len(vocab)
    return (bins.groupBy("shard")
            .agg(F.count(F.lit(1)).cast("long").alias("n_bins"),
                 F.sum("n_docs").cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("n_tokens"))
            .withColumn("context_len",
                        F.lit(context_len).cast("int"))
            .withColumn("pad_id", F.lit(pad_id).cast("int"))
            .orderBy("shard"))


def read_token_shards(spark: SparkSession, path: str,
                      shard: int | None = None) -> DataFrame:
    """Read a :func:`export_token_shards` layout back in LOADER ORDER
    — (shard asc, bin_id asc), the exact stream a trainer consumes.
    With ``shard=`` only that shard directory is read (partition
    pruning at file-listing time — the per-worker loader shape: rank
    k of W workers reads shards k, k+W, …, each a single pruned
    directory scan). The sort is per-shard metadata-cheap: files are
    already written in bin order, so Spark's sort sees presorted
    runs; a non-Spark loader can skip it entirely and mmap the one
    file per directory sequentially."""
    df = (spark.read.option("basePath", path)
          .parquet(f"{path}/shard=*"))
    if shard is not None:
        df = df.where(F.col("shard") == shard)
    return df.orderBy("shard", "bin_id")


def read_jsonl_corpus(spark: SparkSession, path: str,
                      schema: str = ("doc_id long, text string, "
                                     "lang string, source string, "
                                     "n_chars long")) -> DataFrame:
    """Scan a JSONL/JSONL.gz corpus with an ENFORCED schema (never
    inferSchema — a schema-inference pass re-reads the whole corpus at
    plan time, and drifting shard schemas must fail loudly, not union
    silently). FAILFAST: a malformed line is a named parse error, not
    a silent null row. Spark's JSON source is splittable for plain
    files; .gz shards parallelize at file granularity — exactly the
    crawl-shard layout."""
    return (spark.read.schema(schema).option("mode", "FAILFAST")
            .json(path))
