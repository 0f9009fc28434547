"""Corpus-refresh products on the derivation engine (r11 — the r10
verdict's item 2): the LLM-corpus side gets the SAME T2–T5 semantics
the raster products have, instead of hand-composed pipelines.

Reference analog: ``processing/invocation.py:249-266`` (event→unit
routing) and ``staging/models.py:165`` (input-hash idempotency) — here
re-expressed over the corpus chain:

    crawl shard arrives (staging_item)
      → corpus-clean unit for EXACTLY that shard (quality gate +
        shard-local exact dedup)
      → derivation.completed chains the corpus-wide products that
        consume the clean collection: datacard + token-shard manifest
      → unchanged shards SKIP on input_hash; a re-crawled shard
        invalidates transitively (the lineage walk / stale sweep),
        recomputing exactly its downstream closure.

The cross-shard NEAR-dup leg intentionally stays in the streaming
probe-then-grow MinHash index loop (streaming/neardup.py) — an index
mutation is not a pure unit transform; the engine chain covers the
deterministic per-shard and corpus-rollup recomputes.

Scale shape: a clean unit touches ONE shard (the unit of crawl
parallelism); the corpus-wide products are single units whose inputs
are the bounded list of clean items (#shards), and their transforms
are the existing scan-shaped operators (gopher gate in-row, datacard
one agg, token manifest the token_shard_bins chain). The ledger is
the engine's parquet event table — nothing corpus-sized on the
driver.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, functions as F

from georiva_spark.plans.declarations import (
    ConfigField, DerivedProductDefinition, InputRef, OutputRef,
)
from georiva_spark.plans.recipe import (
    CatalogContext, OutputItem, ProductionUnit, ResolvedInput,
)

#: the token_pipeline gate thresholds — shared with the composed
#: oracle replay (queries_ext._sql_token_pipeline prelude)
GATE = dict(min_words=30, max_words=1000, min_mean_word_len=1.0,
            max_mean_word_len=10.0, max_symbol_ratio=0.1,
            max_bullet_ratio=0.9, min_stopword_hits=1)


def corpus_product_definitions(context_len: int = 128,
                               num_shards: int = 8
                               ) -> list[DerivedProductDefinition]:
    """The declared corpus chain, incremental by construction:

        crawl-shards → corpus-clean (per shard)
                     → {corpus-shard-stats, corpus-shard-tokens}
                       (per-shard PARTIALS, O(arrived shard))
                     → {corpus-datacard, corpus-token-shards}
                       (bounded MERGES, O(#shards))

    The DAG edges are data-flow, so ``downstream_keys`` routes a
    completed clean shard to exactly its two partials and a completed
    partial to exactly its merge — a crawl event never recomputes
    over the corpus."""
    return [
        DerivedProductDefinition(
            key="corpus-clean", recipe_type="corpus_clean",
            label="Quality-gated crawl shards",
            description="Gopher gate + shard-local exact dedup",
            config_schema=(
                ConfigField("min_words", "int", GATE["min_words"]),),
            inputs=(InputRef("shard", "crawl-shards", "staging"),),
            outputs=(OutputRef("clean", "corpus-clean"),)),
        DerivedProductDefinition(
            key="corpus-shard-stats",
            recipe_type="corpus_shard_stats",
            label="Per-shard datacard partial",
            description="bounded (lang, source) partial for one "
                        "clean shard",
            inputs=(InputRef("clean", "corpus-clean", "published"),),
            outputs=(OutputRef("stats", "corpus-shard-stats"),)),
        DerivedProductDefinition(
            key="corpus-shard-tokens",
            recipe_type="corpus_shard_tokens",
            label="Per-shard token-manifest partial",
            description="generation-local BPE bin manifest for one "
                        "clean shard",
            config_schema=(
                ConfigField("context_len", "int", context_len),
                ConfigField("num_shards", "int", num_shards)),
            inputs=(InputRef("clean", "corpus-clean", "published"),),
            outputs=(OutputRef("tokens", "corpus-shard-tokens"),)),
        DerivedProductDefinition(
            key="corpus-datacard", recipe_type="corpus_datacard",
            label="Corpus datacard",
            description="merge of the per-shard stats partials",
            inputs=(InputRef("stats", "corpus-shard-stats",
                             "published"),),
            outputs=(OutputRef("card", "corpus-datacard"),)),
        DerivedProductDefinition(
            key="corpus-token-shards",
            recipe_type="corpus_token_shards",
            label="Token training-shard manifest",
            description="merge of the per-shard token partials",
            inputs=(InputRef("tokens", "corpus-shard-tokens",
                             "published"),),
            outputs=(OutputRef("shards", "corpus-token-shards"),)),
    ]


def _ntokens(col: str = "text"):
    """Whitespace token count, NULL/blank → 0 (the corpus-accounting
    convention shared with token_budget_sample and the datacard)."""
    c = F.col(col)
    return (F.when(c.isNull() | (F.length(F.trim(c)) == 0), F.lit(0))
            .otherwise(F.size(F.split(F.trim(c), r"\s+")))
            .cast("long"))


class CorpusCleanRecipe:
    """Per-shard quality gate + exact dedup (T2 unit = one crawl
    shard): the gopher battery at the token_pipeline thresholds,
    then the shard-local exact-dedup keeper (min doc_id per md5 of
    the text). Output columns = input columns (the clean shard is a
    filtered view, ready for any downstream consumer)."""

    recipe_id = "corpus_clean"
    version = "1"

    def __init__(self, source: str = "crawl-shards",
                 target: str = "corpus-clean",
                 config: dict | None = None):
        self.source, self.target = source, target
        defn = corpus_product_definitions()[0]
        self.config = defn.validate_config(config or {})

    def enumerate_units(self, ctx: CatalogContext
                        ) -> list[ProductionUnit]:
        return [{"shard": it["variable"]}
                for it in ctx.find(collection=self.source,
                                   tier="staging")]

    def candidate_units(self, trigger,
                        ctx: CatalogContext) -> list[ProductionUnit]:
        it = trigger.item
        if (trigger.kind != "staging_item" or it is None
                or it.get("collection") != self.source):
            return []
        return [{"shard": it["variable"]}]

    def resolve_inputs(self, unit: ProductionUnit,
                       ctx: CatalogContext) -> list[ResolvedInput]:
        items = [it for it in ctx.find(collection=self.source,
                                       tier="staging")
                 if it["variable"] == unit["shard"]]
        if not items:
            return [ResolvedInput(role="shard", tier="staging",
                                  item_id=None, checksum="",
                                  required=True)]
        it = items[0]
        return [ResolvedInput(role="shard", tier="staging",
                              item_id=it["item_id"],
                              checksum=it["checksum"],
                              load=ctx.loader_for(it))]

    def transform(self, spark: SparkSession, unit: ProductionUnit,
                  resolved: list[ResolvedInput]
                  ) -> tuple[OutputItem, DataFrame]:
        from georiva_spark.operators.textops import gopher_rules
        docs = resolved[0].load()
        gate = dict(GATE, min_words=self.config["min_words"])
        passing = (gopher_rules(docs, **gate)
                   .where(F.col("gopher_pass")).select("doc_id"))
        survivors = docs.join(passing, "doc_id", "left_semi")
        keep = (survivors
                .groupBy(F.md5(F.coalesce(F.col("text"), F.lit("")))
                         .alias("__h"))
                .agg(F.min("doc_id").alias("doc_id"))
                .select("doc_id"))
        clean = survivors.join(keep, "doc_id", "left_semi")
        return OutputItem(collection=self.target,
                          variable=unit["shard"], time=None), clean


def _load_union(resolved: list[ResolvedInput]) -> DataFrame:
    frames = [r.load() for r in resolved if r.load is not None]
    return functools.reduce(lambda a, b: a.unionByName(b), frames)


class _PerShardRollupBase:
    """Shared plumbing of the PER-SHARD partial products — the 100-TB
    shape: a crawl-shard event must cost O(arrived shard), never
    O(corpus), so each clean shard gets its own bounded partial
    (stats rows / token-manifest rows) and only those bounded frames
    merge downstream. Unit = one clean shard; chained on that shard's
    derivation.completed; stale exactly when ITS clean item's hash
    changes (T5 walks clean → partial → merge)."""

    source = "corpus-clean"

    def enumerate_units(self, ctx: CatalogContext
                        ) -> list[ProductionUnit]:
        return [{"shard": it["variable"]}
                for it in ctx.find(collection=self.source,
                                   tier="published")]

    def candidate_units(self, trigger,
                        ctx: CatalogContext) -> list[ProductionUnit]:
        it = trigger.item
        if (trigger.kind == "derivation.completed" and it is not None
                and it.get("collection") == self.source):
            return [{"shard": it["variable"]}]
        return []

    def resolve_inputs(self, unit: ProductionUnit,
                       ctx: CatalogContext) -> list[ResolvedInput]:
        items = [it for it in ctx.find(collection=self.source,
                                       tier="published")
                 if it["variable"] == unit["shard"]]
        if not items:
            return [ResolvedInput(role="clean", tier="published",
                                  item_id=None, checksum="",
                                  required=True)]
        it = items[0]
        return [ResolvedInput(role="clean", tier="published",
                              item_id=it["item_id"],
                              checksum=it["checksum"],
                              load=ctx.loader_for(it))]


class CorpusShardStatsRecipe(_PerShardRollupBase):
    """Per-shard datacard PARTIAL: (lang, source) → docs / whitespace
    tokens / chars for ONE clean shard — bounded output (strata of
    one shard), one map-side-combined agg over only the arrived
    data."""

    recipe_id = "corpus_shard_stats"
    version = "1"

    def __init__(self, target: str = "corpus-shard-stats"):
        self.target = target

    def transform(self, spark: SparkSession, unit: ProductionUnit,
                  resolved: list[ResolvedInput]
                  ) -> tuple[OutputItem, DataFrame]:
        clean = resolved[0].load()
        card = (clean.groupBy("lang", "source")
                .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                     F.sum(_ntokens()).cast("long").alias("n_tokens"),
                     F.sum(F.coalesce(F.length("text"), F.lit(0)))
                     .cast("long").alias("n_chars")))
        return OutputItem(collection=self.target,
                          variable=unit["shard"], time=None), card


class CorpusShardTokensRecipe(_PerShardRollupBase):
    """Per-shard token-manifest PARTIAL: the token_shard_bins chain
    (pinned BPE merges, md5 token-shard route, GENERATION-LOCAL
    greedy pack — the same packing contract as
    export_token_shards_delta: a crawl shard packs within itself, so
    its manifest is computable from only the arrived data and never
    changes when other crawl shards arrive) aggregated per md5
    token-shard → bounded (shard, n_bins, n_docs, n_tokens) rows."""

    recipe_id = "corpus_shard_tokens"
    version = "1"

    def __init__(self, merges: list[tuple[str, str]],
                 target: str = "corpus-shard-tokens",
                 config: dict | None = None):
        self.merges = [tuple(m) for m in merges]
        self.target = target
        defn = next(d for d in corpus_product_definitions()
                    if d.key == "corpus-shard-tokens")
        self.config = defn.validate_config(config or {})

    def transform(self, spark: SparkSession, unit: ProductionUnit,
                  resolved: list[ResolvedInput]
                  ) -> tuple[OutputItem, DataFrame]:
        from georiva_spark.operators.textops import token_shard_pointer
        clean = resolved[0].load()
        # counts only — the pack-pointer table fully determines them
        # (r13 optimization: the token_shard_bins path additionally
        # derived a per-unit vocab — an EXTRA eager distinct-words
        # scan + collect per crawl shard — and shuffled materialized
        # token-id arrays; per-bin n_docs/n_tokens are the size/sum
        # of the pointer rows, so the manifest never needs either).
        # Null-doc_id rows pack (they consume bin space in the bins
        # path too) but never aggregate — the bins path drops them at
        # its doc_id join, so the counts stay bit-identical.
        pointer = token_shard_pointer(
            clean, self.merges,
            context_len=self.config["context_len"],
            num_shards=self.config["num_shards"])
        per_bin = (pointer.where(F.col("doc_id").isNotNull())
                   .groupBy("shard", "bin_id")
                   .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                        F.sum("n_tok").cast("long")
                        .alias("n_tokens")))
        manifest = (per_bin.groupBy("shard")
                    .agg(F.count(F.lit(1)).cast("long")
                         .alias("n_bins"),
                         F.sum("n_docs").cast("long").alias("n_docs"),
                         F.sum("n_tokens").cast("long")
                         .alias("n_tokens")))
        return OutputItem(collection=self.target,
                          variable=unit["shard"], time=None), manifest


class _MergeRollupBase:
    """Shared plumbing of the corpus-wide MERGE products: ONE unit
    whose inputs are every per-shard partial (the input hash is over
    the bounded partial-item checksums, so ANY changed shard makes
    the merge stale — T5 — while an unchanged corpus skips — T3).
    The merge aggregates BOUNDED frames (#shards × strata rows), so
    the corpus-wide refresh costs O(#shards), never O(corpus)."""

    source: str

    def enumerate_units(self, ctx: CatalogContext
                        ) -> list[ProductionUnit]:
        return [{"scope": "corpus"}]

    def candidate_units(self, trigger,
                        ctx: CatalogContext) -> list[ProductionUnit]:
        it = trigger.item
        if (trigger.kind == "derivation.completed" and it is not None
                and it.get("collection") == self.source):
            return [{"scope": "corpus"}]
        return []

    def resolve_inputs(self, unit: ProductionUnit,
                       ctx: CatalogContext) -> list[ResolvedInput]:
        items = sorted(ctx.find(collection=self.source,
                                tier="published"),
                       key=lambda it: str(it["variable"]))
        if not items:
            return [ResolvedInput(role="partial", tier="published",
                                  item_id=None, checksum="",
                                  required=True)]
        return [ResolvedInput(role="partial", tier="published",
                              item_id=it["item_id"],
                              checksum=it["checksum"],
                              load=ctx.loader_for(it))
                for it in items]


class CorpusDatacardRecipe(_MergeRollupBase):
    """Corpus datacard MERGE: sum the per-shard partials by
    (lang, source) — sums decompose, so the merged card is
    bit-identical to a from-scratch corpus datacard (oracle-proven)
    while each refresh touches only bounded partial frames."""

    recipe_id = "corpus_datacard"
    version = "1"
    source = "corpus-shard-stats"

    def __init__(self, target: str = "corpus-datacard"):
        self.target = target

    def transform(self, spark: SparkSession, unit: ProductionUnit,
                  resolved: list[ResolvedInput]
                  ) -> tuple[OutputItem, DataFrame]:
        parts = _load_union(resolved)
        card = (parts.groupBy("lang", "source")
                .agg(F.sum("n_docs").cast("long").alias("n_docs"),
                     F.sum("n_tokens").cast("long").alias("n_tokens"),
                     F.sum("n_chars").cast("long").alias("n_chars")))
        return OutputItem(collection=self.target, variable="datacard",
                          time=None), card


class CorpusTokenShardsRecipe(_MergeRollupBase):
    """Token training-shard manifest MERGE: sum the per-crawl-shard
    partials by md5 token-shard. n_docs/n_tokens equal any packing;
    n_bins is the GENERATION-LOCAL pack count (the delta-export
    contract — crawl shards pack within themselves), which is what a
    loader consuming an incrementally-grown layout actually sees."""

    recipe_id = "corpus_token_shards"
    version = "1"
    source = "corpus-shard-tokens"

    def __init__(self, target: str = "corpus-token-shards"):
        self.target = target

    def transform(self, spark: SparkSession, unit: ProductionUnit,
                  resolved: list[ResolvedInput]
                  ) -> tuple[OutputItem, DataFrame]:
        parts = _load_union(resolved)
        manifest = (parts.groupBy("shard")
                    .agg(F.sum("n_bins").cast("long").alias("n_bins"),
                         F.sum("n_docs").cast("long").alias("n_docs"),
                         F.sum("n_tokens").cast("long")
                         .alias("n_tokens")))
        return OutputItem(collection=self.target, variable="manifest",
                          time=None), manifest
