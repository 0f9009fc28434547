"""r11 scale smoke: corpus products, delta token-shard export, and the
in-plan 10k-strata samplers — three claims, one synthetic 2M-doc corpus
(the scale_smoke_llm template shape, generated in-flight).

1. STREAMED corpus-products: two crawl shards (1M docs each) land as
   two micro-batches; start_corpus_ingest drives the derivation-engine
   chain (clean unit per shard → chained datacard + token-shard
   manifest) per batch. Then the SAME shard file re-lands: the replay
   must SKIP every unit on input_hash (T3) in seconds, not recompute.
2. DELTA token-shard export: full export of 2M docs, then a 200k-doc
   delta appended under the pinned tokenizer — old files untouched
   ((name, size, mtime) snapshot), totals conserved, and the delta
   costs ~delta/corpus of the full rewrite.
3. 10k-strata samplers through the r11 in-plan paths: source_mix with
   a 10k-weight recipe and quality_threshold per-domain — both plans
   broadcast-join bounded threshold frames (no 10k-arm CASE chain, no
   driver collect at composition).

Usage: python tools/scale_smoke_corpus_products.py [n_docs]
Prints one timing line per stage; writes only under temp dirs.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from georiva_spark.session import get_spark

L = 50          # tokens per doc
V = 50_000      # vocabulary size
T = 5           # docs per template
LANGS = ("en", "de", "fr", "es", "zh")
MERGES = [("t", "e"), ("te", "m"), ("p", "l"), ("d", "o"), ("do", "c")]


def corpus(spark, n: int, id_offset: int = 0):
    """The scale_smoke_llm synthetic corpus: 5-doc templates, ~50
    tokens each; id_offset generates a disjoint delta batch."""
    base = F.col("id") + F.lit(id_offset)
    tmpl = (base / T).cast("long")
    m = base % T
    mutpos = F.pmod(F.xxhash64(base, F.lit(7)), F.lit(L))
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(L - 1)),
        lambda i: F.concat(F.lit("w"), F.pmod(
            F.when((m >= 2) & (i == mutpos), F.xxhash64(base, i))
            .otherwise(F.xxhash64(tmpl, i)), F.lit(V)).cast("string")))
    # lead with a stopword so the gopher gate's stopword rule has
    # evidence (the template tokens are synthetic w<N> words)
    text = F.concat(F.lit("the "), F.array_join(toks, " "))
    return spark.range(n).select(
        base.alias("doc_id"), text.alias("text"),
        F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                     (tmpl % len(LANGS) + 1).cast("int")).alias("lang"),
        F.concat(F.lit("src"), (tmpl % 20).cast("string"))
        .alias("source"))


def smoke_streamed_products(spark, n: int, base: str) -> None:
    from georiva_spark.plans.engine import DerivationEngine
    from georiva_spark.plans.recipe import (CatalogContext,
                                            RecipeRegistry)
    from georiva_spark.plans.recipes.corpus import (
        CorpusCleanRecipe, CorpusDatacardRecipe,
        CorpusShardStatsRecipe, CorpusShardTokensRecipe,
        CorpusTokenShardsRecipe, corpus_product_definitions,
    )
    from georiva_spark.streaming.ingest import start_corpus_ingest

    land = os.path.join(base, "land")
    corp = os.path.join(base, "corpus")
    out = os.path.join(base, "out")
    ck = os.path.join(base, "ck")
    os.makedirs(land)

    def land_file(name, df):
        # flat files in the landing dir (the file source does not
        # recurse into non-partition subdirectories)
        tmp = os.path.join(base, f"stage_{name}")
        df.coalesce(8).write.mode("overwrite").parquet(tmp)
        for i, f in enumerate(sorted(os.listdir(tmp))):
            if f.endswith(".parquet"):
                os.replace(os.path.join(tmp, f),
                           os.path.join(land, f"{name}-{i}.parquet"))

    half = n // 2
    s0 = corpus(spark, half).withColumn("shard", F.lit("s0"))
    s1 = corpus(spark, half, id_offset=half) \
        .withColumn("shard", F.lit("s1"))
    land_file("f0", s0)

    def loader(it):
        if it["collection"] == "crawl-shards":
            return (spark.read.parquet(corp)
                    .where(F.col("shard") == it["variable"])
                    .drop("shard"))
        return spark.read.parquet(
            os.path.join(out, f"unit={it['unit_hash']}"))

    ctx = CatalogContext(spark, [], grid_loader=loader)
    reg = RecipeRegistry()
    reg.register(CorpusCleanRecipe(config={"min_words": 5}))
    reg.register(CorpusShardStatsRecipe())
    reg.register(CorpusShardTokensRecipe(
        MERGES, config={"context_len": 512, "num_shards": 64}))
    reg.register(CorpusDatacardRecipe())
    reg.register(CorpusTokenShardsRecipe())
    eng = DerivationEngine(
        spark, reg, ctx, output_dir=out,
        definitions=corpus_product_definitions(512, 64))

    lay = os.path.join(base, "layout")

    def run_stream():
        q = start_corpus_ingest(
            spark, land, corp, ck, eng, max_files_per_trigger=64,
            available_now=True, token_layout=lay, merges=MERGES,
            context_len=512, num_shards=64,
            token_alphabet="abcdefghijklmnopqrstuvwxyz0123456789w ")
        q.awaitTermination()

    t0 = time.perf_counter()
    run_stream()                       # batch 0: shard s0
    b0 = time.perf_counter() - t0
    land_file("f1", s1)
    t0 = time.perf_counter()
    run_stream()                       # batch 1: shard s1 arrives
    b1 = time.perf_counter() - t0
    card = {(r.lang, r.source): r.n_docs for r in loader(
        next(i for i in eng.catalog.items
             if i["collection"] == "corpus-datacard")).collect()}
    man = loader(next(i for i in eng.catalog.items
                      if i["collection"] == "corpus-token-shards"))
    tot = man.agg(F.sum("n_docs"), F.sum("n_tokens")).head()
    def lay_snap():
        out_ = {}
        for d in os.listdir(lay):
            if d.startswith("shard="):
                for f in os.listdir(os.path.join(lay, d)):
                    st = os.stat(os.path.join(lay, d, f))
                    out_[f"{d}/{f}"] = (st.st_size, st.st_mtime_ns)
        return out_

    snap = lay_snap()
    print(f"corpus-products stream, 2 micro-batches of {half/1e6:.1f}M"
          f" docs: batch0 {b0:.1f}s, batch1 {b1:.1f}s (incl. the "
          f"physical token-layout growth) -> datacard {len(card)} "
          f"strata, token manifest {man.count()} shards, "
          f"{tot[0]/1e6:.2f}M docs / {tot[1]/1e6:.0f}M tokens; "
          f"layout files: {len(snap)}")
    # replay: identical shard content re-lands; every unit must skip
    land_file("f2", s1)
    n_units = len(eng.runs)
    t0 = time.perf_counter()
    run_stream()
    rp = time.perf_counter() - t0
    clean1 = next(r for r in eng.runs.values()
                  if r.recipe_id == "corpus_clean"
                  and '"s1"' in r.unit_key)
    assert clean1.status == "skipped" and len(eng.runs) == n_units
    assert lay_snap() == snap        # layout data files byte-untouched
    print(f"replay of an identical 1M-doc shard: {rp:.1f}s, "
          f"all units skipped on input_hash, layout generation "
          f"no-op ({len(snap)} data files untouched)")


def smoke_delta_export(spark, n: int, base: str) -> None:
    from georiva_spark.sources.tables import (export_token_shards,
                                              export_token_shards_delta)
    path = os.path.join(base, "tok")
    docs = corpus(spark, n)
    t0 = time.perf_counter()
    man = export_token_shards(docs, path, MERGES, context_len=512,
                              num_shards=256).collect()
    full = time.perf_counter() - t0
    tok_full = sum(r.n_tokens for r in man)
    snap = {}
    for d in os.listdir(path):
        if d.startswith("shard="):
            for f in os.listdir(os.path.join(path, d)):
                p = os.path.join(path, d, f)
                st = os.stat(p)
                snap[p] = (st.st_size, st.st_mtime_ns)
    delta_n = n // 10
    delta = corpus(spark, delta_n, id_offset=n)
    t0 = time.perf_counter()
    man2 = export_token_shards_delta(delta, path, MERGES).collect()
    dt_ = time.perf_counter() - t0
    for p, sig in snap.items():
        st = os.stat(p)
        assert (st.st_size, st.st_mtime_ns) == sig, p
    assert sum(r.n_docs for r in man2) == n + delta_n
    print(f"export_token_shards FULL {n/1e6:.0f}M docs: {full:.1f}s "
          f"({tok_full/1e6:.0f}M ids); DELTA {delta_n/1e3:.0f}k docs "
          f"appended: {dt_:.1f}s ({dt_/full:.2f}x of full) — "
          f"{len(snap)} pre-existing files byte-untouched, manifest "
          f"totals conserved")


def smoke_10k_strata_samplers(spark, n: int) -> None:
    from georiva_spark.operators import sampling
    docs = corpus(spark, n).withColumn(
        "domain", F.concat(F.lit("d"),
                           F.pmod(F.xxhash64("doc_id"), F.lit(10_000))
                           .cast("string")))
    weights = {f"d{i}": (1_000_000 // 10_000) for i in range(10_000)}
    t0 = time.perf_counter()
    out = sampling.source_mix(docs, weights, budget_ppm=300_000,
                              strata_col="domain")
    phys = (out._jdf.queryExecution().toString()
            .split("== Physical Plan ==")[-1])
    assert "BroadcastHashJoin" in phys
    nk = out.count()
    el = time.perf_counter() - t0
    print(f"source_mix 10k-domain recipe over {n/1e6:.0f}M docs: "
          f"{el:.1f}s ({n/el/1e6:.2f}M docs/s) -> {nk} kept "
          f"(~{nk/n:.3f} of corpus; broadcast-joined thresholds, "
          f"no CASE chain, no driver collect)")
    t0 = time.perf_counter()
    qt = sampling.quality_threshold(
        docs.withColumn("score",
                        F.pmod(F.xxhash64("doc_id", F.lit(3)),
                               F.lit(1000)).cast("double")),
        "score", keep_ppm=100_000, strata_col="domain", bins=1000,
        score_min=0.0, score_max=1000.0)
    nq = qt.count()
    el = time.perf_counter() - t0
    print(f"quality_threshold top-10% per 10k domains: {el:.1f}s "
          f"({n/el/1e6:.2f}M docs/s) -> {nq} kept (single in-plan "
          f"path, bounded histogram windows)")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("scale-smoke-corpus-products")
    base = tempfile.mkdtemp(prefix="corpus_products_smoke_")
    try:
        # clearCache between stages: stage 1's streamed micro-batches
        # leave persisted work/signature frames in the block manager
        # (persist_bounded slots of cloned foreachBatch sessions),
        # and the residue can push a later stage's broadcast build
        # over the 16g driver heap (observed: stage-2 full export
        # broadcast OOM only when run after stage 1)
        smoke_streamed_products(spark, n, base)
        spark.catalog.clearCache()
        smoke_delta_export(spark, n, base)
        spark.catalog.clearCache()
        smoke_10k_strata_samplers(spark, n)
        spark.catalog.clearCache()
        smoke_streamed_recrawl(spark, n, base)
    finally:
        shutil.rmtree(base, ignore_errors=True)




def smoke_streamed_recrawl(spark, n: int, base: str) -> None:
    """r12 (the r11 verdict's item 7): a RE-CRAWLED shard end-to-end
    through the streamed path — the engine recomputes exactly the
    shard's closure (T5), the persistent near-dup MinHash index
    RETRACTS the dead signatures (probes stop matching content that
    no longer exists), the replay guard still holds, and the
    datacard converges to a from-scratch build of the corpus as it
    now stands. Shards are n//8 docs; the near-dup leg runs the real
    signature kernel per batch."""
    from georiva_spark.functions.frames import local_frame
    from georiva_spark.operators import dedup
    from georiva_spark.plans.engine import DerivationEngine
    from georiva_spark.plans.recipe import (CatalogContext,
                                            RecipeRegistry)
    from georiva_spark.plans.recipes.corpus import (
        CorpusCleanRecipe, CorpusDatacardRecipe,
        CorpusShardStatsRecipe, corpus_product_definitions,
    )
    from georiva_spark.streaming.ingest import start_corpus_ingest

    q = n // 8
    land = os.path.join(base, "rc_land")
    corp = os.path.join(base, "rc_corpus")
    out = os.path.join(base, "rc_out")
    ck = os.path.join(base, "rc_ck")
    nd = os.path.join(base, "rc_nd")
    os.makedirs(land)

    def land_file(name, df):
        tmp = os.path.join(base, f"rc_stage_{name}")
        df.coalesce(8).write.mode("overwrite").parquet(tmp)
        for i, f in enumerate(sorted(os.listdir(tmp))):
            if f.endswith(".parquet"):
                os.replace(os.path.join(tmp, f),
                           os.path.join(land, f"{name}-{i}.parquet"))

    def loader(it):
        if it["collection"] == "crawl-shards":
            return (spark.read.parquet(corp)
                    .where(F.col("shard") == it["variable"])
                    .drop("shard"))
        return spark.read.parquet(
            os.path.join(out, f"unit={it['unit_hash']}"))

    ctx = CatalogContext(spark, [], grid_loader=loader)
    reg = RecipeRegistry()
    reg.register(CorpusCleanRecipe(config={"min_words": 5}))
    reg.register(CorpusShardStatsRecipe())
    reg.register(CorpusDatacardRecipe())
    # only the datacard branch of the DAG (token partials covered by
    # the products smoke above)
    defs = [d for d in corpus_product_definitions()
            if d.key in ("corpus-clean", "corpus-shard-stats",
                         "corpus-datacard")]
    eng = DerivationEngine(spark, reg, ctx, output_dir=out,
                           definitions=defs)
    # bootstrap the gen-stamped index (yesterday's corpus: 1 sentinel)
    dedup.minhash_index_write(
        local_frame(spark, [(10 ** 12, "bootstrap sentinel row")],
                    "doc_id long, text string"),
        "t_rc_idx", os.path.join(base, "rc_idx"), n_buckets=32)

    def run(**kw):
        t0 = time.perf_counter()
        qy = start_corpus_ingest(
            spark, land, corp, ck, eng, max_files_per_trigger=64,
            available_now=True, neardup_table="t_rc_idx",
            neardup_out_dir=nd, neardup_threshold=0.5, **kw)
        qy.awaitTermination()
        return time.perf_counter() - t0

    def pairs(shard):
        return spark.read.parquet(f"{nd}/shard={shard}")

    sA = corpus(spark, q).withColumn("shard", F.lit("sA"))
    land_file("a1", sA)
    tA = run()
    sB = corpus(spark, q, id_offset=q).withColumn("shard", F.lit("sB"))
    land_file("b1", sB)
    tB = run()
    print(f"recrawl smoke: shards of {q/1e3:.0f}k docs; ingest+probe+"
          f"index-append sA {tA:.1f}s, sB {tB:.1f}s "
          f"(pairs sB: {pairs('sB').count()})")
    # RE-CRAWL sA with wholly new content
    sA2 = corpus(spark, q, id_offset=4 * q) \
        .withColumn("shard", F.lit("sA"))
    land_file("a2", sA2)
    tR = run(recrawl="recompute")
    # sC duplicates the DEAD sA content (fresh doc_ids) plus a 10%
    # positive control duplicating the LIVE re-crawled content
    dead_dups = corpus(spark, q).select(
        (F.col("doc_id") + 8 * q).alias("doc_id"), "text", "lang",
        "source")
    live_dups = corpus(spark, q // 10, id_offset=4 * q).select(
        (F.col("doc_id") + 10 * q).alias("doc_id"), "text", "lang",
        "source")
    sC = dead_dups.unionByName(live_dups) \
        .withColumn("shard", F.lit("sC"))
    land_file("c1", sC)
    tC = run()
    pc = pairs("sC")
    dead_hits = pc.where(F.col("doc_new") < 9 * q).count()
    live_hits = pc.where(F.col("doc_new") >= 10 * q).count()
    assert dead_hits == 0, dead_hits   # retracted: dead content gone
    assert live_hits > 0               # live generation still probes
    print(f"re-crawl sA {tR:.1f}s (engine closure recompute + index "
          f"retraction); probe of {q/1e3:.0f}k dead-content dups: "
          f"0 pairs (retracted), {live_hits} pairs vs the live "
          f"re-crawled generation ({tC:.1f}s)")
    # replay guard: identical sC re-lands, nothing appends twice
    nb = spark.table("t_rc_idx_bands").count()
    land_file("c2", sC)
    tRep = run()
    assert spark.table("t_rc_idx_bands").count() == nb
    # datacard converges to a from-scratch build of the CURRENT corpus
    from georiva_spark.operators.textops import gopher_rules
    cur = spark.read.parquet(corp)
    g = gopher_rules(cur.drop("shard"), min_words=5, max_words=1000,
                     min_mean_word_len=1.0, max_mean_word_len=10.0,
                     max_symbol_ratio=0.1, max_bullet_ratio=0.9,
                     min_stopword_hits=1)
    surv = cur.join(g.where(F.col("gopher_pass")).select("doc_id"),
                    "doc_id", "left_semi")
    keep = (surv.groupBy("shard",
                         F.md5(F.coalesce(F.col("text"), F.lit("")))
                         .alias("__h"))
            .agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    fresh = {(r.lang, r.source): r.n for r in
             surv.join(keep, "doc_id", "left_semi")
             .groupBy("lang", "source")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    card_item = next(i for i in eng.catalog.items
                     if i["collection"] == "corpus-datacard")
    card = {(r.lang, r.source): r.n_docs
            for r in loader(card_item).collect()}
    assert card == fresh, (card, fresh)
    print(f"replay {tRep:.1f}s (guard held, no double-append); "
          f"datacard over {len(card)} strata == from-scratch build "
          f"of the post-recrawl corpus")
    # compaction purges the retracted rows physically
    t0 = time.perf_counter()
    dedup.minhash_index_compact(spark, "t_rc_idx",
                                os.path.join(base, "rc_idx_c"))
    tCp = time.perf_counter() - t0
    assert not spark.catalog.tableExists("t_rc_idx_dead")
    land_file("c3", sC.withColumn(
        "doc_id", F.col("doc_id") + 20 * q).withColumn(
        "shard", F.lit("sD")))
    run()
    pd_ = pairs("sD")
    assert pd_.where(F.col("doc_old") < q).count() == 0
    print(f"compaction {tCp:.1f}s: dead rows physically gone, rules "
          f"cleared, post-compact probes unchanged")
    # the token layout's answer to a re-crawl stays fail-by-name
    # (documented rebuild path) — proven at test scale in
    # tests/test_corpus_products.py::
    # test_corpus_stream_grows_token_layout_exactly_once
    for t in ("t_rc_idx_bands", "t_rc_idx_sigs", "t_rc_idx_dead",
              "t_rc_idx_bands_compact", "t_rc_idx_sigs_compact"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


if __name__ == "__main__":
    main()
