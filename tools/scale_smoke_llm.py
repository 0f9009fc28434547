"""Scale smoke for the LLM-data-pipeline operators: synthetic corpus of
N documents (default 2M, ~50 tokens each ≈ 0.6 GB of text) generated
in-flight from spark.range — no I/O — with PLANTED structure so every
stage has verifiable work to find:

  * docs are grouped 5-per-template; members 0-1 are byte-identical
    (exact dups), members 2-4 mutate one token (near dups) — so exact
    dedup must find N/5 duplicate groups and MinHash-LSH + connected
    components must recover ~N/5 clusters of 5.

Stages timed: exact dedup → MinHash-LSH pairs → connected components →
decontaminate (vs a 1% eval slice) → source_mix → quality scan →
repetition → vocab → line-level dedup → URL dedup → SemDeDup (n/10
synthetic embeddings with planted identical pairs).

Usage: python tools/scale_smoke_llm.py [n_docs]
Prints one timing line per stage; writes nothing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from georiva_spark.operators import dedup, sampling, textops
from georiva_spark.session import get_spark

L = 50          # tokens per doc
V = 50_000      # vocabulary size
T = 5           # docs per template (1 exact-dup pair + 3 near-dups)
LANGS = ("en", "de", "fr", "es", "zh")


def corpus(spark, n: int):
    tmpl = (F.col("id") / T).cast("long")
    m = F.col("id") % T
    mutpos = F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(L))
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(L - 1)),
        lambda i: F.concat(F.lit("w"), F.pmod(
            F.when((m >= 2) & (i == mutpos),
                   F.xxhash64(F.col("id"), i))
            .otherwise(F.xxhash64(tmpl, i)), F.lit(V)).cast("string")))
    text = F.array_join(toks, " ")
    return spark.range(n).select(
        F.col("id").alias("doc_id"), text.alias("text"),
        F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                     (tmpl % len(LANGS) + 1).cast("int")).alias("lang"),
        F.concat(F.lit("src"), (tmpl % 20).cast("string")).alias("source"),
        F.length(text).alias("n_chars"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("scale-smoke-llm",
                      extra_conf={"spark.driver.memory": "48g"})
    docs = corpus(spark, n).persist()
    docs.count()   # materialize generation outside the timings

    t0 = time.perf_counter()
    g = dedup.exact_duplicates(docs)
    ndup = g.where(F.col("dup_count") > 1).count()
    el = time.perf_counter() - t0
    print(f"exact_dedup: {el:.1f}s over {n/1e6:.1f}M docs "
          f"({n/el/1e6:.2f}M docs/s) -> {ndup} dup groups "
          f"(expect {n//T})")

    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).persist()
    np_ = pairs.count()
    el = time.perf_counter() - t0
    print(f"minhash_lsh_pairs: {el:.1f}s ({n/el/1e6:.2f}M docs/s) "
          f"-> {np_} candidate pairs (expect ~{n//T*10})")

    # SimHash near-dup over the same corpus: template exact-dup pairs
    # sit at Hamming 0 (identical docs -> identical codes, caught by
    # the pre-collapse). max_hamming=2 keeps the band key space at
    # 2^21 — k=6 would shrink it to 2^9=512 keys, the short-band
    # cartesian trap the r6 redesign exists to avoid.
    t0 = time.perf_counter()
    sp = dedup.simhash_pairs(docs, max_hamming=2)
    nsp = sp.count()
    nzero = sp.where(F.col("hamming") == 0).count()
    el = time.perf_counter() - t0
    print(f"simhash_pairs (k<=2): {el:.1f}s ({n/el/1e6:.2f}M docs/s) "
          f"-> {nsp} pairs, {nzero} exact (expect >= {n//T})")

    t0 = time.perf_counter()
    cc = dedup.connected_components(pairs)
    ncl = cc.select("component").distinct().count()
    el = time.perf_counter() - t0
    print(f"connected_components: {el:.1f}s over {np_/1e6:.2f}M pairs "
          f"-> {ncl} clusters (expect ~{n//T})")

    t0 = time.perf_counter()
    bench = sampling.hash_sample(docs, 0.01, salt="evalset")
    corp = sampling.hash_sample(docs, 0.01, salt="evalset",
                                complement=True)
    dec = dedup.decontaminate(corp, bench, n=8, min_overlap=1)
    flagged = dec.where(F.col("contaminated")).count()
    el = time.perf_counter() - t0
    print(f"decontaminate(1% eval): {el:.1f}s ({n/el/1e6:.2f}M docs/s) "
          f"-> {flagged} flagged (expect ~{int(n*0.01*4)} cluster-mates)")

    t0 = time.perf_counter()
    mix = sampling.source_mix(
        docs, weights_ppm={"en": 500_000, "zh": 300_000, "de": 200_000},
        budget_ppm=300_000, strata_col="lang")
    nm = mix.count()
    el = time.perf_counter() - t0
    print(f"source_mix: {el:.1f}s ({n/el/1e6:.2f}M docs/s) -> {nm} kept")

    t0 = time.perf_counter()
    q = textops.quality_scores(docs)
    b = textops.bow_classifier_score(docs)
    nq = q.join(b, "doc_id").where(F.col("bow_score") > 0).count()
    el = time.perf_counter() - t0
    print(f"quality+bow scan: {el:.1f}s ({n/el/1e6:.2f}M docs/s) "
          f"-> {nq} positive-score docs")

    t0 = time.perf_counter()
    r = textops.repetition_scores(docs)
    nr = r.where(F.col("dup_ngram_frac") > 0.5).count()
    el = time.perf_counter() - t0
    print(f"repetition scan: {el:.1f}s ({n/el/1e6:.2f}M docs/s) "
          f"-> {nr} repetitive docs")

    t0 = time.perf_counter()
    v = textops.vocab_df(docs, top_k=50_000)
    nv = v.count()
    el = time.perf_counter() - t0
    print(f"vocab build (top-50k): {el:.1f}s ({n/el/1e6:.2f}M docs/s) "
          f"-> {nv} vocab rows (V={V})")

    # line-level dedup: regroup each doc's 50 tokens into 5 lines of 10;
    # template-shared lines repeat 5× corpus-wide, each mutant's mutated
    # line is globally unique — max_line_df=1 must keep EXACTLY the 3
    # mutated lines per template (one per near-dup member).
    t0 = time.perf_counter()
    toks = F.split(F.col("text"), " ")
    lined = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(4)),
                    lambda i: F.array_join(
                        F.slice(toks, i * 10 + 1, 10), " ")), "\n")
    staged = docs.select("doc_id", lined.alias("text"))
    ld = dedup.line_dedup(staged, max_line_df=1)
    nkept = ld.where(F.col("n_kept") == 1).count()
    el = time.perf_counter() - t0
    print(f"line_dedup: {el:.1f}s ({n/el/1e6:.2f}M docs/s) "
          f"-> {nkept} docs keep their unique line "
          f"(expect ~{n - n // T * 2} mutants, minus rare "
          f"mutated-token hash collisions)")

    # URL dedup: template-mates share one logical URL dressed in three
    # messy variants — canonicalization must collapse each template to
    # ONE group of 5 (the longest text wins; mutant token spellings
    # vary in length, so the winner is data-dependent).
    t0 = time.perf_counter()
    tmpl = (F.col("doc_id") / T).cast("long")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    slot = tmpl.cast("string")
    v3 = F.col("doc_id") % 3
    url = (F.when(v3 == 0, F.concat(F.lit("https://"), host,
                                    F.lit("/t/"), slot))
            .when(v3 == 1, F.concat(F.lit("HTTPS://"), F.upper(host),
                                    F.lit(":443/t/"), slot,
                                    F.lit("?utm_source=feed")))
            .otherwise(F.concat(F.lit("https://"), host, F.lit("/t/"),
                                slot, F.lit("/#frag"))))
    ud = textops.url_dedup(
        docs.select("doc_id", "n_chars", url.alias("url")))
    ngroups = ud.count()
    nfull = ud.where(F.col("n_dups") == T).count()
    el = time.perf_counter() - t0
    print(f"url_dedup: {el:.1f}s ({n/el/1e6:.2f}M docs/s) "
          f"-> {ngroups} canonical URLs (expect {n // T}), "
          f"{nfull} full groups of {T} (expect {n // T})")

    # SemDeDup on n/10 synthetic 64-dim embeddings: consecutive id pairs
    # share a vector (cosine exactly 1), random hash vectors otherwise
    # (cosine ~ N(0, 1/64) — never near 1) → exactly n/20 duplicates.
    t0 = time.perf_counter()
    ne = n // 10
    base = F.col("id") - (F.col("id") % 2)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (F.pmod(F.xxhash64(base, j), F.lit(2001))
                   .cast("double") / F.lit(1000.0) - F.lit(1.0))
        .cast("float"))
    emb = spark.range(ne).select(F.col("id").alias("vec_id"),
                                 vec.alias("embedding"))
    from georiva_spark.operators import similarity
    sd = similarity.semdedup(emb, n_clusters=32, threshold=0.99)
    ndup_e = sd.where(F.col("is_dup")).count()
    el = time.perf_counter() - t0
    print(f"semdedup: {el:.1f}s over {ne/1e6:.2f}M vectors "
          f"({ne/el/1e6:.2f}M vec/s) -> {ndup_e} dups "
          f"(expect {ne // 2})")

    t0 = time.perf_counter()
    c4 = textops.c4_rules(docs)
    nc4 = c4.where(F.col("c4_pass")).count()
    el = time.perf_counter() - t0
    print(f"c4_rules scan: {el:.1f}s ({n/el/1e6:.2f}M docs/s) "
          f"-> {nc4} pass")

    t0 = time.perf_counter()
    w = [((k * 37) % 19 - 9) / 3.0 for k in range(64)]
    ft = textops.linear_quality_score(docs, w)
    nft = ft.where(F.col("keep")).count()
    el = time.perf_counter() - t0
    print(f"fasttext_score scan: {el:.1f}s ({n/el/1e6:.2f}M docs/s) "
          f"-> {nft} kept")

    t0 = time.perf_counter()
    tm = sampling.temperature_mix(docs, alpha=0.5, budget_ppm=500_000)
    ntm = tm.count()
    el = time.perf_counter() - t0
    print(f"temperature_mix: {el:.1f}s ({n/el/1e6:.2f}M docs/s) "
          f"-> {ntm} kept (~{n // 2} expected)")

    # r8: sort-free top-20% quality cut (score = n_chars stand-in) —
    # ONE bounded histogram agg, then a scan-speed keep predicate
    t0 = time.perf_counter()
    qt = sampling.quality_threshold(docs, "n_chars", keep_ppm=200_000,
                                    strata_col="lang", bins=1000,
                                    score_min=0.0, score_max=400.0)
    nqt = qt.count()
    el = time.perf_counter() - t0
    print(f"quality_threshold (top 20%/lang): {el:.1f}s "
          f"({n/el/1e6:.2f}M docs/s) -> {nqt} kept "
          f"(~{n // 5} expected)")

    # r8: deterministic shard shuffle — one shuffle on the shard key,
    # per-shard window rank (the training-loader permutation)
    t0 = time.perf_counter()
    sh = sampling.shuffle_shards(docs.select("doc_id"), n_shards=256)
    nsh = sh.select("shard").distinct().count()
    el = time.perf_counter() - t0
    print(f"shuffle_shards (256 shards): {el:.1f}s "
          f"({n/el/1e6:.2f}M docs/s) -> {nsh} shards")

    # r8: per-lang token budget — r9 two-phase (coarse histogram →
    # broadcast boundary prune → (stratum, coarse)-partitioned sum)
    t0 = time.perf_counter()
    tb = sampling.token_budget_sample(docs, budget_tokens=1_000_000,
                                      strata_col="lang")
    ntb = tb.count()
    el = time.perf_counter() - t0
    print(f"token_budget (1M tok/lang): {el:.1f}s "
          f"({n/el/1e6:.2f}M docs/s) -> {ntb} docs kept "
          f"(~{5 * 1_000_000 // L} expected)")

    # r9 dominant-stratum stress: 90% of the corpus in ONE stratum and
    # a budget that keeps ~half of it — the exact shape where the old
    # one-window-per-stratum draw funneled everything through a single
    # reducer's sort; two-phase spreads it over ~coarse_buckets tasks
    skew = docs.withColumn(
        "dlang", F.when(F.pmod(F.xxhash64("doc_id", F.lit(11)),
                               F.lit(10)) < 9, F.lit("en"))
        .otherwise(F.col("lang")))
    t0 = time.perf_counter()
    tbs = sampling.token_budget_sample(
        skew, budget_tokens=int(0.45 * n * L), strata_col="dlang")
    ntbs = tbs.count()
    el = time.perf_counter() - t0
    # expected: budget/L ≈ 0.45n docs from the 90% stratum + the tail
    # strata kept whole (each far below budget) ≈ 0.1n more
    print(f"token_budget 90%-stratum (keep ~half): {el:.1f}s "
          f"({n/el/1e6:.2f}M docs/s) -> {ntbs} docs kept "
          f"(~{int(0.55 * n)} expected)")

    # r9: MANY-strata stress — a per-DOMAIN recipe (10k strata) must
    # route through the distributed-thresholds broadcast join, never a
    # 10k-arm CASE chain or a 10k×bins driver collect
    domains = docs.withColumn(
        "domain", F.concat(F.lit("d"),
                           F.pmod(F.xxhash64("doc_id", F.lit(3)),
                                  F.lit(10_000)).cast("string")))
    t0 = time.perf_counter()
    qd = sampling.quality_threshold(domains, "n_chars",
                                    keep_ppm=300_000,
                                    strata_col="domain", bins=1000,
                                    score_min=0.0, score_max=400.0)
    nqd = qd.count()
    el = time.perf_counter() - t0
    phys = (qd._jdf.queryExecution().toString()
            .split("== Physical Plan ==")[-1])
    assert "BroadcastHashJoin" in phys and "__qt_thr" in phys
    print(f"quality_threshold 10k strata: {el:.1f}s "
          f"({n/el/1e6:.2f}M docs/s) -> {nqd} kept "
          f"(~{int(0.3 * n)} target; distributed-thresholds join)")
    t0 = time.perf_counter()
    td = sampling.token_budget_sample(domains, budget_tokens=3_000,
                                      strata_col="domain")
    ntd = td.count()
    el = time.perf_counter() - t0
    print(f"token_budget 10k strata (3k tok/domain): {el:.1f}s "
          f"({n/el/1e6:.2f}M docs/s) -> {ntd} kept")

    # r9 epoch up-sampling on the same skewed corpus: the budget is a
    # few epochs of a tail stratum, so the 90% stratum draws a partial
    # epoch 0 while each ~2% tail stratum repeats across epochs up to
    # the max_epochs cap — the LLaMA-recipe "epochs" column
    # (measured: en→1 epoch, tails→4 incl. the capped partial, 16.4s)
    tail_tokens = int(0.025 * n * L)
    t0 = time.perf_counter()
    tbe = sampling.token_budget_epochs(
        skew, budget_tokens=int(2.5 * tail_tokens), max_epochs=4,
        strata_col="dlang")
    ne = (tbe.groupBy("dlang", "epoch").count()
          .groupBy("dlang").count().collect())
    el = time.perf_counter() - t0
    n_epochs = {r[0]: r[1] for r in ne}
    print(f"token_budget_epochs (2.5 tail-epochs budget): {el:.1f}s "
          f"-> epochs per stratum: en={n_epochs.get('en')} (partial "
          f"e0), tails={ {k: v for k, v in n_epochs.items() if k != 'en'} }")

    # r10: MANY-strata epochs — a per-DOMAIN epoch draw (10k strata)
    # must keep the crossing-epoch plan IN the totals-agg frame (no
    # per-stratum driver literals: the plan must contain zero
    # LocalTableScan) and run the same two-phase shape
    t0 = time.perf_counter()
    tde = sampling.token_budget_epochs(domains, budget_tokens=3_000,
                                       max_epochs=3,
                                       strata_col="domain")
    phys = (tde._jdf.queryExecution().toString()
            .split("== Physical Plan ==")[-1])
    assert "LocalTableScan" not in phys
    ntde = tde.count()
    el = time.perf_counter() - t0
    print(f"token_budget_epochs 10k strata (3k tok/domain): {el:.1f}s "
          f"({n/el/1e6:.2f}M docs/s) -> {ntde} rows (in-plan "
          f"crossing-epoch derivation, no driver literals)")

    # r10: token-id training-shard export — the loader handoff at
    # corpus scale: BPE-encode every doc (pure-JVM literal replace
    # chain), map to dense ids (constant-folded vocab map), greedy-
    # pack into 512-token bins across 256 shards, write one file per
    # shard with padded fixed-length token_ids rows
    import shutil
    import tempfile

    from georiva_spark.sources.tables import export_token_shards
    tsdir = tempfile.mkdtemp(prefix="tokshards_smoke_")
    t0 = time.perf_counter()
    man = export_token_shards(
        docs, tsdir, merges=[("t", "e"), ("te", "m"), ("p", "l"),
                             ("d", "o"), ("do", "c")],
        context_len=512, num_shards=256).collect()
    el = time.perf_counter() - t0
    tot_tok = sum(r.n_tokens for r in man)
    tot_docs = sum(r.n_docs for r in man)
    assert tot_docs == n
    print(f"export_token_shards (512-ctx, 256 shards): {el:.1f}s "
          f"({n/el/1e6:.2f}M docs/s, {tot_tok/1e6:.0f}M token ids "
          f"materialized) -> {len(man)} shards")
    shutil.rmtree(tsdir, ignore_errors=True)

    t0 = time.perf_counter()
    lb = textops.lm_score_bigram(docs, top_k=50_000,
                                 top_k_bigrams=200_000)
    nlb = lb.where(F.col("bits_per_token").isNotNull()).count()
    el = time.perf_counter() - t0
    print(f"lm_bigram fit+score: {el:.1f}s ({n/el/1e6:.2f}M docs/s) "
          f"-> {nlb} scored")

    # duplicated-substring spans: every doc shares its template's
    # 5-grams with ≥4 siblings (one mutated token only breaks grams in
    # a ±4 window), so EVERY doc must carry at least one span
    t0 = time.perf_counter()
    sp = textops.duplicate_spans(docs, n=5, min_docs=2)
    ndocs_spanned = sp.select("doc_id").distinct().count()
    el = time.perf_counter() - t0
    print(f"dup_spans (5-gram df window + island merge): {el:.1f}s "
          f"({n/el/1e6:.2f}M docs/s) -> {ndocs_spanned} docs spanned "
          f"(expect {n})")

    # k-means training on ne = n/4 synthetic 64-dim vectors in 16
    # BLOCK-layout planted blobs (explicit seed_ids — one per blob):
    # center[blob][j] ~ hash in [-10,10], noise in [-1,1] -> after two
    # Lloyd's rounds every blob must map to exactly one cluster.
    t0 = time.perf_counter()
    ne = n // 4
    blob = (F.col("id") / (ne // 16)).cast("long")
    kvec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: ((F.pmod(F.xxhash64(blob, j, F.lit(11)), F.lit(21))
                    .cast("double") - F.lit(10.0))
                   + (F.pmod(F.xxhash64(F.col("id"), j), F.lit(2001))
                      .cast("double") / F.lit(1000.0) - F.lit(1.0)))
        .cast("float"))
    kemb = spark.range(ne).select(F.col("id").alias("vec_id"),
                                  kvec.alias("embedding"),
                                  blob.alias("blob"))
    step = ne // 16
    km = similarity.kmeans_fit(
        kemb, k=16, iters=2,
        seed_ids=[b * step + step // 2 for b in range(16)])
    agree = (km.join(kemb.select("vec_id", "blob"), "vec_id")
             .groupBy("blob")
             .agg(F.countDistinct("cluster").alias("nc")))
    pure = agree.where(F.col("nc") == 1).count()
    el = time.perf_counter() - t0
    print(f"kmeans_fit (k=16, 2 rounds): {el:.1f}s over {ne/1e6:.2f}M "
          f"vectors ({ne/el/1e6:.2f}M vec/s) -> {pure}/16 pure blobs")

    # BM25 retrieval for 3 template-vocab queries over the full corpus
    t0 = time.perf_counter()
    bq = [(0, ["w10", "w20"]), (1, ["w33", "w44", "w55"]),
          (2, ["w7"])]
    bm = textops.bm25_topk(docs, bq, k=10)
    nbm = bm.count()
    el = time.perf_counter() - t0
    print(f"bm25_topk (3 queries): {el:.1f}s ({n/el/1e6:.2f}M docs/s) "
          f"-> {nbm} result rows (expect <=30)")

    # logistic-regression training over hashed BoW, 2 full-batch GD
    # rounds. On THIS corpus no 64-bucket feature correlates with any
    # cheap label (shared vocab, rare tokens drown in collisions), so
    # the quantitative check is the GD trajectory itself: with
    # uncorrelated features the mean prob must track the bias-only
    # recursion b -= lr*(sigma(b) - p) toward the positive rate p
    # (feature-level learning is pinned by the numpy-parity unit test)
    t0 = time.perf_counter()
    has7 = F.array_contains(F.split(F.col("text"), " "), "w7")
    _, scored = textops.train_linear_classifier(docs, has7,
                                                dims=64, iters=2)
    mp = float(scored.agg(F.avg("prob")).head()[0])
    p_pos = docs.where(has7).count() / docs.count()
    import math as m
    b = 0.0
    for _ in range(2):
        b -= 1.0 / (1.0 + m.exp(-b)) - p_pos
    ref = 1.0 / (1.0 + m.exp(-b))
    el = time.perf_counter() - t0
    print(f"train_classifier (2 GD rounds): {el:.1f}s "
          f"({n/el/1e6:.2f}M docs/s) -> mean prob {mp:.4f} vs "
          f"closed-form bias trajectory {ref:.4f} "
          f"(|diff| {abs(mp-ref):.4f}, expect < 0.02)")

    perceptual_stage(spark, max(n // 2, 1_000_000))
    warc_stage(spark, docs, n)



def warc_stage(spark, docs, n: int):
    """WARC/WET at corpus scale: executors write one gzip-per-record
    WET shard per partition (the crawl layout), then warc_scan reads
    the whole directory back — record framing, per-member gunzip,
    payload decode — and the byte totals must reconcile exactly with
    the source table."""
    import shutil
    import tempfile
    import uuid

    import pandas as pd

    from georiva_spark.sources.warc_codec import warc_encode, warc_scan

    out_dir = tempfile.mkdtemp(prefix="georiva_warc_smoke_")

    def write_shard(batches):
        recs, nb = [], 0
        for pdf in batches:
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                recs.append({"warc_type": "conversion",
                             "target_uri": f"u:{int(i)}", "payload": t})
                nb += len(t.encode("utf-8"))
        if recs:
            buf = warc_encode(recs, gz=True)
            fp = os.path.join(out_dir,
                              f"shard-{uuid.uuid4().hex}.wet.gz")
            with open(fp, "wb") as f:
                f.write(buf)
        yield pd.DataFrame({"n": [len(recs)], "nb": [nb]})

    try:
        t0 = time.perf_counter()
        wrote = (docs.select("doc_id", "text")
                 .mapInPandas(write_shard, schema="n long, nb long")
                 .agg(F.sum("n"), F.sum("nb")).head())
        el_w = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = (warc_scan(spark, out_dir)
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("n_bytes").alias("nb")).head())
        el_r = time.perf_counter() - t0
        print(f"warc write+scan: write {el_w:.1f}s "
              f"({n/el_w/1e6:.2f}M docs/s), scan {el_r:.1f}s "
              f"({n/el_r/1e6:.2f}M docs/s) -> {got['n']} records / "
              f"{got['nb']} bytes (source {wrote[0]} / {wrote[1]} — "
              f"{'EXACT' if (got['n'], got['nb']) == (wrote[0], wrote[1]) else 'MISMATCH'})")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)



def perceptual_stage(spark, nm: int):
    """Perceptual near-dup at scale: nm 56-bit codes (the image-dHash
    shape; audio/video differ only in width) with PLANTED structure —
    per 10-item block, members 0-2 share ONE code exactly (30%
    identical codes corpus-wide: the silence-clip / black-frame
    regime the r6 pre-collapse exists for), member 3 sits at Hamming
    1, members 4-9 are random. dedup.hamming_pairs must emit exactly
    6 pairs per block (3 exact + 3 near) with the band join running
    on DISTINCT codes only."""
    mask = (1 << 56) - 1
    g = (F.col("id") / 10).cast("long")
    m = F.col("id") % 10
    hot = F.xxhash64(g, F.lit(3)).bitwiseAND(F.lit(mask))
    near = hot.bitwiseXOR(F.expr(
        "shiftleft(CAST(1 AS BIGINT), "
        "CAST(pmod(CAST(id / 10 AS BIGINT), 56) AS INT))"))
    rand = F.xxhash64(F.col("id"), F.lit(17)).bitwiseAND(F.lit(mask))
    codes = spark.range(nm).select(
        F.col("id").alias("media_id"),
        F.when(m <= 2, hot).when(m == 3, near).otherwise(rand)
        .alias("code"))

    t0 = time.perf_counter()
    distinct = codes.select("code").distinct().count()
    pairs = dedup.hamming_pairs(codes, "media_id", "code",
                                max_hamming=3, bits=56)
    npairs = pairs.count()
    nexact = pairs.where(F.col("hamming") == 0).count()
    el = time.perf_counter() - t0
    blocks = nm // 10
    print(f"perceptual_near_dup: {el:.1f}s over {nm/1e6:.1f}M codes "
          f"({nm/el/1e6:.2f}M codes/s) -> {distinct} distinct codes "
          f"({distinct/nm:.0%} of corpus; 30% identical planted), "
          f"{npairs} pairs ({nexact} exact) vs {6*blocks} expected "
          f"({3*blocks} exact) — candidates/pairs ratio "
          f"{npairs/(6*blocks):.3f}")



if __name__ == "__main__":
    main()
