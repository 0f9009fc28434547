"""Deterministic sampling operators (north-star LLM-data ops).

``df.sample()`` is seed-dependent *per partition*: the rows it picks
change whenever the partitioning changes, so two runs over the same 100 TB
corpus — or a Spark run and a DuckDB audit — disagree. Hash-bucket
sampling keys the decision on the row itself (md5 of a salt + key), so
the sample is reproducible across runs, engines, partitionings, and
cluster sizes, and composes with incremental ingestion (a doc's
membership never changes as the corpus grows). Everything is built-in
expression code — scan-speed, no shuffle, and the predicate pushes down
past column pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_BUCKETS = 1_000_000


def _bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1e6): md5 of salt:key, first 15 hex chars
    (60 bits) mod 1e6 — bit-identically computable by DuckDB
    (CAST('0x' || substring(md5(..),1,15) AS BIGINT) % 1000000)."""
    h = F.md5(F.concat_ws(":", F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _BUCKETS


def _threshold_join_filter(df: DataFrame, thr_df: DataFrame,
                           strata_col: str, key_col: str,
                           salt: str) -> DataFrame:
    """Keep rows whose md5 bucket falls under their stratum's
    threshold — the shared tail of every per-stratum sampler.
    Thresholds arrive as a BOUNDED (``__sb_s``, ``__sb_thr``) frame
    derived IN the plan (one map-side-combined agg of #strata rows)
    and broadcast-join back null-safely (NULL strata sample like any
    other; a plain ``==`` would silently drop them). Nothing
    strata-proportional ever reaches the driver — a 10k-domain recipe
    plans exactly like 3 languages — and the corpus itself never
    shuffles: the join is a broadcast hash join against the scan."""
    taken = {"__sb_s", "__sb_thr"} & set(df.columns)
    if taken:
        raise ValueError(
            f"per-stratum sampler: input column(s) {sorted(taken)} "
            f"collide with the threshold-join internals; rename first")
    b = _bucket(F.col(key_col), salt)
    return (df.join(F.broadcast(thr_df.select("__sb_s", "__sb_thr")),
                    F.col(strata_col).eqNullSafe(F.col("__sb_s")),
                    "inner")
            .where(b < F.col("__sb_thr"))
            .drop("__sb_s", "__sb_thr"))


def _counts_with_total(df: DataFrame, strata_col: str) -> DataFrame:
    """Bounded per-stratum counts + corpus total, all in-plan: ONE
    map-side-combined agg (#strata rows), the total a window sum over
    the bounded agg frame (the single-partition exchange moves
    #strata rows, never corpus rows). DECIMAL(20,0) counts so the
    downstream threshold arithmetic stays exact integer — the same
    HUGEINT arithmetic the DuckDB replay runs."""
    from pyspark.sql import Window
    return (df.groupBy(F.col(strata_col).alias("__sb_s"))
            .agg(F.count(F.lit(1)).cast("decimal(20,0)")
                 .alias("__sb_n"))
            .withColumn("__sb_tot",
                        F.sum("__sb_n").over(Window.partitionBy())))


def _budget_threshold_filter(df: DataFrame, weighted: DataFrame,
                             budget_ppm: int, strata_col: str,
                             key_col: str, salt: str) -> DataFrame:
    """Shared threshold math of the mix samplers, computed IN the
    bounded frame:  thr_s = min(1e6, budget·w_s·N div (n_s·1e6))  in
    exact DECIMAL(38,0) with integral ``div`` — bit-identical to the
    Python-bigint / DuckDB-HUGEINT formulation, so the boundary
    bucket never moves with float rounding. ``weighted`` carries
    (__sb_s, __sb_n, __sb_tot, __sb_w); a NULL/absent weight means
    thr 0 (stratum dropped); a stratum rarer than its target
    saturates at keep-everything rather than inventing rows."""
    num = (F.lit(int(budget_ppm)).cast("decimal(8,0)")
           * F.coalesce(F.col("__sb_w"), F.lit(0)).cast("decimal(8,0)")
           * F.col("__sb_tot"))
    den = F.col("__sb_n") * F.lit(1_000_000).cast("decimal(7,0)")
    thr = (weighted.withColumn("__sb_num", num)
           .withColumn("__sb_den", den)
           .withColumn("__sb_thr",
                       F.least(F.lit(int(_BUCKETS)).cast("long"),
                               F.expr("__sb_num div __sb_den"))))
    return _threshold_join_filter(df, thr, strata_col, key_col, salt)


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                salt: str = "georiva", complement: bool = False) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hash bucket falls
    below rate. Same key + salt => same decision, forever.
    ``complement=True`` returns the exact other side of the split (the
    train side of a train/eval split — the two calls partition the
    corpus with no row in both)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    pred = _bucket(F.col(key_col), salt) < int(rate * _BUCKETS)
    return df.where(~pred if complement else pred)


def source_mix(df: DataFrame, weights_ppm: dict[str, int], budget_ppm: int,
               strata_col: str = "source", key_col: str = "doc_id",
               salt: str = "georiva-mix") -> DataFrame:
    """Target-composition corpus mixing — the "data recipe" step of a
    training pipeline: sample so stratum ``s`` contributes
    ``weights_ppm[s]`` parts-per-million of the OUTPUT, at overall output
    size ≈ ``budget_ppm``/1e6 of the corpus.

    Per-stratum keep-threshold (in hash buckets of 1e6):

        thr_s = min(1e6, budget_ppm * w_ppm * N // (n_s * 1e6))

    computed in EXACT integer arithmetic (Spark DECIMAL(38,0) with
    integral ``div`` here, HUGEINT in the DuckDB oracle) so the boundary
    bucket never moves with float rounding and an audit reproduces the
    sample bit-identically. A stratum rarer than its target weight
    saturates at keep-everything (thr = 1e6) rather than inventing rows.

    Scale shape (r11 — fully in-plan): the per-stratum counts are one
    map-side-combined agg BOUNDED by #strata, the recipe dict enters as
    a broadcast literal frame, and the thresholds broadcast-join back —
    nothing strata-proportional ever reaches the driver (no collect, no
    CASE chain), the corpus never shuffles, and the whole recipe is ONE
    lazy plan that composes into pipelines with no eager action.
    """
    from pyspark.sql.types import LongType, StructField, StructType
    s_type = next(f for f in df.schema.fields
                  if f.name == strata_col).dataType
    wschema = StructType([StructField("__sb_ws", s_type, True),
                          StructField("__sb_w", LongType(), False)])
    from georiva_spark.functions.frames import local_frame
    w_df = local_frame(
        df.sparkSession,
        [(s, int(w)) for s, w in weights_ppm.items()], wschema)
    weighted = _counts_with_total(df, strata_col).join(
        F.broadcast(w_df),
        F.col("__sb_s").eqNullSafe(F.col("__sb_ws")), "left")
    return _budget_threshold_filter(df, weighted, budget_ppm,
                                    strata_col, key_col, salt)


def temperature_mix(df: DataFrame, alpha: float = 0.5,
                    budget_ppm: int = 1_000_000,
                    strata_col: str = "lang", key_col: str = "doc_id",
                    salt: str = "georiva-temp") -> DataFrame:
    """Temperature-based mixture sampling (the multilingual α-sampling
    of XLM-R / mT5, arXiv:1911.02116 §3.1): the target share of stratum
    s is q_s ∝ p_s^α where p_s is its observed corpus share — α=1 keeps
    the natural mix, α→0 flattens toward uniform, boosting rare
    languages/sources. Unlike ``source_mix`` the weights are DERIVED
    from the corpus, not supplied.

    For the default α=0.5 (the common square-root schedule) the weights
    come from EXACT integer square roots — w_ppm_s = isqrt(n_s·10¹²) ·
    10⁶ // Σ_t isqrt(n_t·10¹²) — computed in-plan as a floor(sqrt)
    double seed plus a ±1 DECIMAL correction (the same expression the
    DuckDB oracle runs in HUGEINT), so an audit lands on identical
    thresholds and an identical sample (for other α the weights use
    float pow; documented, not oracle-exact).

    Scale shape (r11 — fully in-plan): counts, isqrt weights, and
    thresholds all derive inside ONE bounded #strata-row frame that
    broadcast-joins back — no driver collect, no CASE chain, zero
    shuffle of the corpus, and the recipe composes lazily into
    pipelines."""
    from pyspark.sql import Window

    counts = _counts_with_total(df, strata_col)
    n_dbl = F.col("__sb_n").cast("double")
    if alpha == 0.5:
        # exact isqrt(n·10^12): IEEE sqrt seeds within ±1 of the true
        # integer root (radicand ≤ 1e23 ⇒ double error ≪ 1 in the
        # root); the DECIMAL comparisons pin it exactly — the same
        # seed+correction the DuckDB oracle runs, so thresholds match
        # bit-for-bit
        x = F.col("__sb_n") * F.lit(10 ** 12).cast("decimal(13,0)")
        s0 = F.floor(F.sqrt(n_dbl * 1e12)).cast("decimal(20,0)")
        scaled = (F.when((s0 + 1) * (s0 + 1) <= x, s0 + 1)
                  .when(s0 * s0 > x, s0 - 1)
                  .otherwise(s0)).cast("decimal(26,0)")
    else:
        scaled = (F.round(F.pow(n_dbl, float(alpha)) * 1e6)
                  .cast("decimal(26,0)"))
    weighted = (counts.withColumn("__sb_sc", scaled)
                .withColumn("__sb_sct",
                            F.sum("__sb_sc").over(Window.partitionBy()))
                .withColumn("__sb_w",
                            F.expr("(__sb_sc * 1000000) div __sb_sct")))
    return _budget_threshold_filter(df, weighted, budget_ppm,
                                    strata_col, key_col, salt)


def stratified_hash_sample(df: DataFrame, rates: dict[str, float],
                           strata_col: str, key_col: str = "doc_id",
                           default_rate: float = 0.0,
                           salt: str = "georiva") -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing step of a
    training pipeline (e.g. downsample boilerplate-heavy sources, keep
    all of a rare language). Strata with no configured rate keep
    ``default_rate``. One scan, no shuffle."""
    b = _bucket(F.col(key_col), salt)
    strat = F.col(strata_col)
    default_thr = int(default_rate * _BUCKETS)
    if len(rates) <= 1000:
        thr = F.lit(default_thr)
        for stratum, rate in sorted(rates.items(),
                                    key=lambda kv: (kv[0] is None,
                                                    str(kv[0]))):
            m = (strat.isNull() if stratum is None
                 else strat.eqNullSafe(F.lit(stratum)))
            thr = F.when(m, F.lit(int(rate * _BUCKETS))).otherwise(thr)
        return df.where(b < thr)
    # many configured strata (per-domain rates): LEFT-join the bounded
    # rate frame so unlisted strata keep default_rate and the plan
    # stays O(1) in the rate-table size; still zero corpus scans
    from pyspark.sql.types import LongType, StructField, StructType
    s_type = next(f for f in df.schema.fields
                  if f.name == strata_col).dataType
    schema = StructType([StructField("__sb_s", s_type, True),
                         StructField("__sb_thr", LongType(), False)])
    from georiva_spark.functions.frames import local_frame
    thr_df = F.broadcast(local_frame(
        df.sparkSession,
        [(s, int(r * _BUCKETS)) for s, r in rates.items()], schema))
    return (df.join(thr_df, strat.eqNullSafe(F.col("__sb_s")), "left")
            .where(b < F.coalesce(F.col("__sb_thr"),
                                  F.lit(default_thr)))
            .drop("__sb_s", "__sb_thr"))


def split_assign(df: DataFrame, fractions_ppm: dict[str, int],
                 key_col: str = "doc_id",
                 salt: str = "split") -> DataFrame:
    """Deterministic train/val/test split assignment: each row's md5
    bucket lands in exactly one split by cumulative ppm thresholds —
    reproducible across engines, partitionings, and corpus growth
    (adding documents never reassigns existing ones), and auditable in
    SQL with the same arithmetic. Fractions are INTEGER ppm so the
    boundary bucket never moves with float rounding; they must sum to
    1,000,000. Zero shuffle — one scan predicate per row."""
    total = sum(fractions_ppm.values())
    if total != 1_000_000:
        raise ValueError(f"fractions_ppm must sum to 1,000,000 "
                         f"(got {total})")
    b = _bucket(F.col(key_col), salt)
    expr = None
    acc = 0
    for name, ppm in fractions_ppm.items():
        acc += ppm
        cond = b < acc
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    return df.withColumn("split", expr)


def shuffle_shards(df: DataFrame, n_shards: int,
                   key_col: str = "doc_id",
                   salt: str = "shuffle") -> DataFrame:
    """Deterministic GLOBAL corpus shuffle into training shards — the
    step between a curated corpus and the training loader: examples
    must arrive in pseudorandom order, the order must be reproducible
    (restartable jobs, auditable runs), and no single node may ever
    hold the global permutation. Each row routes to
    ``shard = md5(salt:key) mod n_shards`` and takes
    ``pos = rank of (md5, key) within its shard`` — reading shards
    0..N-1 in pos order yields a deterministic pseudorandom permutation
    of the corpus, identical across runs, engines, partitionings, and
    cluster sizes (a seeded ``orderBy(rand())`` is none of those).

    Scale shape: ONE shuffle on the shard key, then a per-shard sort
    (the window's partition IS the output shard — size n_shards so a
    shard matches the training-file target, e.g. 2–4 GB; at 100 TB
    that is tens of thousands of shards, each sorting independently).
    No global ordering structure is ever materialized.
    → input columns + (shard int, pos long)."""
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError(f"shuffle_shards: n_shards={n_shards} must "
                         f"be >= 1")
    taken = {"shard", "pos", "__h"} & set(df.columns)
    if taken:
        raise ValueError(
            f"shuffle_shards: input already has column(s) "
            f"{sorted(taken)} — the output adds (shard, pos) and a "
            f"silent overwrite would corrupt them; rename first")
    h = F.md5(F.concat_ws(":", F.lit(salt),
                          F.col(key_col).cast("string")))
    shard = (F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
             % n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy("__h", key_col)
    return (df.withColumn("__h", h)
            .withColumn("shard", shard)
            .withColumn("pos",
                        (F.row_number().over(w) - 1).cast("long"))
            .drop("__h"))


def token_budget_sample(docs: DataFrame, budget_tokens: int,
                        strata_col: str = "source",
                        key_col: str = "doc_id",
                        text_col: str = "text",
                        salt: str = "budget",
                        coarse_buckets: int = 1000) -> DataFrame:
    """Per-stratum TOKEN-budget draw — the "take N tokens per source"
    recipe of corpus mixing (token budgets, not document counts, are
    what training runs are specified in): each stratum's documents
    order by their md5 bucket (a deterministic pseudorandom order) and
    the kept set is the PREFIX whose running token total first covers
    ``budget_tokens`` — the document that crosses the line is kept, so
    a stratum with enough data always yields ≥ budget tokens, and a
    stratum with less yields everything. Reproducible across runs,
    engines, and partitionings (same md5-bucket policy as
    :func:`hash_sample`).

    Tokens are whitespace tokens (the corpus-accounting convention of
    the BM25/vocab ops); NULL or blank text counts 0 (NULL must not
    silently fall out of ``size(split(NULL))`` semantics, which differ
    between ANSI modes).

    Scale shape — TWO-PHASE, never one task per stratum (a dominant
    language is routinely >40% of a web corpus; a plain
    ``Window.partitionBy(stratum)`` running sum would funnel tens of
    TB through a single reducer's sort):

    1. ONE map-side-combined aggregation of token sums per
       (stratum, coarse md5-bucket range) — bounded by
       strata × ``coarse_buckets`` rows — stays DISTRIBUTED: a
       running-prefix window over the bounded histogram derives each
       bucket's starting offset, and a bucket survives iff that
       prefix is still under budget (nothing strata-proportional ever
       reaches the driver — a 10k-strata per-domain draw costs the
       same as 5 languages).
    2. The bounded (stratum, coarse, offset) frame broadcast-joins
       back (null-safe on the stratum, so NULL strata sample like any
       other); buckets past the boundary have no row and drop at the
       join — before any exchange. The exact running sum then runs in
       a window partitioned by (stratum, coarse) — parallelism is
       strata × coarse_buckets tasks, each sorting ≤ 1/coarse_buckets
       of its stratum — and ``cum_tokens = offset + within-bucket
       sum`` is bit-identical to the single-window definition.

    → input columns + (n_tokens, cum_tokens), where cum_tokens
    INCLUDES the row's own tokens."""
    taken = {"n_tokens", "cum_tokens", "__tb_bk", "__tb_coarse",
             "__tb_s", "__tb_c", "__tb_off"} & set(docs.columns)
    if taken:
        raise ValueError(
            f"token_budget_sample: input already has column(s) "
            f"{sorted(taken)} — the output adds (n_tokens, "
            f"cum_tokens); rename first")
    if not 1 <= coarse_buckets <= _BUCKETS or _BUCKETS % coarse_buckets:
        raise ValueError(
            f"token_budget_sample: coarse_buckets={coarse_buckets} "
            f"must divide {_BUCKETS}")
    width = _BUCKETS // coarse_buckets
    ntok = F.when(F.col(text_col).isNull()
                  | (F.length(F.trim(F.col(text_col))) == 0), F.lit(0)) \
            .otherwise(F.size(F.split(F.trim(F.col(text_col)),
                                      r"\s+"))).cast("long")
    b = _bucket(F.col(key_col), salt)
    base = (docs.withColumn("n_tokens", ntok)
            .withColumn("__tb_bk", b)
            .withColumn("__tb_coarse",
                        (F.col("__tb_bk") / width).cast("int")))
    # phase 1: bounded histogram (strata × coarse_buckets), boundary
    # derivation fully DISTRIBUTED — a coarse bucket survives iff the
    # stratum's token prefix BEFORE it is still under budget (that
    # prefix is its offset); nothing strata-proportional ever reaches
    # the driver, so 10k+ strata cost the same as 5 (r9: the r8
    # version collected the histogram and looped it driver-side)
    from pyspark.sql import Window
    hist = (base.groupBy(F.col(strata_col).alias("__tb_s"),
                         F.col("__tb_coarse").alias("__tb_c"))
            .agg(F.sum("n_tokens").alias("__t")))
    woff = (Window.partitionBy("__tb_s").orderBy(F.col("__tb_c").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = F.broadcast(
        hist.withColumn("__tb_off",
                        (F.sum("__t").over(woff) - F.col("__t"))
                        .cast("long"))
        .where(F.col("__tb_off") < budget_tokens)
        .select("__tb_s", "__tb_c", "__tb_off"))
    # phase 2: join = pre-boundary prune (no offsets row → dropped),
    # then the exact running sum inside each (stratum, coarse) slice
    joined = base.join(
        offsets,
        base[strata_col].eqNullSafe(offsets["__tb_s"])
        & (base["__tb_coarse"] == offsets["__tb_c"]), "inner")
    w = (Window.partitionBy(strata_col, "__tb_coarse")
         .orderBy(F.col("__tb_bk").asc(), F.col(key_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = joined.withColumn(
        "cum_tokens",
        (F.col("__tb_off") + F.sum("n_tokens").over(w)).cast("long"))
    # keep while the total BEFORE this doc is under budget — the
    # crossing document is included
    return (out.where(F.col("cum_tokens") - F.col("n_tokens")
                      < budget_tokens)
            .drop("__tb_bk", "__tb_coarse", "__tb_s", "__tb_c",
                  "__tb_off"))


def token_budget_epochs(docs: DataFrame, budget_tokens: int,
                        max_epochs: int = 4,
                        strata_col: str = "source",
                        key_col: str = "doc_id",
                        text_col: str = "text",
                        salt: str = "budget",
                        coarse_buckets: int = 1000) -> DataFrame:
    """Token-budget draw with EPOCH up-sampling — the "epochs" column
    of an LLM data-recipe table (LLaMA, arXiv:2302.13971 Table 1:
    high-quality sources repeat ~2 epochs while web crawl runs <1):
    when a stratum holds fewer tokens than its budget,
    :func:`token_budget_sample` just yields everything once; real
    recipes REPEAT the starved stratum. Here the virtual corpus is
    docs × epochs (each epoch a DIFFERENT deterministic permutation —
    epoch e orders by md5 of ``salt#e{e}``, so the loader never
    replays the same order) and the kept set is the virtual prefix
    that first covers ``budget_tokens``: epochs before the crossing
    epoch keep every document, the crossing epoch is a prefix draw
    over its own permutation (crossing doc included), epochs after it
    are dropped, and ``max_epochs`` caps repetition (the
    over-repetition guard — Muennighoff et al. 2023 measure the decay
    past ~4 epochs). ``max_epochs=1`` degenerates to
    :func:`token_budget_sample` membership (same salt at epoch 0).

    Scale shape: one bounded per-stratum token-total agg, with each
    stratum's crossing epoch and residual budget derived IN the agg
    frame (closed-form expressions — nothing strata-proportional
    reaches the driver, so 10k+ per-domain strata plan exactly like
    3 language strata); FULL
    epochs are a broadcast-joined in-row ``sequence`` explode (no
    shuffle — the fan-out never leaves the partition); only the
    crossing epoch runs the two-phase prefix draw (bounded
    (stratum, coarse) histogram → broadcast boundary prune →
    (stratum, coarse)-keyed window — the :func:`token_budget_sample`
    shape, never one task per stratum). NULL text counts 0 tokens;
    NULL strata sample like any other stratum.
    → input columns + (epoch int, n_tokens long)."""
    taken = {"epoch", "n_tokens", "__tbe_bk", "__tbe_coarse",
             "__tbe_cum", "__tbe_s", "__tbe_c", "__tbe_off",
             "__tbe_res", "__tbe_full", "__tbe_salt"} \
        & set(docs.columns)
    if taken:
        raise ValueError(
            f"token_budget_epochs: input already has column(s) "
            f"{sorted(taken)} — rename first")
    if max_epochs < 1:
        raise ValueError(
            f"token_budget_epochs: max_epochs={max_epochs} must be "
            f">= 1")
    if not 1 <= coarse_buckets <= _BUCKETS or _BUCKETS % coarse_buckets:
        raise ValueError(
            f"token_budget_epochs: coarse_buckets={coarse_buckets} "
            f"must divide {_BUCKETS}")
    width = _BUCKETS // coarse_buckets
    ntok = F.when(F.col(text_col).isNull()
                  | (F.length(F.trim(F.col(text_col))) == 0), F.lit(0)) \
            .otherwise(F.size(F.split(F.trim(F.col(text_col)),
                                      r"\s+"))).cast("long")
    if budget_tokens < 0:
        raise ValueError(
            f"token_budget_epochs: budget_tokens={budget_tokens} "
            f"must be >= 0")
    base = docs.withColumn("n_tokens", ntok)
    # phase 1: bounded per-stratum token totals → crossing epochs,
    # derived DISTRIBUTED (r10 — the quality_threshold many-strata
    # pattern): the per-stratum plan — n_full fully-kept epochs, the
    # crossing epoch's residual budget, its permutation salt — is
    # closed-form arithmetic over the totals agg, so it stays a
    # broadcast-joined frame and NOTHING strata-proportional ever
    # reaches the driver (10k+ per-domain strata cost one bounded
    # shuffle, not a driver dict+loop)
    t = F.col("__t")
    # divisor clamped to 1 for zero-token strata — their plan row is
    # fully overridden below, the clamp just keeps the integer DIV
    # from dividing by zero (ANSI-mode error) on the dead branch
    n_full_raw = F.least(
        F.lit(max_epochs),
        F.expr(f"CAST({int(budget_tokens)} AS BIGINT) div "
               f"(CASE WHEN __t > 0 THEN __t ELSE 1 END)")
    ).cast("int")
    res_raw = (F.lit(budget_tokens).cast("long")
               - n_full_raw.cast("long") * t)
    # zero-token stratum: every doc rides epoch 0 (cum 0 never
    # reaches a positive budget); the crossing epoch is absent when
    # the cap cuts first or the budget is an exact multiple
    zero_tok = t <= 0
    capped = (n_full_raw == max_epochs) | (res_raw <= 0)
    # the plan frame appears in three subtrees (join, histogram,
    # offsets) but its broadcast exchange canonicalizes identically —
    # ReuseExchange materializes the totals agg ONCE (A/B'd: a
    # persist_bounded cache changes nothing)
    plan = F.broadcast(
        base.groupBy(strata_col)
        .agg(F.sum("n_tokens").alias("__t"))
        .select(
            F.col(strata_col).alias("__tbe_s"),
            F.when(zero_tok,
                   F.lit(1 if budget_tokens > 0 else 0))
            .otherwise(n_full_raw).cast("int").alias("__tbe_full"),
            F.when(zero_tok | capped, F.lit(0))
            .otherwise(res_raw).cast("long").alias("__tbe_res"),
            F.when(zero_tok | capped, F.lit(""))
            .when(n_full_raw == 0, F.lit(salt))
            .otherwise(F.concat(F.lit(f"{salt}#e"),
                                n_full_raw.cast("string")))
            .alias("__tbe_salt")))
    joined = base.join(plan,
                       base[strata_col].eqNullSafe(plan["__tbe_s"]),
                       "inner")
    # full epochs: in-row sequence explode, no shuffle
    full = (joined.where(F.col("__tbe_full") > 0)
            .withColumn("epoch", F.explode(
                F.sequence(F.lit(0), F.col("__tbe_full") - 1)))
            .drop("__tbe_s", "__tbe_full", "__tbe_res", "__tbe_salt"))
    # crossing epoch: the two-phase prefix draw under that epoch's salt
    part = joined.where(F.col("__tbe_res") > 0)
    h = F.md5(F.concat_ws(":", F.col("__tbe_salt"),
                          F.col(key_col).cast("string")))
    bk = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _BUCKETS
    part = (part.withColumn("__tbe_bk", bk)
            .withColumn("__tbe_coarse",
                        (F.col("__tbe_bk") / width).cast("int")))
    # boundary derivation stays DISTRIBUTED (the token_budget_sample
    # r9 shape): a coarse bucket survives iff the stratum's prefix
    # before it is under the stratum's RESIDUAL budget (constant per
    # stratum, riding the histogram agg)
    from pyspark.sql import Window
    histe = (part.groupBy(F.col(strata_col).alias("__tbe_s2"),
                          F.col("__tbe_coarse").alias("__tbe_c"))
             .agg(F.sum("n_tokens").alias("__t"),
                  F.first("__tbe_res").alias("__r")))
    woff = (Window.partitionBy("__tbe_s2")
            .orderBy(F.col("__tbe_c").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = F.broadcast(
        histe.withColumn("__tbe_off",
                         (F.sum("__t").over(woff) - F.col("__t"))
                         .cast("long"))
        .where(F.col("__tbe_off") < F.col("__r"))
        .select("__tbe_s2", "__tbe_c", "__tbe_off"))
    pj = part.join(offsets,
                   part[strata_col].eqNullSafe(offsets["__tbe_s2"])
                   & (part["__tbe_coarse"] == offsets["__tbe_c"]),
                   "inner")
    w = (Window.partitionBy(strata_col, "__tbe_coarse")
         .orderBy(F.col("__tbe_bk").asc(), F.col(key_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    partial = (pj.withColumn(
        "__tbe_cum",
        F.col("__tbe_off") + F.sum("n_tokens").over(w))
        .where(F.col("__tbe_cum") - F.col("n_tokens")
               < F.col("__tbe_res"))
        .withColumn("epoch", F.col("__tbe_full"))
        .drop("__tbe_s", "__tbe_full", "__tbe_res", "__tbe_salt",
              "__tbe_bk", "__tbe_coarse", "__tbe_s2", "__tbe_c",
              "__tbe_off", "__tbe_cum"))
    return full.unionByName(partial)


def quality_threshold(docs: DataFrame, score_col: str, keep_ppm: int,
                      strata_col: str | None = None, bins: int = 2000,
                      score_min: float = 0.0, score_max: float = 1.0,
                      key_col: str = "doc_id",
                      salt: str = "qthr",
                      case_strata_max: int = 1000) -> DataFrame:
    """Keep the TOP ``keep_ppm``/1e6 of rows by score (per stratum) —
    the "top X% by classifier score" recipe step (fineweb-edu keeps
    the top band of its quality model's scores; specifying the cut as
    a RATE, not a score value, is what survives model recalibration).

    A corpus sort would be the naive implementation; instead the
    scores bucketize into ``bins`` integer bins over
    [score_min, score_max] (out-of-range clamps to the edge bins),
    ONE map-side-combined histogram aggregation yields the bounded
    strata×bins counts IN-PLAN, and exact integer window arithmetic
    over that frame derives per stratum: the threshold bin (smallest
    cut covering the target count from the top) and a within-bin
    md5-bucket fraction that fills the remainder from the boundary
    bin — so the kept set is `bin > thr OR (bin = thr AND md5_bucket
    < within_ppm)`, a broadcast-joined scan predicate with ZERO
    corpus shuffle and no corpus sort. The keep rate is exact to bin
    resolution ± hash noise in the boundary bin, fully deterministic,
    and an external SQL engine reproduces the same histogram,
    thresholds, and memberships. Ties inside the boundary bin resolve
    by document hash, not score — two docs with equal scores have
    equal claim, and the hash keeps the decision reproducible under
    corpus growth.

    NULL strata cut like any other stratum (null-safe matching, the
    same policy as :func:`token_budget_sample`'s window partition).
    ``case_strata_max`` is retained for API compatibility and ignored
    (r11): every stratum count takes the broadcast-join path — the
    plan is O(1) in strata, nothing strata-proportional reaches the
    driver, and there is no eager action at composition time."""
    if not 0 <= keep_ppm <= 1_000_000:
        raise ValueError("keep_ppm must be in [0, 1_000_000]")
    if score_max <= score_min:
        raise ValueError("quality_threshold: score_max must exceed "
                         "score_min")
    strat = F.col(strata_col) if strata_col else F.lit("__all")
    width = score_max - score_min
    bin_c = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor(
            (F.col(score_col).cast("double") - score_min)
            / width * bins).cast("int")))
    hist_df = docs.groupBy(strat.alias("__s"), bin_c.alias("__b")) \
        .count()
    b = bin_c
    bk = _bucket(F.col(key_col), salt)
    # single path (r11 — the r9 many-strata shape, now unconditional):
    # per-stratum thresholds derive from windows over the BOUNDED
    # strata×bins histogram and broadcast-join back — nothing
    # strata-proportional ever reaches the driver (the r10 small-strata
    # branch collected the histogram; same exact integer arithmetic,
    # identical membership, one fewer eager action) and the plan stays
    # O(1) in the stratum count.
    taken = {"__qt_s", "__qt_thr", "__qt_win"} & set(docs.columns)
    if taken:
        raise ValueError(
            f"quality_threshold: input column(s) {sorted(taken)} "
            f"collide with the threshold-join internals; rename "
            f"first")
    from pyspark.sql import Window
    wtot = Window.partitionBy("__s")
    wge = (Window.partitionBy("__s").orderBy(F.col("__b").desc())
           .rowsBetween(Window.unboundedPreceding,
                        Window.currentRow))
    target = F.expr(f"(__n * {int(keep_ppm)}) div 1000000")
    scored = (hist_df
              .withColumn("__n", F.sum("count").over(wtot))
              .withColumn("__ge", F.sum("count").over(wge))
              .withColumn("__tgt", target))
    first_cover = (Window.partitionBy("__s")
                   .orderBy(F.col("__b").desc()))
    thr_df = F.broadcast(
        scored.where(F.col("__ge") >= F.col("__tgt"))
        .withColumn("__rn", F.row_number().over(first_cover))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__s").alias("__qt_s"),
            F.col("__b").cast("int").alias("__qt_thr"),
            F.expr("((__tgt - (__ge - count)) * 1000000) "
                   "div count").cast("long").alias("__qt_win")))
    joined = docs.join(thr_df, strat.eqNullSafe(F.col("__qt_s")),
                       "inner")
    keep = (b > F.col("__qt_thr")) | (
        (b == F.col("__qt_thr")) & (bk < F.col("__qt_win")))
    return joined.where(keep).drop("__qt_s", "__qt_thr", "__qt_win")


def cluster_aware_split(docs: DataFrame, pairs: DataFrame,
                        fractions_ppm: dict[str, int],
                        id_col: str = "doc_id",
                        salt: str = "split") -> DataFrame:
    """LEAKAGE-SAFE train/val/test assignment: every document in a
    near-duplicate cluster lands in the SAME split. Splitting by
    per-document hash (plain :func:`split_assign`) silently leaks —
    a val document whose near-dup sits in train hands the model the
    answer (Lee et al. 2022, arXiv:2107.06499 §6.2 measure exactly
    this train/test overlap); the fix is to hash the document's
    near-dup CLUSTER id (minimum member id, from
    :func:`~georiva_spark.operators.dedup.dedup_clusters` over any
    pair generator — MinHash, SimHash, embedding-cosine), so split
    membership moves with the cluster and two near-dups can never
    straddle a boundary.

    Scale shape: connected components run on the PAIR list
    (hash-sized, never the corpus); each document joins its cluster
    label once (one shuffle on ``id_col``); the split decision is an
    in-row md5-bucket predicate on the cluster id — same integer-ppm
    arithmetic as split_assign, auditable in SQL.
    → (doc_id, cluster_id, split)."""
    from georiva_spark.operators.dedup import dedup_clusters

    labeled = dedup_clusters(docs, pairs, id_col=id_col)
    return (split_assign(labeled, fractions_ppm, key_col="cluster_id",
                         salt=salt)
            .select(id_col, "cluster_id", "split"))
