"""Text-analysis operators over the documents table (north-star LLM-data
ops): tokenization, quality scoring, language ID, fingerprinting.

Everything on the hot path is built-in `pyspark.sql.functions` (split,
higher-order array fns, hashing) — whole-stage-codegen'd — so a 100 TB
documents table runs at scan speed. One documented exception: the
winnowing fingerprint's sliding-window min runs as a vectorized Arrow
kernel (like the minhash kernel) because chained interpreted HOF rounds
re-evaluate their upstream expression tree per round (measured 85×).
"""

from __future__ import annotations

import math as _math

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# Tiny per-language stopword signatures for the heuristic language-ID
# (n-gram/stopword evidence; deterministic, dependency-free).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "nicht", "das"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "que", "los", "una"),
    "it": ("il", "che", "di", "la", "per"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the corpus is single-space joined)."""
    return F.split(text, " ")


def portable_hash64(c: Column) -> Column:
    """60-bit hash computable bit-identically by Spark AND DuckDB:
    first 15 hex chars of md5 parsed as an integer. Used by the
    oracle-checkable variants of fingerprint/minhash so the driver's
    DuckDB gate can reproduce hash-dependent outputs exactly
    (DuckDB: CAST('0x' || substring(md5(s),1,15) AS BIGINT)).
    xxhash64 stays the default on hot paths — it is faster JVM-side."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / token / stopword quality metrics per document.

    avg_token_len uses the single-space-join identity
    total_token_chars = n_chars - (token_count - 1).
    """
    toks = tokens(F.col("text"))
    ntok = F.size(toks)
    nstop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return docs.select(
        "doc_id", "lang", "n_chars",
        ntok.alias("token_count"),
        ((F.col("n_chars") - ntok + F.lit(1)).cast("double") / ntok)
        .alias("avg_token_len"),
        (nstop.cast("double") / ntok).alias("stopword_ratio"))


def language_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: argmax over per-language stopword hit counts;
    'und' (undetermined) when no marker hits."""
    toks = tokens(F.col("text"))

    def marker_hits(ws: tuple[str, ...]):
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    scores = [marker_hits(ws).alias(lang) for lang, ws in LANG_MARKERS.items()]
    scored = docs.select("doc_id", "lang", *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(l) for l in langs])
    pred = F.when(best == 0, F.lit("und"))
    for l in langs:   # first-match tie-break, deterministic language order
        pred = pred.when(F.col(l) == best, F.lit(l))
    return scored.select("doc_id", F.col("lang").alias("lang_true"),
                         pred.alias("lang_pred"))


def token_count_bpe_ish(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace words + a BPE-ish subword proxy at scan
    speed. Subwords = maximal alphanumeric runs plus each non-alphanumeric
    char as its own piece (equivalent to splitting at every alnum/non-alnum
    boundary, without lookaround regex so RE2-based engines — the DuckDB
    oracle — compute the identical count)."""
    words = F.size(tokens(F.col("text")))
    runs = F.size(F.regexp_extract_all(F.col("text"),
                                       F.lit(r"[a-zA-Z0-9]+"), F.lit(0)))
    non_alnum = F.length(F.regexp_replace(F.col("text"), r"[a-zA-Z0-9]", ""))
    return docs.select("doc_id", words.alias("word_count"),
                       (runs + non_alnum).alias("subword_count"))


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 16, text_col: str = "text") -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    context-window packing step of a training-data pipeline. Pure array
    HOFs + explode: no shuffle, no UDF; 100 TB runs at scan speed and
    the 1:N explode happens executor-side.

    Chunk i covers tokens [i*step, i*step + chunk_tokens) with
    step = chunk_tokens - overlap; the last chunk may be short, and a
    doc shorter than chunk_tokens yields exactly one chunk.
    Returns (doc_id, chunk_idx, chunk_text, n_tokens).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    nch = F.greatest(
        F.floor((n - F.lit(overlap) + F.lit(step - 1)) / F.lit(step))
        .cast("long"), F.lit(1).cast("long"))
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), nch - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, (i * step + 1).cast("int"),
                                     chunk_tokens)).alias("chunk_text"),
            F.least(F.lit(chunk_tokens).cast("long"),
                    n - i * step).alias("n_tokens")))
    return (docs.select("doc_id", F.explode(chunks).alias("c"))
            .select("doc_id", "c.chunk_idx", "c.chunk_text", "c.n_tokens"))


# PII patterns shared by Spark (Java regex) and the DuckDB oracle (RE2):
# character classes + greedy quantifiers only — no lookaround or
# backreferences, so both engines produce identical non-overlapping
# leftmost matches. Applied in order; each pass runs on the output of the
# previous one so the phone pattern never re-matches an already-masked IP.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("phone", r"\+?[0-9][0-9() .-]{6,}[0-9]", "<PHONE>"),
)


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Mask emails, IPv4 addresses, and phone-shaped digit runs; count
    each per document. Pure regexp_replace/regexp_count — JVM-side,
    whole-stage-codegen'd, scan-speed at 100 TB. Returns
    (doc_id, clean_text, n_email, n_ip, n_phone)."""
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return docs.select("doc_id", cur.alias("clean_text"), *counts)


# (pattern, replacement) chain for html_to_text — order matters: blocks
# first, then structural breaks, then any remaining tag, then entities.
HTML_STRIP_RULES = (
    # no backreferences — the patterns must stay RE2-safe so the DuckDB
    # oracle runs them verbatim (same constraint as PII_PATTERNS)
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)<(br|/p|/div|/li|/h[1-6]|/tr)\b[^>]*>", "\n"),
    (r"<[^>]+>", " "),
    # entity decode: &amp; LAST, else '&amp;lt;' double-decodes to '<'
    (r"&nbsp;", " "), (r"&lt;", "<"), (r"&gt;", ">"),
    (r"&quot;", "\""), (r"&#39;", "'"), (r"&amp;", "&"),
    (r"[ \t\x0b\f\r]+", " "),
    (r" ?\n ?", "\n"), (r"\n{2,}", "\n"),
    (r"^\s+|\s+$", ""),
)


def html_to_text(docs: DataFrame, html_col: str = "text") -> DataFrame:
    """Boilerplate-free text extraction from raw HTML — the first step
    of every web-crawl training pipeline (trafilatura/jusText shape,
    reduced to the deterministic core): drop script/style/comment
    blocks, turn structural closes into newlines, strip remaining tags,
    decode the common entities, normalize whitespace.

    Pure regexp_replace chain — JVM-side, whole-stage codegen,
    scan-speed at 100 TB, and reproducible in an external SQL oracle.
    Returns (doc_id, clean_text, n_tags_removed)."""
    cur = F.col(html_col)
    n_tags = F.regexp_count(cur, F.lit(r"<[^>]+>"))
    for pat, repl in HTML_STRIP_RULES:
        cur = F.regexp_replace(cur, pat, repl)
    return docs.select("doc_id", cur.alias("clean_text"),
                       n_tags.alias("n_tags_removed"))


def repetition_scores(docs: DataFrame, n: int = 3,
                      text_col: str = "text") -> DataFrame:
    """Repetitive-document signals (Gopher/C4-style quality filters):
    fraction of duplicate token n-grams and the most-frequent-token
    ratio. The token stream is never exploded into a shuffle (at 100 TB
    an explode + groupBy over tokens would shuffle the whole corpus).

    Tokens hash once JVM-side (xxhash64; per-doc collision probability
    ~len²/2⁶⁵, far below the oracle's double-compare resolution); the
    per-doc distinct/frequency math runs in a vectorized Arrow kernel —
    the same documented exception as the fingerprint/minhash kernels: a
    pure zip-shift HOF ladder is algorithmically right but Spark's
    interpreted lambda evaluator made this the most expensive text op
    at bench scale (1.5 s → the kernel more than halves it). Returns
    (doc_id, dup_ngram_frac, top_token_ratio); null text → null scores."""
    import pandas as pd

    toks = tokens(F.col(text_col))
    th = F.transform(toks, lambda x: F.xxhash64(x))
    nn = int(n)

    def _rep(sh):
        import numpy as np
        rows = []
        for arr in sh:
            if arr is None:
                rows.append((None, None))
                continue
            a = np.asarray(arr, dtype=np.int64)
            m = a.size
            if m == 0:
                rows.append((0.0, None))
                continue
            _, codes, counts = np.unique(a, return_inverse=True,
                                         return_counts=True)
            top = float(counts.max()) / m
            if m < nn:
                rows.append((0.0, top))
                continue
            v = int(counts.size)
            if v ** nn < (1 << 62):
                # mix n per-doc codes into one int64 key, base v — exact
                g = codes[:m - nn + 1].astype(np.int64).copy()
                for k in range(1, nn):
                    g = g * v + codes[k:m - nn + 1 + k]
                ndist = np.unique(g).size
            else:
                from numpy.lib.stride_tricks import sliding_window_view
                ndist = np.unique(sliding_window_view(codes, nn),
                                  axis=0).shape[0]
            ngrams = m - nn + 1
            rows.append((1.0 - ndist / ngrams, top))
        return pd.DataFrame(rows, columns=["dup_ngram_frac",
                                           "top_token_ratio"])

    _rep.__annotations__ = {"sh": pd.Series, "return": pd.DataFrame}
    rep = F.pandas_udf(
        _rep, "dup_ngram_frac double, top_token_ratio double")
    return docs.select("doc_id", rep(th).alias("_r")) \
               .select("doc_id", "_r.dup_ngram_frac", "_r.top_token_ratio")


def vocab_df(docs: DataFrame, top_k: int = 1000,
             text_col: str = "text") -> DataFrame:
    """Global vocabulary table: per-token total frequency (tf) and
    document frequency (df), top-K by tf — the corpus-level statistic a
    tokenizer-vocab build or an IDF-weighted quality scorer starts from.

    Scale shape: the ONLY per-token shuffle in the text stack, and it is
    intrinsic (a global count needs a global groupBy). The whole path
    stays in whole-stage codegen: explode + hash aggregate, where the
    map-side partial on (token, doc) already collapses each document's
    repeated tokens before the exchange — so the shuffle carries one row
    per (doc, DISTINCT token), never the raw token stream. (An in-row
    sort+run-collapse HOF variant was measured 40× SLOWER despite
    shuffling the same rows — Spark's interpreted lambda evaluator loses
    to codegen'd explode by far more than the exchange saves.) top-K
    sorts the (bounded) vocab table, not the corpus."""
    toks = tokens(F.col(text_col))
    # length-guard, not size-guard: split("") is [""], size 1 — an empty
    # doc would otherwise contribute an empty-string token
    ex = (docs.where(F.length(F.col(text_col)) > 0)
          .select("doc_id", F.explode(toks).alias("token")))
    agg = ex.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"))
    return (agg.orderBy(F.col("tf").desc(), "token").limit(top_k))


def lm_score(docs: DataFrame, top_k: int = 10_000, add_k: float = 0.5,
             text_col: str = "text") -> DataFrame:
    """Unigram language-model scoring — the CCNet/Gopher-style
    perplexity quality filter: fit an add-k-smoothed unigram LM on the
    corpus (top-``top_k`` vocabulary, everything else one OOV bucket)
    and score each document by mean bits per token
    −avg(log₂ p(t)). Low = fluent/common text, high = junk — the
    standard cut point for training-data curation.

    Scale shape: the LM fit reuses the vocab pass (explode + map-side
    partial → one shuffled row per (doc, distinct token); top-K sorts
    only the bounded vocab). Scoring joins the exploded token stream
    against the BROADCAST vocab (map-side, no shuffle) and the per-doc
    aggregation's map-side partial collapses to ~one exchanged row per
    document. The corpus token total N is the only driver scalar.
    Returns (doc_id, n_tokens, bits_per_token) for EVERY input row —
    null/empty-text documents score (0, null)."""
    toks = tokens(F.col(text_col))
    ex = (docs.where(F.length(F.col(text_col)) > 0)
          .select("doc_id", F.explode(toks).alias("token")))
    vocab = (ex.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
             .orderBy(F.col("tf").desc(), "token").limit(top_k))
    n_total = ex.count()                     # one scalar to the driver
    denom = float(n_total) + add_k * (top_k + 1)
    lp = F.log2((F.coalesce(F.col("tf"), F.lit(0)).cast("double")
                 + F.lit(add_k)) / F.lit(denom))
    scored = (ex.join(F.broadcast(vocab), "token", "left")
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   (-F.avg(lp)).alias("bits_per_token")))
    # emit EVERY input row: null/empty-text docs score (0, null) rather
    # than vanishing — callers join scores back to the corpus, where a
    # silently missing row reads as "not yet scored"
    return (docs.select("doc_id").join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("n_tokens"), F.lit(0).cast("long"))
                     .alias("n_tokens"),
                    F.col("bits_per_token")))


def lm_score_bigram(docs: DataFrame, top_k: int = 10_000,
                    top_k_bigrams: int = 50_000, add_k: float = 0.5,
                    alpha: float = 0.4,
                    text_col: str = "text") -> DataFrame:
    """Bigram language-model scoring with Stupid Backoff (Brants et
    al. 2007, "Large Language Models in Machine Translation" — the
    backoff scheme DESIGNED for distributed corpus-scale LMs): fit
    bigram counts on the corpus, score each token position by

        S(w|v) = c(v,w)/c(v)                 if (v,w) in the kept table
               = α · p_uni(w)                otherwise (backoff)

    with the first token scored by the add-k unigram p_uni (same model
    as ``lm_score``). Returns (doc_id, n_tokens, bits_per_token) —
    −avg log₂ S — for EVERY input row; null/empty text scores
    (0, null). A sharper fluency filter than the unigram score: word-
    salad with common words stays cheap under unigrams but expensive
    under bigrams.

    Scale shape: bigram counts explode zip-shifted pairs (map-side
    partial collapse before the exchange); the kept table is bounded at
    ``top_k_bigrams`` (deterministic tie-break count desc, then pair)
    and BROADCAST with c(v) folded in at fit time, so scoring is two
    broadcast joins over the token stream + one per-doc partial agg —
    the corpus shuffles ~one row per document."""
    toks = tokens(F.col(text_col))
    base = (docs.where(F.length(F.col(text_col)) > 0)
            .select("doc_id", toks.alias("t")))
    ex = base.select("doc_id", F.explode("t").alias("w"))
    uni = ex.groupBy("w").agg(F.count(F.lit(1)).alias("tf"))
    vocab = uni.orderBy(F.col("tf").desc(), "w").limit(top_k)
    n_total = ex.count()                     # one scalar to the driver
    denom = float(n_total) + add_k * (top_k + 1)

    n = F.size(F.col("t"))
    shift = F.slice(F.col("t"), 2, F.greatest(n - 1, F.lit(0)))
    head = F.slice(F.col("t"), 1, F.greatest(n - 1, F.lit(0)))
    pair_structs = F.zip_with(
        head, shift, lambda a, b: F.struct(a.alias("v"), b.alias("w")))
    bi_stream = (base.select("doc_id", F.explode(pair_structs)
                             .alias("p"))
                 .select("doc_id", F.col("p.v").alias("v"),
                         F.col("p.w").alias("w")))
    bi = (bi_stream.groupBy("v", "w")
          .agg(F.count(F.lit(1)).alias("c_vw"))
          .orderBy(F.col("c_vw").desc(), "v", "w")
          .limit(top_k_bigrams))
    # fold c(v) into the bounded table at fit time: one broadcast join
    # of 50k rows against the unigram counts, result still bounded
    bi2 = (F.broadcast(bi).join(
        uni.select(F.col("w").alias("v"), F.col("tf").alias("c_v")),
        "v"))

    first = base.select("doc_id", F.lit(None).cast("string").alias("v"),
                        F.element_at("t", 1).alias("w"))
    stream = first.unionByName(bi_stream)
    j = (stream.join(F.broadcast(bi2), ["v", "w"], "left")
         .join(F.broadcast(vocab), "w", "left"))
    p_uni = (F.coalesce(F.col("tf"), F.lit(0)).cast("double")
             + F.lit(add_k)) / F.lit(denom)
    lp = F.when(F.col("c_vw").isNotNull(),
                F.log2(F.col("c_vw").cast("double")
                       / F.col("c_v").cast("double"))) \
        .otherwise(F.log2(p_uni)
                   + F.when(F.col("v").isNull(), F.lit(0.0))
                      .otherwise(F.lit(float(_math.log2(alpha)))))
    scored = (j.groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   (-F.avg(lp)).alias("bits_per_token")))
    return (docs.select("doc_id").join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("n_tokens"), F.lit(0).cast("long"))
                     .alias("n_tokens"),
                    F.col("bits_per_token")))


def fingerprint(docs: DataFrame, window: int = 8,
                portable: bool = False) -> DataFrame:
    """Document fingerprint: rolling-hash winnowing — min hash over each
    window of token 3-shingles, distinct per doc. Used for robust
    near-duplicate candidate generation. `portable=True` swaps xxhash64
    for the md5-derived hash DuckDB can replicate (oracle checks)."""
    hasher = portable_hash64 if portable else F.xxhash64
    toks = tokens(F.col("text"))
    # shingle hashes from zip-shifted token arrays: toks appears only as
    # a TOP-LEVEL argument, never inside an element lambda — an outer
    # array referenced inside a lambda is re-evaluated per element in
    # Spark's interpreted HOF evaluator (the original slice-per-index
    # formulation was O(len³) per doc and took 92 s over sf0.1)
    t2 = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    t3 = F.slice(toks, 3, F.greatest(F.size(toks) - 2, F.lit(0)))
    pairs = F.zip_with(toks, t2, lambda a, b: F.concat_ws(" ", a, b))
    triples = F.zip_with(pairs, t3, lambda p, c: hasher(
        F.when(c.isNull(), p).otherwise(F.concat_ws(" ", p, c))))
    shingles = F.slice(
        triples, 1, F.greatest(F.size(toks) - 2, F.lit(1)))

    # sliding-window min + distinct in a vectorized pandas kernel — the
    # same documented exception as the minhash kernel. A pure zip-shift
    # HOF ladder is algorithmically right but each round duplicates the
    # whole upstream expression tree (no CSE in the interpreted
    # evaluator: 3 rounds re-evaluate the shingle stage 8×, measured
    # 17 s of the original 92 s); one Arrow round trip makes the min
    # O(len·w) in numpy and leaves the hash math JVM-side.
    import pandas as pd

    w = int(window)

    def _win_mins(sh):
        import numpy as np
        from numpy.lib.stride_tricks import sliding_window_view
        out = []
        for arr in sh:
            if arr is None:
                # null text → null shingles: propagate null like the
                # pure-HOF formulation did; one null doc must not kill
                # the whole scan
                out.append(None)
                continue
            a = np.asarray(arr, dtype=np.int64)
            if a.size == 0:
                out.append([])
                continue
            k = min(w, a.size)
            mins = sliding_window_view(a, k).min(axis=1)
            out.append(list(dict.fromkeys(mins.tolist())))
        return pd.Series(out)

    _win_mins.__annotations__ = {"sh": pd.Series, "return": pd.Series}
    win_mins = F.pandas_udf(_win_mins, "array<long>")

    return docs.select("doc_id",
                       win_mins(shingles).alias("fingerprints"))


def bow_classifier_score(docs: DataFrame, dim: int = 1024,
                         text_col: str = "text") -> DataFrame:
    """Hashed bag-of-words linear scorer — the fastText-style quality-
    filter shape used to rank web documents for training-data curation.

    Each token hashes into one of ``dim`` buckets (the hashing trick);
    the bucket weight here is a deterministic closed-form stand-in
    (a production model's weight vector would arrive as an array literal
    or broadcast dim — the plan shape is identical). Score = mean bucket
    weight in (-1, 1].

    Determinism: per-token weights are kept in a SCALED-INTEGER domain
    (m_t < 1,000,003; docs are < a few thousand tokens, so the int64 sum
    is exact and order-independent) and converted to double once at the
    end — the one shape where a Spark fold and a DuckDB list_sum agree
    bit-for-bit regardless of evaluation order. One in-row fold, no
    shuffle, scan speed.
    """
    toks = tokens(F.col(text_col))
    m = F.transform(
        toks,
        lambda t: (portable_hash64(t) % dim * 2654435761 + 104729)
        % 1000003)
    msum = F.aggregate(m, F.lit(0).cast("long"), lambda acc, v: acc + v)
    ntok = F.size(toks)
    score = (msum.cast("double") / ntok.cast("double") / 500001.5
             - F.lit(1.0))
    return docs.select("doc_id", ntok.alias("token_count"),
                       score.alias("bow_score"))


def pack_sequences(docs: DataFrame, context_len: int = 2048,
                   num_shards: int = 64,
                   text_col: str = "text") -> DataFrame:
    """Greedy sequence packing: place documents into fixed-length
    training context windows (bins) without splitting documents — the
    step that turns a filtered corpus into dense training examples.

    Docs are hash-sharded (portable 60-bit hash of doc_id mod
    `num_shards`) and packed greedily within each shard in doc_id
    order: a new bin opens whenever the next doc would overflow
    `context_len`. Docs longer than `context_len` are clamped and fill
    one bin alone. Returns the pointer table a loader joins back to the
    corpus: (doc_id, shard, bin_id, bin_offset, n_tok).

    Scale shape: greedy fill is inherently sequential, but only WITHIN
    a shard — shards are independent `applyInPandas` groups, so
    parallelism = `num_shards` (size it ~4× executor cores at 100 TB;
    bins never cross shards, so quality is unaffected). Only
    (doc_id, n_tok) longs shuffle — never text — and per-shard state is
    two scalars, so executor memory stays flat no matter the corpus.
    """
    shard = F.pmod(portable_hash64(F.col("doc_id").cast("string")),
                   F.lit(num_shards)).cast("int")
    n = F.least(F.size(tokens(F.col(text_col))), F.lit(context_len))
    narrow = docs.select("doc_id", shard.alias("shard"),
                         n.cast("long").alias("n_tok"))
    return pack_pointer_table(narrow, context_len)


def pack_pointer_table(narrow: DataFrame,
                       context_len: int) -> DataFrame:
    """The greedy per-shard fill core of :func:`pack_sequences`,
    reusable over ANY token-count definition: ``narrow`` is
    (doc_id, shard int, n_tok long) with n_tok already clamped to
    ``context_len``; docs pack greedily in doc_id order within each
    shard. → (doc_id, shard, bin_id, bin_offset, n_tok). Scale shape
    as documented on :func:`pack_sequences` (independent
    applyInPandas shard groups, longs-only shuffle, flat state)."""
    import numpy as np
    import pandas as pd

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        ns = pdf["n_tok"].to_numpy()
        bins = np.zeros(ns.size, dtype=np.int64)
        offs = np.zeros(ns.size, dtype=np.int64)
        b = fill = 0
        for i in range(ns.size):
            if fill + ns[i] > context_len:
                b += 1
                fill = 0
            bins[i], offs[i] = b, fill
            fill += ns[i]
        return pd.DataFrame({"doc_id": pdf["doc_id"],
                             "shard": pdf["shard"],
                             "bin_id": bins, "bin_offset": offs,
                             "n_tok": ns})

    return narrow.groupBy("shard").applyInPandas(
        _pack,
        "doc_id long, shard int, bin_id long, bin_offset long, n_tok long")


def bpe_token_vocab(docs: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = "text") -> list[str]:
    """The corpus's BPE token VOCABULARY under a pinned merge table,
    lexicographically sorted — token_id = list index (dense ids, the
    contract :func:`token_shard_bins` and its DuckDB oracle share).

    Scale shape: tokens are built from the DISTINCT-WORD table (the
    bpe_train trick — one corpus pass aggregates distinct words, BPE
    encodes only those), and the result is MODEL-sized, not
    corpus-sized: every BPE token is either a single character or the
    concatenation some merge rule produces, so |vocab| ≤ |alphabet| +
    |merges| regardless of corpus size — the driver collect here is
    bounded by the tokenizer, the same class as reading a centroid
    sidecar.

    A caller that ALSO needs the per-doc token arrays (the export
    path) should tokenize once with :func:`bpe_tokens_frame` and
    derive the vocab from the cached arrays via
    :func:`bpe_vocab_from_tokens` instead — same set (the token set
    over all word occurrences equals the set over distinct words),
    one corpus scan instead of two (r14)."""
    words = (docs.select(F.explode(tokens(
        F.coalesce(F.col(text_col), F.lit("")))).alias("w"))
        .where(F.col("w") != "").distinct())
    vtoks = (words.select(F.explode(
        F.expr(_bpe_word_sql("w", merges))).alias("token"))
        .where(F.col("token") != "").distinct())
    # bounded collect: |vocab| <= |alphabet| + |merges| (see above)
    return sorted(r.token for r in vtoks.collect())


def bpe_tokens_frame(docs: DataFrame, merges: list[tuple[str, str]],
                     num_shards: int,
                     text_col: str = "text") -> DataFrame:
    """ONE persisted corpus tokenize pass → (doc_id, shard int,
    __toks array<string> — the UNCLAMPED whole-document BPE token
    strings under :func:`token_shard_bins`'s md5 shard route).
    Shared by the vocab derivation (:func:`bpe_vocab_from_tokens`)
    and the bin assembly (``token_shard_bins(_tok=...)``) — r14,
    guide §1.2/§5: the export paid the |merges|×2-replace BPE chain
    over the corpus twice (distinct-words vocab pass + bins pass).
    Unclamped on purpose: the vocab must see tokens past
    ``context_len`` exactly as the distinct-words pass does."""
    from georiva_spark.operators._retention import persist_bounded
    bpe = F.expr(_bpe_tokens_sql(merges, text_col))
    shard = F.pmod(portable_hash64(F.col("doc_id").cast("string")),
                   F.lit(num_shards)).cast("int")
    return persist_bounded(
        docs.select("doc_id", shard.alias("shard"),
                    bpe.alias("__toks")),
        "token_shard_bins.tok")


def bpe_vocab_from_tokens(tok: DataFrame) -> list[str]:
    """:func:`bpe_token_vocab` off a :func:`bpe_tokens_frame` cache:
    sorted distinct tokens of the cached arrays. Identical set — the
    distinct-words pass encodes each distinct word once, the arrays
    hold every occurrence; distinct collapses them to the same
    model-sized vocabulary (|vocab| ≤ |alphabet| + |merges|), and the
    per-partition partial agg means the distinct shuffle moves at
    most |vocab| rows per map task."""
    vtoks = (tok.select(F.explode("__toks").alias("token"))
             .where(F.col("token") != "").distinct())
    return sorted(r.token for r in vtoks.collect())


def token_shard_bins(docs: DataFrame, merges: list[tuple[str, str]],
                     context_len: int = 2048, num_shards: int = 64,
                     text_col: str = "text",
                     vocab: list[str] | None = None,
                     strict_vocab: bool = False,
                     _tok: DataFrame | None = None) -> DataFrame:
    """Fixed-context TOKEN-ID training rows — the loader handoff a
    Megatron/GPT-style trainer mmaps: BPE-tokenize every document
    (:func:`bpe_encode_word`, pinned merges), map tokens to dense ids
    (:func:`bpe_token_vocab` order), clamp at ``context_len``, pack
    greedily into bins (:func:`pack_pointer_table` — docs never
    split, doc_id order within md5 shards; pass a precomputed
    ``vocab`` to skip the derivation — the export does, so it runs
    once), and assemble ONE ROW PER
    BIN: token ids concatenated in pack order and right-padded with
    ``pad_id = |vocab|`` to exactly ``context_len``, with document
    boundaries as offsets. → (shard int, bin_id long, doc_ids
    array<long>, doc_offsets array<long>, n_docs int, n_tokens int,
    token_ids array<int> — always length ``context_len``).

    ``strict_vocab`` (the delta-export setting, r11): a token the
    pinned ``vocab`` does not contain RAISES by name at execution —
    the alternative is a silent NULL id written into training shards.
    Off by default because a self-derived vocab is total by
    construction.

    Scale shape: tokenization + id mapping are in-row (the merge
    chain is literal replaces, the vocab a constant-folded literal
    map — model-sized by the |alphabet|+|merges| bound, the zonal
    broadcast class); the pack pointer shuffles (doc_id, n_tok) longs
    only; the single ids shuffle is the bin assembly join+group —
    token ids are the OUTPUT being materialized, so that shuffle is
    output-sized, paid once, and never carries text."""
    if context_len < 1:
        raise ValueError(
            f"token_shard_bins: context_len={context_len} must be "
            f">= 1")
    if _tok is None and vocab is None:
        # self-derived vocab: ONE tokenize pass serves the vocab AND
        # the bins (r14, guide §1.2/§5) — without the shared cache
        # this path scanned+BPE'd the corpus once for the
        # distinct-words vocab and again for the assembly
        _tok = bpe_tokens_frame(docs, merges, num_shards,
                                text_col=text_col)
    if vocab is None:
        vocab = bpe_vocab_from_tokens(_tok)
    pad_id = len(vocab)
    vmap = F.map_from_arrays(
        F.lit(vocab), F.lit(list(range(len(vocab)))))

    def to_id(t):
        i = F.element_at(vmap, t)
        if strict_vocab:
            i = F.when(i.isNull(), F.raise_error(F.concat(
                F.lit("token_shard_bins: token '"), t,
                F.lit("' is not in the pinned vocab — the corpus "
                      "drifted past the stamped tokenizer; rebuild "
                      "with export_token_shards (full) or retrain "
                      "the merges")))).otherwise(i)
        return i.cast("int")

    if _tok is not None:
        # ids from the cached token arrays: the clamp+map probe is
        # in-row JVM work over cached data — no BPE chain, no scan
        tok = _tok.select(
            "doc_id", "shard",
            F.transform(F.slice(F.col("__toks"), 1, context_len),
                        to_id).alias("__ids"))
    else:
        # pinned-vocab single consumer chain (the delta export): the
        # tokenized frame still feeds TWO consumers — the
        # pack-pointer branch (sizes only) and the bin-assembly join
        # (the ids) — and without a persist each evaluates the full
        # BPE merge chain over the corpus independently (r14, guide
        # §1.2 step 1 / §5). The cached frame is (doc_id, shard, int
        # ids) — token-count × 4 bytes, far narrower than re-running
        # |merges|×2 string replaces per word occurrence.
        from georiva_spark.operators._retention import persist_bounded
        bpe = F.expr(_bpe_tokens_sql(merges, text_col))
        ids = F.transform(F.slice(bpe, 1, context_len), to_id)
        shard = F.pmod(
            portable_hash64(F.col("doc_id").cast("string")),
            F.lit(num_shards)).cast("int")
        tok = persist_bounded(
            docs.select("doc_id", shard.alias("shard"),
                        ids.alias("__ids")),
            "token_shard_bins.tok")
    pointer = pack_pointer_table(
        tok.select("doc_id", "shard",
                   F.size("__ids").cast("long").alias("n_tok")),
        context_len)
    joined = pointer.join(tok.select("doc_id", "__ids"), "doc_id")
    packed = (joined.groupBy("shard", "bin_id")
              .agg(F.array_sort(F.collect_list(F.struct(
                  "bin_offset", "doc_id", "__ids"))).alias("__d")))
    flat = F.flatten(F.transform(F.col("__d"), lambda x: x["__ids"]))
    return packed.select(
        "shard", "bin_id",
        F.transform(F.col("__d"),
                    lambda x: x["doc_id"]).alias("doc_ids"),
        F.transform(F.col("__d"),
                    lambda x: x["bin_offset"]).alias("doc_offsets"),
        F.size("__d").cast("int").alias("n_docs"),
        F.size(flat).cast("int").alias("n_tokens"),
        F.concat(flat, F.array_repeat(
            F.lit(pad_id).cast("int"),
            F.lit(context_len) - F.size(flat))).alias("token_ids"))


def token_shard_pointer(docs: DataFrame,
                        merges: list[tuple[str, str]],
                        context_len: int = 2048,
                        num_shards: int = 64,
                        text_col: str = "text") -> DataFrame:
    """The pack-pointer table of the token-shard layout WITHOUT the
    token-id assembly — (doc_id, shard, bin_id, bin_offset, n_tok)
    under exactly :func:`token_shard_bins`'s shard route, clamp and
    greedy pack (n_tok = the clamped BPE token count, the same
    ``size(slice(bpe, 1, context_len))`` the bins path uses).

    r13 optimization: a manifest of COUNTS (bins / docs / tokens per
    shard) is fully determined by this pointer table — deriving it
    through :func:`token_shard_bins` additionally derives a vocab
    (an eager distinct-words scan + collect per call) and shuffles
    the materialized token-id arrays, none of which the counts need.
    One in-row scan plus the longs-only pack shuffle instead."""
    if context_len < 1:
        raise ValueError(
            f"token_shard_pointer: context_len={context_len} must be "
            f">= 1")
    bpe = F.expr(_bpe_tokens_sql(merges, text_col))
    shard = F.pmod(portable_hash64(F.col("doc_id").cast("string")),
                   F.lit(num_shards)).cast("int")
    narrow = docs.select(
        "doc_id", shard.alias("shard"),
        F.size(F.slice(bpe, 1, context_len)).cast("long")
        .alias("n_tok"))
    return pack_pointer_table(narrow, context_len)


def unknown_vocab_tokens(docs: DataFrame,
                         merges: list[tuple[str, str]],
                         vocab: list[str],
                         text_col: str = "text",
                         _tok: DataFrame | None = None) -> DataFrame:
    """BPE tokens of ``docs`` that a PINNED vocab does not cover —
    → (token, n_docs). The pre-flight check of the incremental
    token-shard export: finding drift BEFORE any shard file is
    appended beats a mid-write task failure. One in-row scan over
    the delta (distinct words → encode → probe the constant-folded
    vocab map), bounded output (≤ |alphabet|+|merges| novel
    tokens). ``_tok`` (a :func:`bpe_tokens_frame` cache) answers
    the probe off the cached arrays instead — the delta export
    shares one tokenize pass between this pre-flight and the bin
    assembly (r14; ``__toks`` holds the same non-empty flatten the
    inline chain builds, so the distinct unknown-token set is
    identical)."""
    vmap = F.map_from_arrays(
        F.lit(vocab), F.lit(list(range(len(vocab)))))
    unk = lambda t: ((t != F.lit(""))                     # noqa: E731
                     & F.element_at(vmap, t).isNull())
    if _tok is not None:
        src, bpe = _tok, F.array_distinct(
            F.filter(F.col("__toks"), unk))
    else:
        from georiva_spark.functions.fastexpr import ident
        src, bpe = docs, F.array_distinct(F.filter(
            F.expr(f"flatten(transform(split(coalesce("
                   f"{ident(text_col)}, ''), ' '), "
                   f"w -> {_bpe_word_sql('w', merges)}))"),
            unk))
    return (src.select(F.explode(bpe).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))


def canonicalize_url(url):
    """Canonical URL Column for URL-level dedup of a crawl corpus:
    lowercase scheme+host, strip the fragment, drop the default :80/:443
    port, remove utm_* / fbclid / gclid tracking parameters (fixing up
    the leftover separator), drop an empty trailing '?', and strip one
    trailing slash from a non-root path. Pure JVM regexp chain (RE2-safe
    patterns — no lookaround), so a 100-TB canonicalization runs inside
    whole-stage codegen with zero Python.
    """
    c = F.regexp_replace(url, r"#.*$", "")                 # fragment
    # lowercase the scheme://host[:port] prefix only
    head = F.lower(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*",
                                    0))
    tail = F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    c = F.concat(head, tail)
    # default ports are scheme-specific: only http:80 and https:443
    c = F.regexp_replace(c, r"^(http://[^/:?]*):80([/?]|$)", r"$1$2")
    c = F.regexp_replace(c, r"^(https://[^/:?]*):443([/?]|$)", r"$1$2")
    # trackers: first drop 'param=value&' occurrences keeping the lead
    # separator (twice — adjacent trackers leave a fresh match), then a
    # trailing '[?&]param=value'. This never touches a literal '&' in
    # the PATH (legal per RFC 3986), which the previous
    # strip-then-promote-'&'-to-'?' rewrite corrupted.
    tracker = r"(utm_[A-Za-z0-9_]*|fbclid|gclid)"
    for _ in range(2):
        c = F.regexp_replace(c, r"([?&])" + tracker + r"=[^&]*&", r"$1")
    c = F.regexp_replace(c, r"[?&]" + tracker + r"=[^&]*$", "")
    c = F.regexp_replace(c, r"(://[^/?]+/[^?]*?)/(\?|$)", r"$1$2")
    return c


def url_dedup(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-level dedup: canonicalize, then keep ONE document per
    canonical URL — the longest text wins, ties to the smallest doc_id
    (the common crawl-dedup policy: re-fetches and tracking-parameter
    variants collapse to the best capture). → (canonical_url,
    keep_doc_id, n_dups, max_chars).

    One hash-shuffle on the canonical URL; min_by/max_by keeps the
    reduction map-side partial — no window, no sort of the corpus.
    """
    canon = canonicalize_url(F.col(url_col))
    pick = F.struct(F.col("n_chars").alias("len"),
                    (-F.col("doc_id")).alias("nid"))
    return (docs.select(canon.alias("canonical_url"), "doc_id", "n_chars")
            .groupBy("canonical_url")
            .agg(F.max_by(F.col("doc_id"), pick).alias("keep_doc_id"),
                 F.count(F.lit(1)).alias("n_dups"),
                 F.max("n_chars").alias("max_chars")))


def _sql_str(s: str) -> str:
    """Exact SQL string literal: backslash-escape the parser's escape
    characters so the parsed value equals ``s`` byte for byte.
    Assumes (and asserts, memoized per session) the DEFAULT parser —
    under the legacy escapedStringLiterals conf these escapes would
    parse as raw backslashes and silently compute wrong values."""
    from georiva_spark.functions.fastexpr import check_parser_conf
    check_parser_conf()
    out = (s.replace("\\", "\\\\").replace("'", "\\'")
           .replace("\n", "\\n").replace("\r", "\\r")
           .replace("\t", "\\t"))
    return f"'{out}'"


def _bpe_word_sql(w_sql: str, merges: list[tuple[str, str]]) -> str:
    """:func:`bpe_encode_word` rendered as ONE SQL string (fastexpr
    policy): the merge chain is |merges|×2 nested ``replace`` calls,
    which cost one py4j round trip EACH through the Column API —
    ~86 ms of driver chatter per constructed chain, paid per recipe
    unit while executors idle. The parsed tree is operator-for-
    operator identical to the Column construction."""
    s = f"concat(' ', array_join(split({w_sql}, ''), ' '), ' ')"
    for a, b in merges:
        pat, rep = _sql_str(f" {a} {b} "), _sql_str(f" {a}{b} ")
        s = f"replace(replace({s}, {pat}, {rep}), {pat}, {rep})"
    return f"split(trim({s}), ' ')"


def _bpe_tokens_sql(merges: list[tuple[str, str]],
                    text_col: str = "text") -> str:
    """The shared whole-document BPE chain (tokenize → encode each
    word → flatten → drop empties) as one SQL string."""
    from georiva_spark.functions.fastexpr import ident
    toks = f"split(coalesce({ident(text_col)}, ''), ' ')"
    word = _bpe_word_sql("w", merges)
    return (f"filter(flatten(transform({toks}, w -> {word})), "
            f"t -> t != '')")


def bpe_encode_word(w, merges: list[tuple[str, str]]):
    """One word → its BPE token array under a pinned merge table —
    the shared encode core of :func:`bpe_apply` (counting) and
    :func:`token_shard_bins` (token-id materialization). Merge
    semantics documented on :func:`bpe_apply`."""
    # "abc" -> " a b c " with sentinel spaces so every pair is
    # bounded by spaces and merges can match at word edges
    s = F.concat(F.lit(" "),
                 F.array_join(F.split(w, ""), " "), F.lit(" "))
    for a, b in merges:
        pat, rep = F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
        s = F.replace(F.replace(s, pat, rep), pat, rep)
    return F.split(F.trim(s), " ")


def bpe_apply(docs: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text") -> DataFrame:
    """Byte-pair-encoding tokenization with a PINNED merge table — the
    real greedy-merge procedure (Sennrich et al. 2016), not a regex
    approximation: each whitespace word is exploded to space-separated
    characters, then every merge (a, b) — in rank order — rewrites
    ' a b ' → ' ab ' across the word. String replace applies
    left-to-right on non-overlapping occurrences (the greedy BPE
    tiebreak within a rank); each merge runs TWICE because a match
    consumes its trailing space, which otherwise skips the second of
    two back-to-back occurrences (' a b a b ') that true
    re-scan-after-merge BPE would also fold. → (doc_id, n_tokens,
    n_bpe_tokens, bpe_preview).

    Scale shape: the merge chain compiles to |merges| nested literal
    `replace` expressions inside ONE transform() lambda — in-row, zero
    shuffle, zero Python, whole-stage codegen; tokenizing 100 TB is a
    pure scan. A production 32k-merge vocab would switch the inner loop
    to a broadcast trie in a pandas_udf; the pinned-merges path is the
    oracle-checkable core.
    """
    from georiva_spark.functions.fastexpr import ident
    toks = tokens(F.col(text_col))
    bpe = F.expr(f"flatten(transform(split({ident(text_col)}, ' '), "
                 f"w -> {_bpe_word_sql('w', merges)}))")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.array_join(F.slice(bpe, 1, 12), "|").alias("bpe_preview"))


def gopher_rules(docs: DataFrame, *, min_words: int = 50,
                 max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_ratio: float = 0.9,
                 min_stopword_hits: int = 2,
                 text_col: str = "text") -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021, arXiv:2112.11446
    §A1.1): the published heuristic battery pretraining pipelines apply
    before model-based filtering. Emits one boolean per rule plus the
    conjunction, so downstream can audit WHICH rule dropped a document
    (the paper's thresholds are the defaults). → (doc_id, n_words,
    mean_word_len, symbol_ratio, bullet_ratio, stopword_hits,
    rule_* booleans, gopher_pass).

    Pure in-row HOF/regexp expressions — scan speed, zero shuffle,
    whole-stage codegen; null text fails all rules (gopher_pass false)
    rather than erroring.
    """
    # split on ANY whitespace run — gopher_rules explicitly targets
    # multi-line documents (the bullet rule), where single-space
    # tokenization would merge words across newlines and the
    # single-space-join length identity would count '\n' as word chars.
    # The whole battery renders as SQL strings (fastexpr policy): the
    # Column-API construction cost ~70 py4j round trips (~0.28 s of
    # driver chatter) per call, paid once per recipe UNIT in the
    # corpus engine chains while executors idle.
    from georiva_spark.functions.fastexpr import dlit, ident
    ws_re = _sql_str(r"\s+")
    dots_re = _sql_str(r"\.\.\.")
    nl_re = _sql_str("\n")
    t = ident(text_col)
    toks = f"filter(split({t}, {ws_re}), t -> t != '')"
    nw = f"size({toks})"
    mean_wl = (f"(CAST(aggregate({toks}, 0, "
               f"(acc, t) -> acc + length(t)) AS DOUBLE) / "
               f"greatest({nw}, 1))")
    # symbol-to-word ratio per the paper: '#' and '...' occurrences
    nsym = (f"(regexp_count({t}, '#') + "
            f"regexp_count({t}, {dots_re}))")
    symr = f"CAST(({nsym} / greatest({nw}, 1)) AS DOUBLE)"
    lines = f"split({t}, {nl_re}, -1)"
    nbullet = (f"size(filter({lines}, ln -> "
               f"startswith(ln, '- ') OR startswith(ln, '* ') "
               f"OR startswith(ln, {_sql_str('• ')})))")
    bulr = f"CAST(({nbullet} / greatest(size({lines}), 1)) AS DOUBLE)"
    stoplist = ", ".join(_sql_str(s) for s in STOPWORDS)
    nstop = f"size(filter({toks}, t -> t IN ({stoplist})))"

    r_words = f"(({nw} >= {int(min_words)}) AND ({nw} <= {int(max_words)}))"
    r_wl = (f"(({mean_wl} >= {dlit(min_mean_word_len)}) AND "
            f"({mean_wl} <= {dlit(max_mean_word_len)}))")
    r_sym = f"({symr} <= {dlit(max_symbol_ratio)})"
    r_bul = f"({bulr} <= {dlit(max_bullet_ratio)})"
    r_stop = f"({nstop} >= {int(min_stopword_hits)})"
    passed = (f"coalesce(({r_words} AND {r_wl} AND {r_sym} AND "
              f"{r_bul} AND {r_stop}), false)")
    return docs.selectExpr(
        "doc_id", f"{nw} AS n_words",
        f"{mean_wl} AS mean_word_len",
        f"{symr} AS symbol_ratio",
        f"{bulr} AS bullet_ratio",
        f"{nstop} AS stopword_hits",
        f"coalesce({r_words}, false) AS rule_word_count",
        f"coalesce({r_wl}, false) AS rule_word_len",
        f"coalesce({r_sym}, false) AS rule_symbols",
        f"coalesce({r_bul}, false) AS rule_bullets",
        f"coalesce({r_stop}, false) AS rule_stopwords",
        f"{passed} AS gopher_pass")


def c4_rules(docs: DataFrame, *, min_words_per_line: int = 5,
             min_sentences: int = 3, text_col: str = "text") -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020, arXiv:1910.10683
    §2.2) — the line- and page-level rules behind the C4 corpus,
    complementing the Gopher battery:

    line level (a line survives iff ALL hold):
      * ends in terminal punctuation (``. ! ? "``),
      * has at least ``min_words_per_line`` words (paper: 5... the
        paper phrases it as 3-word lines dropped; threshold is a knob),
      * does not mention "javascript" (boilerplate warning lines);
    page level: drop the page if it contains "lorem ipsum" or a curly
    brace (code), or if fewer than ``min_sentences`` sentences survive.

    → (doc_id, n_lines, n_kept, n_sentences, has_lorem, has_brace,
    kept_chars, c4_pass). Pure in-row HOF/regexp expressions — scan
    speed, zero shuffle, whole-stage codegen; null text fails closed.
    """
    col = F.col(text_col)
    lines = F.split(col, "\n", -1)

    def _keep(ln):
        t = F.trim(ln)
        words = F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))
        return (t.rlike('[.!?"]$')
                & (F.size(words) >= min_words_per_line)
                & ~F.lower(t).contains("javascript"))

    kept = F.filter(lines, _keep)
    kept_text = F.array_join(kept, "\n")
    n_sent = F.regexp_count(kept_text, F.lit(r"[.!?]"))
    has_lorem = F.lower(col).contains("lorem ipsum")
    has_brace = col.contains("{")
    c4_pass = F.coalesce((F.size(kept) > 0) & (n_sent >= min_sentences)
                         & ~has_lorem & ~has_brace, F.lit(False))
    return docs.select(
        "doc_id", F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"), n_sent.alias("n_sentences"),
        F.coalesce(has_lorem, F.lit(False)).alias("has_lorem"),
        F.coalesce(has_brace, F.lit(False)).alias("has_brace"),
        F.length(kept_text).alias("kept_chars"),
        c4_pass.alias("c4_pass"))


def linear_quality_score(docs: DataFrame, weights: list[float],
                         bias: float = 0.0, *, use_bigrams: bool = True,
                         threshold: float = 0.5, portable: bool = False,
                         text_col: str = "text") -> DataFrame:
    """fastText-architecture linear text classifier (Joulin et al. 2016,
    arXiv:1607.01759) with PINNED weights — the model-based quality
    filter shape (DCLM / fineweb-edu style) that follows the heuristic
    batteries: features are hashed unigrams (+ word bigrams), each
    feature looks up a scalar weight in a fixed ``len(weights)``-bucket
    table, and the document score is sigmoid(bias + mean of feature
    weights). Training happens offline; scoring at 100 TB is the hot
    path and runs as explode → codegen'd hash/modulo/literal-array
    lookup → per-doc partial aggregate: the map-side partial collapses
    the feature stream to ~one exchanged row per document (the in-row
    ``F.aggregate`` fold measured 7× slower at 2M docs, 36 s → 5.3 s —
    Spark evaluates HOF lambdas interpreted, the same lesson as vocab/
    fingerprints). The default bucket hash is xxhash64 (JVM-fast);
    ``portable=True`` swaps in the md5-derived hash so bucket
    assignment is bit-identical in the DuckDB oracle (the fingerprint/
    minhash dual-hash policy).
    → (doc_id, n_features, score, keep); null text → (0, null, false).
    """
    nb = len(weights)
    hasher = portable_hash64 if portable else F.xxhash64
    toks = tokens(F.col(text_col))
    feats = toks
    if use_bigrams:
        n = F.size(toks)
        bi = F.zip_with(F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
                        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                        lambda a, b: F.concat(a, F.lit(" "), b))
        feats = F.concat(toks, bi)
    wlit = F.array(*[F.lit(float(w)) for w in weights])
    ex = (docs.where(F.col(text_col).isNotNull())
          .select("doc_id", F.explode(feats).alias("g")))
    wcol = F.element_at(wlit, (F.pmod(hasher(F.col("g")), F.lit(nb))
                               + 1).cast("int"))
    scored = (ex.groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_features"),
                   F.sum(wcol).alias("wsum")))
    z = F.lit(float(bias)) + F.col("wsum") / \
        F.greatest(F.col("n_features"), F.lit(1))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (docs.select("doc_id").join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("n_features"),
                               F.lit(0).cast("long"))
                     .alias("n_features"),
                    score.alias("score"),
                    F.coalesce(score >= threshold, F.lit(False))
                     .alias("keep")))


def _bpe_train_driver(word_rows, n_merges: int):
    """In-memory BPE merge loop over the aggregated (cnt, sym) word
    table — the post-corpus-pass phase every published BPE trainer runs
    single-node (Sennrich's learn_bpe, HF tokenizers). Semantics are
    IDENTICAL to the distributed loop: overlapping adjacent-pair counts
    weighted by word frequency, ties broken by lexicographically
    smallest pair, left-to-right non-overlapping replacement (the
    double str.replace catches even-length runs exactly like the Spark
    double F.replace). Incremental: a pair→word-ids index confines each
    round to the words actually containing the merged pair; argmax is
    an O(pairs) scan per round (fine for the gated sizes — a 32k-merge
    production run at the gate boundary would want a heap)."""
    from collections import Counter, defaultdict

    words = [[cnt, sym] for cnt, sym in word_rows]
    pair_counts: Counter = Counter()
    occ = defaultdict(set)

    def pairs_of(sym):
        t = sym.split()
        return [f"{a} {b}" for a, b in zip(t, t[1:])]

    for i, (cnt, sym) in enumerate(words):
        for p in pairs_of(sym):
            pair_counts[p] += cnt
            occ[p].add(i)
    merges = []
    for rank in range(n_merges):
        live = [kv for kv in pair_counts.items() if kv[1] > 0]
        if not live:
            break
        best, total = min(live, key=lambda kv: (-kv[1], kv[0]))
        left, right = best.split(" ")
        merges.append((rank, left, right, int(total)))
        pat = f" {left} {right} "
        rep = f" {left}{right} "
        for i in list(occ.get(best, ())):
            cnt, sym = words[i]
            if pat not in sym:       # stale index entry
                occ[best].discard(i)
                continue
            for p in pairs_of(sym):
                pair_counts[p] -= cnt
            new_sym = sym.replace(pat, rep).replace(pat, rep)
            words[i][1] = new_sym
            for p in pairs_of(new_sym):
                pair_counts[p] += cnt
                occ[p].add(i)
    return merges


def bpe_train(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text",
              max_driver_words: int = 2_000_000) -> DataFrame:
    """LEARN a BPE merge table from the corpus (Sennrich et al. 2016) —
    the tokenizer-training counterpart of bpe_apply. Each round counts
    adjacent symbol pairs corpus-wide, picks the most frequent (ties →
    lexicographically smallest pair), and merges it everywhere.
    → (rank, left, right, pair_count).

    Scale shape: training runs on the DISTINCT-WORD table weighted by
    word frequency (the standard trick) — one distributed corpus pass
    builds the word-count table; that pass is the 100-TB part. The
    merge loop itself operates on the VOCABULARY, which is size-gated
    (r5, same pattern as the zonal mask broadcast): at ≤
    ``max_driver_words`` distinct words (default 2M ≈ tens of MB) the
    aggregated table collects to the driver and the loop runs
    in-memory — exactly where Sennrich's learn_bpe and HF tokenizers
    run it — eliminating the per-round Spark job latency that
    dominated at small scale. Beyond the gate, the distributed
    incremental loop (r3 verdict item 8) takes over: the pair table
    is built once, each round recounts only the words actually
    CONTAINING the merged pair (one-pass signed delta folded into the
    running totals' shuffle), and counts+state ride ONE tagged
    localCheckpoint per round (two bounded driver actions: argmax head
    + checkpoint; the checkpoint also keeps the logical plan
    constant-size). Both paths produce the same merge table
    bit-for-bit (pytest parity). Pair occurrences count overlapping
    positions ('aaa' → (a,a) twice) and merges apply left-to-right per
    rank — both the published algorithm's semantics.
    """
    spark = docs.sparkSession
    words = (docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
             .where(F.col("w") != "")
             .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))
    state = words.select(
        "cnt",
        F.concat(F.lit(" "),
                 F.array_join(F.split(F.col("w"), ""), " "),
                 F.lit(" ")).alias("sym")).persist()
    n_words = state.count()
    if n_words <= max_driver_words:
        rows = [(r.cnt, r.sym) for r in state.collect()]
        state.unpersist()
        from georiva_spark.functions.frames import local_frame
        return local_frame(
            spark, _bpe_train_driver(rows, n_merges),
            "rank int, left string, right string, pair_count long")
    # checkpoint partition count scales with the VOCABULARY size, not
    # the cluster: the per-round tables are one row per distinct word
    # (plus pairs), so near the gate a handful of partitions beats
    # defaultParallelism (~100 near-empty tasks per round was most of
    # the round latency), while a 10M-word web vocabulary still fans
    # out to every core.
    npart = int(max(1, min(spark.sparkContext.defaultParallelism,
                           n_words // 50_000 + 1)))

    def pair_arr(symcol):
        syms = F.split(F.trim(symcol), " ")
        t2 = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
        return F.filter(
            F.zip_with(syms, t2,
                       lambda a, b: F.when(
                           b.isNull(), F.lit(None)).otherwise(
                           F.concat(a, F.lit(" "), b))),
            lambda p: p.isNotNull())

    counts = (state.select("cnt", F.explode(pair_arr(F.col("sym")))
                           .alias("p"))
              .groupBy("p").agg(F.sum("cnt").alias("total"))).persist()
    counts.count()
    pinned = [state, counts]   # the cached objects to release
    merges = []
    try:
        for rank in range(n_merges):
            top = (counts.orderBy(F.desc("total"), F.asc("p")).head())
            if top is None or top.total <= 0:
                break
            left, right = top.p.split(" ")
            merges.append((rank, left, right, int(top.total)))
            pat = f" {left} {right} "
            rep = f" {left}{right} "
            hit = F.col("sym").contains(pat)
            affected = state.where(hit)
            new_sym = F.replace(
                F.replace(F.col("sym"), F.lit(pat), F.lit(rep)),
                F.lit(pat), F.lit(rep))
            rewritten = affected.select("cnt", new_sym.alias("sym"))
            # before/after delta in ONE pass over the affected words:
            # the rewritten symbol's pairs (+cnt) and the old symbol's
            # pairs (−cnt) concatenate in-row and explode once; the
            # running totals then fold into the SAME shuffle as the
            # delta rows (r5: union-aggregate replaces the r4
            # full_outer join — one shuffle per round, one scan of the
            # affected set instead of two)
            signed = F.concat(
                F.transform(pair_arr(new_sym),
                            lambda q: F.struct(
                                F.col("cnt").alias("w"),
                                q.alias("p"))),
                F.transform(pair_arr(F.col("sym")),
                            lambda q: F.struct(
                                (-F.col("cnt")).alias("w"),
                                q.alias("p"))))
            delta_rows = (affected.select(F.explode(signed).alias("sp"))
                          .select("sp.w", "sp.p"))
            new_counts = (counts.select("p", F.col("total").alias("w"))
                          .unionByName(delta_rows.select("w", "p"))
                          .groupBy("p").agg(F.sum("w").alias("total"))
                          .where(F.col("total") > 0))
            new_state = state.where(~hit).unionByName(rewritten)
            # ONE localCheckpoint EVERY round (r5: the two per-table
            # checkpoints are fused — counts and state are tagged and
            # unioned so a single job materializes both; they are
            # re-split with cheap cached-side filters). The checkpoint
            # is load-bearing twice over: the union/join plan
            # references the previous round's plan twice, so without
            # truncation the logical plan doubles per round
            # (exponential analysis cost by round ~15), and the
            # coalesce pins the partition count (union sums its
            # inputs' partitions — measured 8192 tasks by round 7
            # without it).
            comb = (new_counts
                    .select(F.lit(True).alias("isc"),
                            F.col("p").alias("s"),
                            F.col("total").alias("v"))
                    .unionByName(
                        new_state.select(F.lit(False).alias("isc"),
                                         F.col("sym").alias("s"),
                                         F.col("cnt").alias("v")))
                    .coalesce(npart).localCheckpoint())
            for d in pinned:
                d.unpersist()
            pinned = [comb]
            counts = comb.where(F.col("isc")).select(
                F.col("s").alias("p"), F.col("v").alias("total"))
            state = comb.where(~F.col("isc")).select(
                F.col("v").alias("cnt"), F.col("s").alias("sym"))
    finally:
        for d in pinned:
            d.unpersist()
    from georiva_spark.functions.frames import local_frame
    return local_frame(
        spark, merges,
        "rank int, left string, right string, pair_count long")


def duplicate_spans(docs: DataFrame, n: int = 5, min_docs: int = 2,
                    text_col: str = "text") -> DataFrame:
    """Exact duplicated-substring spans (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499 — at
    n-gram granularity): every token position covered by an n-gram that
    occurs in ≥ ``min_docs`` DISTINCT documents, merged into maximal
    spans → (doc_id, span_start, span_end, n_tokens). Downstream can
    cut the spans out of the corpus (the paper's ExactSubstr policy).

    Scale shape: in-row n-gram hashing (portable 60-bit, never the
    text); the (gram, doc_id, pos) table is persisted ONCE and feeds
    both branches (no 2× recompute of the explode lineage). Document
    frequency is a two-level aggregation — groupBy(gram, doc_id) then
    groupBy(gram).count(), both with map-side partial combine — so a
    boilerplate gram occurring in millions of documents spreads over
    doc_id in level 1 and collapses to ≤1 row per upstream partition
    in level 2; there is NO window over the gram partition (a window
    partition cannot be split by AQE — the r4 shape put every
    occurrence of a hot gram through one task's sort). The join back
    to positions is gram-keyed and AQE-skew-splittable (and AQE
    broadcasts the duplicated-gram side when it is small). The span
    merge is island detection over sorted positions, state bounded by
    one document. Every shuffled row is (hash, id, pos) longs."""
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    # n-gram strings via ZIP-SHIFTED arrays (arrays only ever top-level
    # HOF args — a slice-per-index transform re-evaluates the upstream
    # array per element in the interpreted evaluator: measured 3.3 s →
    # 0.4 s at sf0.1); hashing happens AFTER the explode, where md5 is
    # whole-stage codegen over rows, not an interpreted lambda
    s = toks
    for k in range(1, n):
        tk = F.slice(toks, k + 1,
                     F.greatest(F.size(toks) - k, F.lit(0)))
        s = F.zip_with(
            s, tk, lambda a, b: F.when(
                b.isNull() | a.isNull(), F.lit(None)
            ).otherwise(F.concat_ws(" ", a, b)))
    gram_strs = F.slice(
        s, 1, F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0)))
    from pyspark import StorageLevel

    from georiva_spark.operators._retention import persist_bounded

    g = persist_bounded(
        docs.select("doc_id",
                    F.posexplode(gram_strs).alias("pos", "gs"))
        .select("doc_id", "pos",
                portable_hash64(F.col("gs")).alias("gram")),
        "duplicate_spans.g", StorageLevel.MEMORY_AND_DISK)
    # document frequency via two-level aggregation over the persisted g
    # (persist = both branches read the explode output once, like the
    # minhash signature table). groupBy(gram, doc_id) distributes a hot
    # gram across doc_id; groupBy(gram) sees ≤1 row per (gram, doc) and
    # partial-combines, so no single task ever sorts a boilerplate
    # gram's full occurrence list (the r4 window-on-gram did — a window
    # partition is un-splittable by AQE).
    dup_grams = (g.groupBy("gram", "doc_id").agg(F.count(F.lit(1)))
                 .groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
                 .where(F.col("df") >= min_docs)
                 .select("gram"))
    hits = (g.join(dup_grams, "gram", "inner")
            .select("doc_id", "pos"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") > F.lag("pos").over(w) + n,
                 1).otherwise(0)
    run = Window.partitionBy("doc_id").orderBy("pos") \
        .rowsBetween(Window.unboundedPreceding, 0)
    return (hits.withColumn("brk", brk)
            .withColumn("grp", F.sum("brk").over(run))
            .groupBy("doc_id", "grp")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + F.lit(n - 1)).alias("span_end"))
            .select("doc_id", "span_start", "span_end",
                    (F.col("span_end") - F.col("span_start") + 1)
                    .alias("n_tokens")))

def bm25_topk(docs: DataFrame, queries: list[tuple[int, list[str]]],
              k: int = 10, k1: float = 1.2, b: float = 0.75,
              text_col: str = "text") -> DataFrame:
    """BM25 retrieval: score every document against each query's term
    set and keep the top-``k`` docs per query → (query_id, doc_id,
    rank, score). The Lucene/Okapi form: idf = ln(1 + (N−df+0.5)/
    (df+0.5)), per-term contribution idf·tf·(k1+1)/(tf + k1·(1−b+
    b·dl/avgdl)) — the retrieval stage of a RAG/quality-mining
    pipeline over the corpus.

    Scale shape: the query term set is a broadcast literal, so the
    exploded token stream is filtered to matching terms MAP-SIDE
    before anything shuffles — the only corpus-sized exchanges are the
    (doc, term) tf partial and the (query, doc) score partial, both
    map-side-combined. Document frequency is computed on the matched
    stream only (≤ |terms| rows, broadcast back), and N / avgdl are the
    two driver scalars, same policy as lm_score's token total. The
    final top-k windows each query's candidate list, never the corpus.
    """
    toks = tokens(F.col(text_col))
    qterms = sorted({t for _, ts in queries for t in ts})
    lens = (docs.where(F.length(F.col(text_col)) > 0)
            .select("doc_id", F.size(toks).alias("dl")))
    stats = lens.agg(F.count(F.lit(1)).alias("n"),
                     F.avg("dl").alias("avgdl")).head()
    n_docs, avgdl = int(stats.n), float(stats.avgdl)

    ex = (docs.where(F.length(F.col(text_col)) > 0)
          .select("doc_id", F.explode(toks).alias("term"))
          .where(F.col("term").isin(qterms)))
    tf = ex.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"))
    df = ex.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df")
                              + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))

    from georiva_spark.functions.frames import local_frame
    qdf = local_frame(
        docs.sparkSession,
        [(qid, t) for qid, ts in queries for t in ts],
        "query_id int, term string")
    contrib = (F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
               / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
                  + F.lit(b) * F.col("dl").cast("double")
                  / F.lit(avgdl))))
    scored = (tf.join(F.broadcast(df.select("term", idf.alias("idf"))),
                      "term")
              .join(F.broadcast(qdf), "term")
              .join(lens, "doc_id")
              .groupBy("query_id", "doc_id")
              .agg(F.sum(contrib).alias("s")))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "doc_id", F.col("rank").cast("long")
                    .alias("rank"), F.round("s", 4).alias("score")))

def train_linear_classifier(docs: DataFrame, label: Column,
                            dims: int = 64, iters: int = 2,
                            lr: float = 1.0,
                            text_col: str = "text"):
    """Distributed logistic-regression TRAINING over hashed
    bag-of-words features — the fit step behind a fastText-style
    quality filter, run ON the cluster (the scoring op,
    fasttext_score, assumes weights "trained elsewhere"; this trains
    them). Full-batch gradient descent: w ← w − lr·Xᵀ(σ(Xw) − y)/n.

    Determinism: features are portable-hashed token buckets
    (portable_hash64 % dims, + a bias column), weights start at 0, and
    every step is closed-form double arithmetic — an external SQL
    engine replays the rounds to ~1e-15.

    Scale shape: the long-form feature table (doc, bucket, tf/len) is
    built once and persisted (ONE token shuffle — the vocab-pass
    shape); each iteration joins the 65-row weight vector in-row via a
    literal array lookup (map-side, no weight shuffle), reduces scores
    per doc and gradients per bucket with map-side partials, and only
    the dims+1 gradient reaches the driver — model state is bounded
    like kmeans_fit's centroids. Returns (weights, scored) where
    scored = (doc_id, prob σ(x·w) after ``iters`` updates)."""
    from pyspark import StorageLevel

    toks = tokens(F.col(text_col))
    base = docs.where(F.length(F.col(text_col)) > 0)
    ex = base.select("doc_id", F.explode(toks).alias("t"))
    bucket = F.pmod(portable_hash64(F.col("t")), F.lit(dims)).cast("int")
    dl = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    f0 = (ex.select("doc_id", bucket.alias("j"))
          .groupBy("doc_id", "j").agg(F.count(F.lit(1)).alias("c")))
    feats = (f0.join(dl, "doc_id")
             .select("doc_id", "j", (F.col("c").cast("double")
                                     / F.col("n")).alias("x"))
             .unionByName(dl.select(
                 "doc_id", F.lit(dims).alias("j"),
                 F.lit(1.0).alias("x"))))
    from georiva_spark.operators._retention import persist_bounded
    feats = persist_bounded(feats, "train_linear_classifier.feats",
                            StorageLevel.MEMORY_AND_DISK)
    # the label frame joins into EVERY epoch's residual — uncached it
    # re-scans the corpus once per iteration (r14, guide §1.2/§5: the
    # feats persist policy applied to the other per-epoch input); the
    # cached frame is (doc_id, y) — two scalars per doc. n_docs off
    # the cached frame both saves the extra corpus count scan and
    # materializes the cache before the epoch loop.
    ydf = persist_bounded(
        base.select("doc_id", label.cast("double").alias("y")),
        "train_linear_classifier.ydf", StorageLevel.MEMORY_AND_DISK)
    n_docs = ydf.count()

    def scores(w):
        from georiva_spark.functions import fastexpr
        wj = F.element_at(F.expr(fastexpr.darr(w)), F.col("j") + 1)
        return (feats.select("doc_id", (F.col("x") * wj).alias("wx"))
                .groupBy("doc_id").agg(F.sum("wx").alias("s")))

    w = [0.0] * (dims + 1)
    for _ in range(iters):
        resid = (scores(w).join(ydf, "doc_id")
                 .select("doc_id",
                         (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s")))
                          - F.col("y")).alias("r")))
        grad = (feats.join(resid, "doc_id")
                .groupBy("j")
                .agg((F.sum(F.col("x") * F.col("r"))
                      / F.lit(float(n_docs))).alias("g"))
                .collect())
        for row in grad:
            w[row.j] -= lr * float(row.g)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s")))
    return w, scores(w).select("doc_id", prob.alias("prob"))


def corpus_stats(docs: DataFrame, dims: tuple = ("lang", "source"),
                 text_col: str = "text") -> DataFrame:
    """Corpus DATACARD rollup — the composition table every released
    training set ships (per-language / per-source document and token
    counts, e.g. the composition tables of LLaMA / The Pile / ROOTS):
    ONE pass over the corpus aggregates doc count, whitespace-token
    sum, char sum, and mean doc length for every CUBE combination of
    ``dims`` (each dim alone, together, and the grand total). Rollup
    cells print ``<all>`` so a genuine NULL stratum stays
    distinguishable from the aggregate row (F.grouping disambiguates
    — a bare NULL would conflate the two).

    Scale shape: `cube` is ONE shuffle with map-side partial
    aggregation — each map task ships ≤ 2^|dims| partial rows per
    observed group, the output is bounded by the stratum-combination
    count (languages × sources), and the mean is ONE exact division
    of the two integer aggregates (never a float fold, and never
    rounded — identical operands give bit-identical IEEE quotients in
    any engine, where rounding would re-introduce .5-boundary
    divergence)."""
    ntok = F.when(F.col(text_col).isNull()
                  | (F.length(F.trim(F.col(text_col))) == 0), F.lit(0)) \
            .otherwise(F.size(F.split(F.trim(F.col(text_col)),
                                      r"\s+"))).cast("long")
    nchr = F.coalesce(F.length(text_col).cast("long"), F.lit(0))
    base = docs.withColumn("__ct_nt", ntok).withColumn("__ct_nc", nchr)
    markers = [F.when(F.grouping(d) == 1, F.lit("<all>"))
               .otherwise(F.col(d).cast("string")).alias(f"__m_{d}")
               for d in dims]
    g = base.cube(*dims).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__ct_nt").cast("long").alias("sum_tokens"),
        F.sum("__ct_nc").cast("long").alias("sum_chars"),
        *markers)
    return g.select(
        *[F.col(f"__m_{d}").alias(d) for d in dims],
        "n_docs", "sum_tokens", "sum_chars",
        (F.col("sum_tokens").cast("double") / F.col("n_docs"))
        .alias("avg_doc_tokens"))
