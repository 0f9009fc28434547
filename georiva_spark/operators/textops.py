"""Text-analysis operators over the documents table (north-star LLM-data
ops): tokenization, quality scoring, language ID, fingerprinting.

Everything on the hot path is built-in `pyspark.sql.functions` (split,
higher-order array fns, hashing) — whole-stage-codegen'd, no Python UDFs,
so a 100 TB documents table runs at scan speed.
"""

from __future__ import annotations

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


def fingerprint(docs: DataFrame, window: int = 8,
                portable: bool = False) -> DataFrame:
    """Document fingerprint: rolling-hash winnowing — min hash over each
    window of token 3-shingles, distinct per doc. Used for robust
    near-duplicate candidate generation. `portable=True` swaps xxhash64
    for the md5-derived hash DuckDB can replicate (oracle checks)."""
    hasher = portable_hash64 if portable else F.xxhash64
    toks = tokens(F.col("text"))
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0))),
        lambda i: hasher(F.concat_ws(" ", F.slice(toks, i + 1, 3))))
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(shingles) - window, F.lit(0))),
        lambda i: F.array_min(F.slice(shingles, i + 1, window)))
    return docs.select("doc_id",
                       F.array_distinct(wins).alias("fingerprints"))
