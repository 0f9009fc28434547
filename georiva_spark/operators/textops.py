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
    """Token counting: whitespace words + a BPE-ish regex splitting on word
    boundaries, digits, and punctuation runs — a deterministic proxy for
    subword counts at scan speed."""
    words = F.size(tokens(F.col("text")))
    pieces = F.size(F.filter(
        F.split(F.col("text"), r"(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"),
        lambda t: t != ""))
    return docs.select("doc_id", words.alias("word_count"),
                       pieces.alias("subword_count"))


def fingerprint(docs: DataFrame, window: int = 8) -> DataFrame:
    """Document fingerprint: rolling-hash winnowing — min xxhash64 over
    each window of token 3-shingles, distinct per doc. Used for robust
    near-duplicate candidate generation."""
    toks = tokens(F.col("text"))
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, 3))))
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(shingles) - window, F.lit(0))),
        lambda i: F.array_min(F.slice(shingles, i + 1, window)))
    return docs.select("doc_id",
                       F.array_distinct(wins).alias("fingerprints"))
