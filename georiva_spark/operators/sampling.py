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


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                salt: str = "georiva") -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hash bucket falls
    below rate. Same key + salt => same decision, forever."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.where(_bucket(F.col(key_col), salt) < int(rate * _BUCKETS))


def stratified_hash_sample(df: DataFrame, rates: dict[str, float],
                           strata_col: str, key_col: str = "doc_id",
                           default_rate: float = 0.0,
                           salt: str = "georiva") -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing step of a
    training pipeline (e.g. downsample boilerplate-heavy sources, keep
    all of a rare language). Strata with no configured rate keep
    ``default_rate``. One scan, no shuffle."""
    thr = F.lit(int(default_rate * _BUCKETS))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == stratum,
                     F.lit(int(rate * _BUCKETS))).otherwise(thr)
    return df.where(_bucket(F.col(key_col), salt) < thr)
