"""Skew smoke for duplicate_spans: ONE boilerplate 5-gram planted in
EVERY document of an N-doc corpus (default 1M) — the hot-gram shape the
r4 window-on-gram implementation could not survive (a window partition
is un-splittable by AQE, so one task would sort all N occurrences).
The r5 two-level aggregation must spread the hot gram over doc_id and
complete without a straggler.

Corpus: 30 tokens per doc; tokens 10-14 are the shared boilerplate
"b0 .. b4", everything else is doc-unique (xxhash64-derived), so
exactly one 5-gram has document frequency N and every other gram has
df == 1. Expected output with min_docs=1000: one span per doc,
[span_start, span_end] == [10, 14], n_tokens == 5.

Usage: python tools/scale_smoke_spans.py [n_docs]
Prints one timing line + max/median task-time ratio for the df stage;
writes nothing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from georiva_spark.operators import textops
from georiva_spark.session import get_spark

L = 30          # tokens per doc
B0, B1 = 10, 14  # planted boilerplate token positions (inclusive)


def corpus(spark, n: int):
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(L - 1)),
        lambda i: F.when((i >= B0) & (i <= B1),
                         F.concat(F.lit("b"), (i - B0).cast("string")))
        .otherwise(F.concat(F.lit("w"),
                            F.xxhash64(F.col("id"), i).cast("string"))))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(toks, " ").alias("text"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("scale-smoke-spans",
                      extra_conf={"spark.driver.memory": "48g"})
    docs = corpus(spark, n).persist()
    docs.count()   # materialize generation outside the timing

    t0 = time.perf_counter()
    spans = textops.duplicate_spans(docs, n=5, min_docs=1000)
    agg = spans.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.min("span_start").alias("smin"),
        F.max("span_end").alias("emax"),
        F.sum(F.when((F.col("span_start") == B0)
                     & (F.col("span_end") == B1)
                     & (F.col("n_tokens") == B1 - B0 + 1), 1)
              .otherwise(0)).alias("n_exact")).collect()[0]
    el = time.perf_counter() - t0
    ok = (agg.n_spans == n and agg.n_exact == n
          and agg.smin == B0 and agg.emax == B1)
    print(f"dup_spans hot-gram: {el:.1f}s over {n/1e6:.1f}M docs with one "
          f"gram in ALL of them ({n/el/1e6:.2f}M docs/s) -> "
          f"{agg.n_spans} spans, {agg.n_exact} exactly [{B0},{B1}] "
          f"-> {'OK' if ok else 'MISMATCH'}")
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
