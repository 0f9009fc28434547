"""r13 smoke: probe cost on a MOSTLY-DEAD index, before vs after the
retraction-aware compaction purge.

The tombstone design defers physical deletion: a retract appends one
rule row and probes filter dead rows POST-SCAN (broadcast anti-join).
That is O(1) at event time, but a retract-heavy index keeps paying the
dead rows' scan + signature-join cost on every probe until compaction
purges them — which is exactly why the r13 probe-then-grow cadence
counts pending-rule batches (streaming/_loop.py). This smoke measures
the gap the purge closes: build a MinHash index where ~90% of the
rows belong to retracted generations, time the probe before
compaction (scan includes dead rows, anti-join filters) and after
(dead rows gone from disk), and assert the pair output is identical.

Usage: python tools/scale_smoke_retract.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from georiva_spark.operators import dedup
from georiva_spark.session import get_spark


def main(n=500_000):
    spark = get_spark("scale-smoke-retract",
                      extra_conf={"spark.driver.memory": "48g"})
    d = tempfile.mkdtemp(prefix="georiva_retract_smoke_")
    t = "t_smoke_retract"
    words = ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lam mu nu xi omicron pi rho sigma tau upsilon")
    # synthetic docs: ~40 tokens, per-doc salt keeps most docs unique
    docs = (spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(words + " "), F.lit(words + " "),
                 F.format_string("salt%d tail%d",
                                 (F.col("id") % 9973).cast("int"),
                                 (F.col("id") % 997).cast("int")))
        .alias("text")))
    live = docs.where(F.col("doc_id") % 10 == 0)       # 10% survives
    dead = docs.where(F.col("doc_id") % 10 != 0)       # 90% retracts
    t0 = time.time()
    dedup.minhash_index_write(live, t, os.path.join(d, "idx"),
                              n_buckets=32)
    n_dead_shards = 9
    for s in range(n_dead_shards):
        dedup.minhash_index_append(
            dead.where(F.col("doc_id") % 10 == s + 1), t,
            gen=dedup.index_gen(f"crawl-{s}", "v1"))
    print(f"build (10% base + {n_dead_shards} tagged shards): "
          f"{time.time() - t0:.1f}s")
    for s in range(n_dead_shards):                     # all re-crawled away
        dedup.minhash_index_retract(spark, t, f"crawl-{s}")
    probe = (docs.where(F.col("doc_id") % 1000 == 3)
             .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                     "text"))

    def timed_probe(tag):
        t0 = time.time()
        rows = dedup.minhash_index_probe(probe, t, threshold=0.9) \
            .collect()
        el = time.time() - t0
        print(f"probe {tag}: {el:.1f}s, {len(rows)} pairs")
        return el, {(r.doc_new, r.doc_old) for r in rows}

    rows_before = spark.table(f"{t}_sigs").count()
    el_before, pairs_before = timed_probe("MOSTLY-DEAD (pre-compact)")
    t0 = time.time()
    dedup.minhash_index_compact(spark, t, os.path.join(d, "cmp"))
    print(f"compact (physical purge + rule clear): "
          f"{time.time() - t0:.1f}s")
    rows_after = spark.table(f"{t}_sigs").count()
    el_after, pairs_after = timed_probe("PURGED (post-compact)")
    assert pairs_before == pairs_after, "purge changed probe output"
    assert rows_after < rows_before / 5, (rows_before, rows_after)
    print(f"sig rows {rows_before} -> {rows_after} "
          f"({rows_after / rows_before:.1%}); probe "
          f"{el_before:.1f}s -> {el_after:.1f}s "
          f"({el_before / max(el_after, 1e-9):.2f}x)")
    for s in ("bands", "sigs", "dead", "dead_docs",
              "bands_compact", "sigs_compact", "bands_old",
              "sigs_old"):
        spark.sql(f"DROP TABLE IF EXISTS {t}_{s}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500_000)
