"""r7 smoke: the new pipeline operators at corpus scale.

1. fuzzy_decontaminate: 2M docs vs a 1%-sample benchmark truncated by
   two tokens (the lightly-edited leak) — broadcast-banded, only hits
   shuffle; planted template structure means every benchmark doc's
   cluster-mates should flag.
2. cluster_aware_split: 2M docs, MinHash pairs → CC → split on the
   cluster id; verifies no near-dup pair straddles a split at scale.
3. Probe-then-grow flatness: a 1M-doc MinHash index serves 4
   consecutive 50k-doc micro-batches through the streaming loop —
   per-batch wall time must stay delta-sized (flat) as the index
   grows, because the index side is never recomputed or re-shuffled.

Usage: python tools/scale_smoke_pipeline.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from georiva_spark.operators import dedup, sampling
from georiva_spark.session import get_spark
from tools.scale_smoke_llm import T, corpus


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("scale-smoke-pipeline",
                      extra_conf={"spark.driver.memory": "48g"})
    docs = corpus(spark, n).persist()
    docs.count()

    # -- 1. fuzzy decontamination ------------------------------------
    t0 = time.perf_counter()
    toks = F.split(F.col("text"), " ")
    bench = (sampling.hash_sample(docs, 0.01, salt="fuzzyeval")
             .select("doc_id",
                     F.array_join(F.slice(toks, 1, F.size(toks) - 2),
                                  " ").alias("text")))
    out = dedup.fuzzy_decontaminate(docs, bench, threshold=0.5)
    flagged = out.where("contaminated").count()
    el = time.perf_counter() - t0
    print(f"fuzzy_decontaminate(1% bench): {el:.1f}s "
          f"({n/el/1e6:.2f}M docs/s) -> {flagged} flagged "
          f"(expect >= ~{int(n*0.01*2)} — each bench doc's exact twin "
          f"+ itself at minimum)")

    # -- 2. cluster-aware split --------------------------------------
    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).persist()
    np_ = pairs.count()
    split = sampling.cluster_aware_split(
        docs, pairs, {"train": 980_000, "val": 10_000,
                      "test": 10_000}).persist()
    counts = {r.split: r.n for r in
              split.groupBy("split").agg(F.count("*").alias("n"))
              .collect()}
    # leakage audit: a near-dup pair straddling splits = a leak
    s = split.select(F.col("doc_id").alias("d"),
                     F.col("split").alias("s"))
    leaks = (pairs
             .join(s.withColumnsRenamed({"d": "doc_a", "s": "sa"}),
                   "doc_a")
             .join(s.withColumnsRenamed({"d": "doc_b", "s": "sb"}),
                   "doc_b")
             .where("sa <> sb").count())
    el = time.perf_counter() - t0
    print(f"cluster_aware_split: {el:.1f}s over {np_/1e6:.2f}M pairs "
          f"-> {counts}; straddling pairs = {leaks} (must be 0)")
    split.unpersist()
    pairs.unpersist()

    # -- 3. probe-then-grow flatness ---------------------------------
    base_n = min(1_000_000, n // 2)
    delta_n = 50_000
    root = tempfile.mkdtemp(prefix="pipe_smoke_")
    t0 = time.perf_counter()
    dedup.minhash_index_write(docs.where(F.col("doc_id") < base_n),
                              "t_smk_mh", os.path.join(root, "idx"),
                              n_buckets=64)
    print(f"index write ({base_n/1e6:.1f}M docs): "
          f"{time.perf_counter() - t0:.1f}s")
    from georiva_spark.streaming import start_neardup_stream

    land = os.path.join(root, "landing")
    os.makedirs(land)
    out_d, ckpt = os.path.join(root, "out"), os.path.join(root, "ck")
    schema = ("doc_id long, text string, lang string, source string, "
              "n_chars long")
    for b in range(4):
        lo = base_n + b * delta_n
        shard = docs.where((F.col("doc_id") >= lo)
                           & (F.col("doc_id") < lo + delta_n))
        shard.coalesce(4).write.mode("overwrite").parquet(
            os.path.join(land, f"shard{b}"))
        t0 = time.perf_counter()
        src = (spark.readStream.schema(schema).parquet(land + "/*"))
        q = start_neardup_stream(src, "t_smk_mh", out_d, ckpt,
                                 threshold=0.5)
        q.awaitTermination(600)
        el = time.perf_counter() - t0
        idx_n = spark.table("t_smk_mh_sigs").count()
        print(f"stream batch {b}: {el:.1f}s for {delta_n/1e3:.0f}k "
              f"delta against a {idx_n/1e6:.2f}M-doc index")
    for s in ("bands", "sigs"):
        spark.sql(f"DROP TABLE IF EXISTS t_smk_mh_{s}")


if __name__ == "__main__":
    main()
