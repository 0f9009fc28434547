"""r8 smoke: retrain-on-compact under distribution drift.

A persistent IVF index trained on yesterday's corpus degrades when the
stream drifts: appended vectors from NEW blobs all route to whichever
old cell is least-far, so one cell absorbs the whole drift and probes
routed there read its fraction instead of ~1/C. Nothing re-trained
until r8. Compaction rewrites every byte anyway, so
``ivf_index_compact(retrain_iters=…)`` re-runs Lloyd over the
compacted corpus in the same pass, swaps sidecar-then-main with
version stamps (the crash window fails by name, never routes wrong).

This smoke: 200k 64-d vectors in 8 blobs (trained write — C=16 over 8
blobs settles at max/mean ≈ 2.0, Lloyd's hash-seed local minimum; that
is the BASELINE the index was written at) → append 200k from 8 NEW
blobs (balance degrades well past baseline) → retrain-compact over the
grown corpus (balance restored TO baseline — the retrained quantizer
sees 16 blobs for its 16 cells). Asserted relative to the measured
baseline b0: degraded ≥ b0 + 0.5, restored ≤ b0 + 0.15 (measured r8 at
200k+200k: 2.00 → 3.38 → 2.00).

Run: python tools/scale_smoke_retrain.py [n_vectors_per_phase]
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from georiva_spark.operators import similarity  # noqa: E402
from georiva_spark.session import get_spark  # noqa: E402


def main(n=200_000, d=64, blobs=8):
    spark = get_spark()
    rng = np.random.default_rng(17)
    base_centers = rng.normal(size=(blobs, d)) * 6.0
    drift_centers = rng.normal(size=(blobs, d)) * 6.0 + 15.0

    def frame(centers, id0):
        def gen(it):
            import pandas as pd
            for pdf in it:
                ids = pdf["id"].to_numpy()
                v = (centers[ids % blobs]
                     + np.random.default_rng(ids[0]).normal(
                         scale=0.4, size=(len(ids), d)))
                yield pd.DataFrame(
                    {"vec_id": ids + id0,
                     "embedding": list(v.astype(np.float64))})
        return spark.range(n).mapInPandas(
            gen, "vec_id long, embedding array<double>")

    root = tempfile.mkdtemp(prefix="retrain_smoke_")

    def balance():
        sizes = [r.n for r in spark.sql(
            "SELECT cell, COUNT(*) n FROM t_smk_rt GROUP BY cell"
        ).collect()]
        return max(sizes) / (sum(sizes) / len(sizes))

    t0 = time.time()
    similarity.ivf_index_write(frame(base_centers, 0), "t_smk_rt",
                               os.path.join(root, "i"),
                               n_centroids=blobs * 2, train_iters=2)
    b0 = balance()
    print(f"write(trained): {time.time() - t0:.1f}s  max/mean={b0:.2f}")

    t0 = time.time()
    similarity.ivf_index_append(frame(drift_centers, 10_000_000),
                                "t_smk_rt")
    b1 = balance()
    print(f"drift append: {time.time() - t0:.1f}s  max/mean={b1:.2f}")

    t0 = time.time()
    similarity.ivf_index_compact(spark, "t_smk_rt",
                                 os.path.join(root, "c"),
                                 retrain_iters=3)
    b2 = balance()
    props = {r.key: r.value for r in spark.sql(
        "SHOW TBLPROPERTIES t_smk_rt").collect()}
    print(f"retrain-compact: {time.time() - t0:.1f}s  max/mean={b2:.2f}"
          f"  quantizer_version={props['georiva.quantizer_version']}")

    assert b1 >= b0 + 0.5, (
        f"drift did not degrade balance ({b0:.2f} -> {b1:.2f})")
    assert b2 <= b0 + 0.15, (
        f"retrain did not restore balance to the write-time baseline "
        f"({b0:.2f} -> drifted {b1:.2f} -> {b2:.2f})")
    print("PASS: drifted appends degrade the cell balance and "
          "retrain-on-compact restores it")

    for t in ("t_smk_rt", "t_smk_rt_centroids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
