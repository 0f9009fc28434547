"""1M-unit run-ledger sweep smoke (SCALE.md): builds a synthetic parquet
ledger (N units, 2N lineage edges, 2N catalog items) entirely IN SPARK,
attaches a table-primary DerivationEngine, and times the distributed
stale planner + sweep-candidate filters.

What this proves: the driver never holds the ledger. ``attach_ledger``
recovers two scalars; ``stale_units_df`` joins lineage against item
checksums and recomputes every unit's input hash distributed, collecting
only the stale rows; status sweeps are table filters. This is the scale
path the reference delegates to Postgres (processing/models.py) — here
the ledger is just parquet and the planner is a Spark join.

Usage: python tools/scale_smoke_ledger.py [n_units]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from georiva_spark.plans import (  # noqa: E402
    CatalogContext, DerivationEngine, RecipeRegistry,
)
from georiva_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
MUT = 1_000          # mutated source items → MUT/2 stale units
BASE = "/tmp/georiva_ledger_smoke"


def main() -> None:
    spark = get_spark("ledger-smoke")
    shutil.rmtree(BASE, ignore_errors=True)

    t0 = time.perf_counter()
    units = spark.range(N).withColumnRenamed("id", "u")
    # two source items per unit (2u, 2u+1) — every mutation hits one unit
    lin = (units.select(
        "u", F.explode(F.array(F.lit(0), F.lit(1))).alias("k"))
        .select((F.col("u") + 1_000_000).alias("derived_item_id"),
                (F.col("u") * 2 + F.col("k")).alias("source_item_id"),
                F.lit("staging").alias("source_tier"),
                F.lit("synthetic").alias("recipe_id"),
                F.lit("1").alias("recipe_version"),
                F.lit("h").alias("input_hash"),
                F.lit(0).cast("long").alias("seq")))
    items = spark.range(2 * N).select(
        F.col("id").alias("item_id"),
        F.sha2(F.concat(F.lit("c"), F.col("id").cast("string")), 256)
        .alias("checksum"))
    # recorded input hash via the SAME canonical payload stale_units_df
    # rebuilds, so the clean ledger scans to exactly zero stale rows
    payload = F.concat(
        F.lit('{"inputs":["'),
        F.array_join(F.array_sort(F.collect_list("checksum")), '","'),
        F.lit('"],"version":"'), F.first("recipe_version"), F.lit('"}'))
    rec_hash = (lin.join(items, lin.source_item_id == items.item_id)
                .groupBy("derived_item_id")
                .agg(F.sha2(payload, 256).alias("input_hash")))
    runs = rec_hash.select(
        F.lit("synthetic").alias("recipe_type"),
        F.lit("1").alias("recipe_version"),
        F.concat(F.lit('{"u": '),
                 (F.col("derived_item_id") - 1_000_000).cast("string"),
                 F.lit("}")).alias("unit_key"),
        F.sha2(F.col("derived_item_id").cast("string"), 256)
        .alias("unit_hash"),
        F.lit("completed").alias("status"),
        "input_hash",
        F.lit(None).cast("string").alias("origin"),
        F.lit(None).cast("string").alias("reason"),
        F.col("derived_item_id").alias("produced_item_id"),
        F.current_timestamp().alias("updated_at"),
        F.lit(0).cast("int").alias("retries"),
        (F.col("derived_item_id") - 1_000_000).alias("seq"))
    runs.write.parquet(f"{BASE}/runs")
    lin.write.parquet(f"{BASE}/lineage")
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    eng = DerivationEngine(spark, RecipeRegistry(),
                           CatalogContext(spark, [], grid_loader=None),
                           ledger_dir=BASE)
    attach_s = time.perf_counter() - t0
    assert eng.runs == {}, "attach must not collect the ledger"

    t0 = time.perf_counter()
    clean = eng.stale_units_df(items_df=items).count()
    clean_s = time.perf_counter() - t0

    mutated = items.withColumn(
        "checksum",
        F.when(F.col("item_id") < MUT,
               F.concat(F.col("checksum"), F.lit("-X")))
        .otherwise(F.col("checksum")))
    t0 = time.perf_counter()
    stale_rows = eng.stale_units_df(items_df=mutated).collect()
    stale_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    running = len(eng._sweep_candidates("running", "not_ready"))
    sweep_s = time.perf_counter() - t0

    # ---- compaction: fragment the ledger with FRAG one-row event files
    # (the write-side's per-event format), measure the view scan cost,
    # compact, re-measure — same answers, listing cost folded away.
    FRAG = int(os.environ.get("LEDGER_SMOKE_FRAG", "5000"))
    rows_schema = eng._runs_pa_schema()
    import datetime as dt
    t0 = time.perf_counter()
    for k in range(FRAG):
        seq = N + k
        eng._write_event_file(
            f"{BASE}/runs",
            [("synthetic", "1", '{"frag": %d}' % k, f"frag-{k}",
              "running", "h", "sweep", None, None,
              dt.datetime(2024, 1, 1), 0, seq)],
            rows_schema, seq)
    frag_write_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    frag_running = len(eng._sweep_candidates("running"))
    frag_scan_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    comp = eng.compact_ledger()
    compact_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    post_running = len(eng._sweep_candidates("running"))
    post_scan_s = time.perf_counter() - t0
    n_files = len([f for f in os.listdir(f"{BASE}/runs")
                   if f.endswith(".parquet")])

    ok = (clean == 0 and len(stale_rows) == MUT // 2 and running == 0
          and frag_running == FRAG and post_running == FRAG
          and n_files < 64)
    print(json.dumps({
        "n_units": N, "clean_stale": clean, "stale_found": len(stale_rows),
        "stale_expected": MUT // 2, "build_sec": round(build_s, 2),
        "attach_sec": round(attach_s, 2), "clean_scan_sec": round(clean_s, 2),
        "stale_scan_sec": round(stale_s, 2),
        "status_sweep_sec": round(sweep_s, 2),
        "frag_files": FRAG, "frag_write_sec": round(frag_write_s, 2),
        "frag_scan_sec": round(frag_scan_s, 2),
        "compact_sec": round(compact_s, 2),
        "post_compact_scan_sec": round(post_scan_s, 2),
        "post_compact_files": n_files,
        "files_removed": comp["files_removed"], "ok": ok,
    }))
    shutil.rmtree(BASE, ignore_errors=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
