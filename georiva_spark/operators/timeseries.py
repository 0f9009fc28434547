"""Point / area time-series extraction (SURVEY.md §3.3, J4/J5/A2) — the
analysis read path of analysis/timeseries/service.py.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, functions as F

from georiva_spark.functions.geo import affine_index
from georiva_spark.operators.filters import time_filter


def point_timeseries(grid: DataFrame, lat: float, lon: float,
                     lat0: float, lon0: float, res: float,
                     start: _dt.datetime | None = None,
                     end: _dt.datetime | None = None) -> DataFrame:
    """J4 — nearest-pixel series at (lat, lon).

    The spatial as-of join resolves to exact affine index arithmetic
    (service.py:92-97 sel(method='nearest')) → an equi-filter on (y, x)
    that partition/min-max prunes; no join, no shuffle at any scale.
    """
    y, x = affine_index(lat0, lon0, res, lat, lon)
    out = time_filter(grid, start, end)
    return (out.where((F.col("y") == y) & (F.col("x") == x))
               .select("collection", "variable", "time", "y", "x",
                       "lat", "lon", "value")
               .orderBy("time"))


def nearest_time(grid: DataFrame, ts: _dt.datetime) -> DataFrame:
    """J5 — per-pixel value at the timestep nearest to ``ts``
    (formats/netcdf.py:130-134): min_by over |time − ts|, tie → earlier
    (xarray nearest keeps the lower index on exact ties).

    One aggregation, no window shuffle: min_by on the (distance, time)
    struct gives the argmin directly.
    """
    # unix_micros over a timestamp_ltz cast handles both TIMESTAMP and
    # TIMESTAMP_NTZ inputs (parquet with no-tz timestamp[us] reads as NTZ,
    # and CAST(TIMESTAMP_NTZ AS DOUBLE) is illegal in Spark 4).
    t_us = F.unix_micros(F.col("time").cast("timestamp_ltz"))
    ts_us = F.unix_micros(F.lit(ts).cast("timestamp_ltz"))
    dist = F.abs(t_us - ts_us)
    # struct comparison is lexicographic: min distance first, then earlier
    # time on exact ties (xarray nearest keeps the lower index).
    key = F.struct(dist.alias("d"), F.col("time").alias("t"))
    return (grid.groupBy("collection", "variable", "y", "x", "lat", "lon")
                .agg(F.min_by(F.struct("time", "value"), key).alias("_nv"))
                .select("collection", "variable", "y", "x", "lat", "lon",
                        F.col("_nv.time").alias("time"),
                        F.col("_nv.value").alias("value")))


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              tolerance_us: int | None = None,
              direction: str = "backward") -> DataFrame:
    """As-of join with pandas.merge_asof semantics (inclusive):
    ``direction="backward"`` (default) matches each left row to the
    right row with the LARGEST right_ts ≤ left_ts for the same ``on``
    key; ``"forward"`` to the SMALLEST right_ts ≥ left_ts (the same
    window trick with the time ordering reversed); ``"nearest"`` to
    whichever of the two is closer (tie → the earlier right row,
    pandas' rule). Ties at equal right_ts break to the
    lexicographically largest payload, so the result is deterministic;
    no match → nulls. ``tolerance_us`` discards matches farther than
    tolerance from left_ts (in the match direction).

    Spark lacks this operator natively; the scale shape is the
    union-tag trick, NOT a join: tag right rows 0 and left rows 1,
    union, and run ONE per-key window ordered by (ts, tag, payload) —
    last(payload, ignorenulls) over unbounded-preceding..current hands
    each left row its predecessor right payload in a single sort
    within a single shuffle on the key. A per-pair range join would be
    O(|L|·|R|) per key; this is O((|L|+|R|) log) and AQE-balanced
    across keys (one key's history must sort in one task — the same
    bound any per-key stateful op has; time-series keys are many and
    small by construction).

    Right columns are carried through the window as ONE struct (null
    on left rows), so the window state is a single column regardless
    of how wide the right table is."""
    from pyspark.sql import Window

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction {direction!r}")
    rc = right_cols or [c for c in right.columns
                        if c not in (on, right_ts)]

    payload = F.struct(F.col(right_ts).alias("_rt"),
                       *[F.col(c) for c in rc])
    r = right.select(F.col(on), F.col(right_ts).alias("_t"),
                     F.lit(0).alias("_side"), payload.alias("_p"))
    l = (left.withColumn("_t", F.col(left_ts))
         .withColumn("_side", F.lit(1))
         .withColumn("_p", F.lit(None).cast(r.schema["_p"].dataType)))
    u = l.unionByName(r, allowMissingColumns=True)
    wb = (Window.partitionBy(on)
          .orderBy(F.col("_t").asc(), F.col("_side").asc(),
                   F.col("_p").asc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(on)
          .orderBy(F.col("_t").desc(), F.col("_side").asc(),
                   F.col("_p").asc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    mb = F.last("_p", ignorenulls=True).over(wb)
    mf = F.last("_p", ignorenulls=True).over(wf)
    lt = F.unix_micros(F.col("_t").cast("timestamp_ltz"))

    def gap_of(m, fwd):
        rt = F.unix_micros(m["_rt"].cast("timestamp_ltz"))
        return (rt - lt) if fwd else (lt - rt)

    if direction == "backward":
        out = u.withColumn("_m", mb).where(F.col("_side") == 1)
        gap = gap_of(F.col("_m"), False)
    elif direction == "forward":
        out = u.withColumn("_m", mf).where(F.col("_side") == 1)
        gap = gap_of(F.col("_m"), True)
    else:
        # nearest: both matches from ONE union pass (two in-partition
        # sorts, still a single key shuffle, no self-join — so
        # duplicate left rows stay independent); smaller |gap| wins,
        # tie -> the earlier (backward) match, pandas' rule
        both = u.withColumn("_mb", mb).withColumn("_mf", mf) \
                .where(F.col("_side") == 1)
        use_f = (F.col("_mb").isNull()
                 | (F.col("_mf").isNotNull()
                    & (gap_of(F.col("_mf"), True)
                       < gap_of(F.col("_mb"), False))))
        out = both.withColumn(
            "_m", F.when(use_f, F.col("_mf")).otherwise(F.col("_mb")))
        gap = F.when(use_f, gap_of(F.col("_m"), True)) \
               .otherwise(gap_of(F.col("_m"), False))
    if tolerance_us is not None:
        out = out.withColumn(
            "_m", F.when(F.col("_m").isNotNull()
                         & (gap <= F.lit(tolerance_us)), F.col("_m")))
    keep = [c for c in left.columns]
    return out.select(
        *keep, F.col("_m._rt").alias("matched_" + right_ts),
        *[F.col(f"_m.{c}").alias("matched_" + c) for c in rc])


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          bin_us: int | None = None) -> DataFrame:
    """Range join on interval overlap: (l_id, r_id, overlap_us) for
    every pair whose [start, end] intervals intersect (inclusive).
    Inputs: DataFrames with (id, start, end) timestamp columns.

    Spark has no native range join; the scale shape is BINNING: each
    interval explodes to the fixed-width time bins it covers (sequence
    over floor(start/W)..floor(end/W)), pairs equi-join on the bin key,
    the exact overlap predicate filters, and duplicates from
    multi-bin-spanning pairs collapse map-side via the half-open
    ownership rule (a pair is EMITTED only from the first bin both
    intervals share: greatest(l_bin_start, r_bin_start) — so no
    distinct over the pair space is needed). Bin width trades
    replication (long intervals × narrow bins) against bin skew (wide
    bins put more candidates in one key); ~ the median interval length
    is the sweet spot, so the DEFAULT (bin_us=None) derives it at plan
    time from a map-side-combined percentile_approx over both sides'
    interval lengths — a driver scalar, same policy as bm25's N/avgdl
    (a fixed default is a footgun: 1 h bins explode year-long
    intervals into 8760 rows each and funnel sub-second ones into one
    mega-bin). A theta join would be O(|L|·|R|); this is O(pairs per
    bin), AQE-splittable across bins.

    Reversed intervals (end < start) raise a named error instead of
    Spark's opaque sequence-boundaries failure."""
    def lens(df):
        s = F.unix_micros(F.col("start").cast("timestamp_ltz"))
        e = F.unix_micros(F.col("end").cast("timestamp_ltz"))
        return df.select((e - s).alias("len"))

    if bin_us is None:
        row = (lens(left).unionByName(lens(right))
               .agg(F.percentile_approx("len", 0.5).alias("med"),
                    F.min("len").alias("mn"),
                    F.max("len").alias("mx")).first())
        if row.mn is not None and row.mn < 0:
            raise ValueError(
                "interval_overlap_join: reversed interval (end < "
                "start) in input — normalize or filter before joining")
        # floor the width so the LONGEST interval explodes into at
        # most ~10k bins: a point-event-heavy corpus (median length 0)
        # must not set bin_us=1 µs and hand a single hour-long
        # interval a 3.6e9-element sequence
        bin_us = max(int(row.med or 0), (int(row.mx or 0) // 10_000), 1)

    err = F.raise_error(F.concat(
        F.lit("interval_overlap_join: reversed interval (end < start) "
              "for id "), F.col("id").cast("string")))

    def bins(df, tag):
        s_us = F.unix_micros(F.col("start").cast("timestamp_ltz"))
        e_us = F.unix_micros(F.col("end").cast("timestamp_ltz"))
        e_ok = F.when(e_us >= s_us, e_us).otherwise(err)
        return df.select(
            F.col("id").alias(f"{tag}_id"),
            s_us.alias(f"{tag}_s"), e_us.alias(f"{tag}_e"),
            F.explode(F.sequence(
                F.floor(s_us / bin_us), F.floor(e_ok / bin_us)))
            .alias("bin"))

    lb, rb = bins(left, "l"), bins(right, "r")
    first_shared = F.greatest(F.floor(F.col("l_s") / bin_us),
                              F.floor(F.col("r_s") / bin_us))
    return (lb.join(rb, "bin")
            .where((F.col("l_s") <= F.col("r_e"))
                   & (F.col("r_s") <= F.col("l_e"))
                   & (F.col("bin") == first_shared))
            .select("l_id", "r_id",
                    (F.least("l_e", "r_e")
                     - F.greatest("l_s", "r_s")).alias("overlap_us")))
