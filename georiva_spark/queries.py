"""Driver-facing query registry: every SURVEY.md §2 operator exposed as a
(Spark callable, DuckDB oracle SQL) pair over the driver testdata.

Float-determinism policy (so order-insensitive value hashes match):
- Large-table sums (lineitem-scale) accumulate in DECIMAL (exact,
  order-independent in both engines) and cast the result to double — the
  two engines then produce bit-identical values.
- Averages divide the exact decimal sum by the exact count in double —
  IEEE division is deterministic.
- std / variance / covariance use the closed form from exact sums with the
  *same* expression shape on both sides, or operate on small groups
  (≤ a few hundred rows) where accumulation error ≪ the round(…, 4)
  quantum applied on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from georiva_spark.functions.scalars import (
    safe_divide, unit_conversion_expr, rescale_255, vector_direction,
)
from georiva_spark.functions.vectors import cosine_similarity
from georiva_spark.operators import filters, temporal, algebra, zonal, windows, stats, timeseries
from georiva_spark.operators import textops, dedup, similarity
from georiva_spark.sources.synthetic import (
    events_grid, EVENTS_GRID_SQL, GRID_H, GRID_W, LAT0, LON0, RES,
)
from georiva_spark.sources.tables import load_table
from georiva_spark.queries_ext import EXT_ORACLES, EXT_QUERIES

QueryFn = Callable[[SparkSession, str], DataFrame]

GRID_CTE = f"WITH grid AS ({EVENTS_GRID_SQL})"


def _dec(c, scale: int = 2):
    return c.cast(f"decimal(18,{scale})")


def _r4(c):
    return F.round(c, 4)


# ---------------------------------------------------------------------------
# Relational / catalog layer (P2, W1-W3, O1, A11, A13, J1, J8, U3)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary (A3-style calendar-free
    rollup). Exercises scan→filter→groupBy with decimal-exact sums."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount"))
    charge = _dec(F.col("l_extendedprice")) * disc * (
        F.lit(1).cast("decimal(18,2)") + _dec(F.col("l_tax")))
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
                 F.sum(_dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
                 F.sum(_dec(F.col("l_extendedprice")) * disc).cast("double").alias("sum_disc_price"),
                 F.sum(charge).cast("double").alias("sum_charge"),
                 (F.sum(_dec(F.col("l_quantity"))).cast("double") /
                  F.count(F.lit(1))).alias("avg_qty"),
                 (F.sum(_dec(F.col("l_extendedprice"))).cast("double") /
                  F.count(F.lit(1))).alias("avg_price"),
                 F.count(F.lit(1)).alias("count_order")))


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — catalog assembly joins (item⋈asset⋈variable analog):
    customer⋈orders⋈lineitem, filtered segment, revenue per order, top 10.
    orders/customer scale with the fact → no forced broadcast; AQE picks
    broadcast at small SF and shuffle join (with skew split) at scale."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount")))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
              .agg(F.sum(rev).cast("double").alias("revenue"))
              .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
              .limit(10))


SQL_REVENUE_JOIN = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_time_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — closed time-range catalog filter (STAC datetime search)."""
    o = load_table(spark, sf_dir, "orders")
    return (filters.time_filter(o, "1996-01-01", "1996-12-31", time_col="o_orderdate")
            .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"))


SQL_TIME_FILTER = """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate <= TIMESTAMP '1996-12-31'
"""


def q_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/O1 — keyset pagination over the event stream."""
    ev = load_table(spark, sf_dir, "events")
    return (windows.keyset_page(ev, order_col="ts", token="2024-01-15",
                                limit=100, tiebreak_col="event_id")
            .select("event_id", "ts", "user_id", "event_type"))


SQL_KEYSET_PAGE = """
SELECT event_id, ts, user_id, event_type
FROM events WHERE ts < TIMESTAMP '2024-01-15'
ORDER BY ts DESC, event_id DESC LIMIT 100
"""


def q_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — latest item per collection analog: latest event per user."""
    ev = load_table(spark, sf_dir, "events")
    return (windows.latest_per_group(ev, ["user_id"], order_col="ts",
                                     tiebreak_cols=["event_id"])
            .select("user_id", "event_id", "ts", "event_type", "value"))


SQL_LATEST_PER_USER = """
SELECT user_id, event_id, ts, event_type, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


def q_latest_run_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — latest forecast run + all its steps analog: each customer's
    orders on their latest order date."""
    o = load_table(spark, sf_dir, "orders")
    return (windows.latest_run_steps(o, ["o_custkey"], run_col="o_orderdate")
            .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"))


SQL_LATEST_RUN_STEPS = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
  SELECT *, MAX(o_orderdate) OVER (PARTITION BY o_custkey) AS mx FROM orders)
WHERE o_orderdate = mx
"""


def q_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — run-ledger progress rollup analog over order status."""
    o = load_table(spark, sf_dir, "orders")
    return stats.status_rollup(o.withColumnRenamed("o_orderstatus", "status"))


SQL_STATUS_ROLLUP = """
SELECT o_orderstatus AS status, COUNT(*) AS n FROM orders GROUP BY o_orderstatus
"""


def q_distinct_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 — EDR temporal-extent distinct time values per channel."""
    g = events_grid(spark, sf_dir).withColumn("day", F.date_trunc("day", "time"))
    return stats.distinct_times(g, keys=("variable",), time_col="day")


SQL_DISTINCT_DAYS = GRID_CTE + """
SELECT DISTINCT variable, CAST(date_trunc('day', time) AS TIMESTAMP) AS day FROM grid
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/U3 — candidates-minus-stored anti-join (sources/loader.py:420-425
    triage): (user, day) pairs with a click but no purchase that day.
    Day granularity keeps the result provably non-empty on the testdata
    (an all-users predicate passed vacuously on 0 rows in round 1)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date").alias("day")
    clicks = (ev.where(F.col("event_type") == "click")
              .select("user_id", day).distinct())
    buys = (ev.where(F.col("event_type") == "purchase")
            .select("user_id", day).distinct())
    return clicks.join(buys, ["user_id", "day"], "left_anti")


SQL_ANTI_JOIN = """
SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
FROM events WHERE event_type = 'click'
EXCEPT
SELECT DISTINCT user_id, CAST(ts AS DATE)
FROM events WHERE event_type = 'purchase'
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — sibling-hit semi-join: customers in ASIA nations (dim chain
    broadcast both hops)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
    return (c.join(F.broadcast(asia_nations),
                   c.c_nationkey == asia_nations.n_nationkey, "left_semi")
             .select("c_custkey", "c_name", "c_nationkey"))


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name, c_nationkey FROM customer
WHERE c_nationkey IN (
  SELECT n_nationkey FROM nation WHERE n_regionkey IN (
    SELECT r_regionkey FROM region WHERE r_name = 'ASIA'))
"""


def q_safe_divide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar family — safe_divide ÷0→null (algebra.py:16-30) on lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        safe_divide(F.col("l_discount"), F.col("l_tax")).alias("disc_over_tax"))


SQL_SAFE_DIVIDE = """
SELECT l_orderkey, l_linenumber,
  CASE WHEN l_tax = 0 OR l_tax IS NULL OR l_discount IS NULL THEN NULL
       ELSE l_discount / l_tax END AS disc_over_tax
FROM lineitem
"""


def q_rollup_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets rollup (admin-level zonal rollup analog, SURVEY §2.4
    note): (variable, day) → variable → grand total."""
    g = events_grid(spark, sf_dir).withColumn("day", F.date_trunc("day", "time"))
    return (g.rollup("variable", "day")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(_dec(F.col("value"))).cast("double").alias("total")))


SQL_ROLLUP_SETS = GRID_CTE + """
SELECT variable, CAST(date_trunc('day', time) AS TIMESTAMP) AS day, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM grid GROUP BY ROLLUP(variable, date_trunc('day', time))
"""


# ---------------------------------------------------------------------------
# Grid layer (P4, P7, A2-A10, A12, J2, J4, J6)
# ---------------------------------------------------------------------------

def q_bbox_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — pixel bbox slice, then per-channel rollup."""
    g = filters.bbox_subset(events_grid(spark, sf_dir), west=-3.0, south=-2.0,
                            east=4.0, north=3.0)
    return (g.groupBy("variable")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(_dec(F.col("value"))).cast("double").alias("total")))


SQL_BBOX_SUBSET = GRID_CTE + """
SELECT variable, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM grid
WHERE lat BETWEEN -2.0 AND 3.0 AND lon BETWEEN -3.0 AND 4.0
GROUP BY variable
"""


def q_resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — temporal resample to daily cadence, mean per pixel per day.

    avg = exact decimal sum / count (deterministic double division)."""
    g = events_grid(spark, sf_dir)
    return (g.groupBy("collection", "variable", "y", "x",
                      F.date_trunc("day", "time").alias("time"))
             .agg((F.sum(_dec(F.col("value"))).cast("double") /
                   F.count("value")).alias("value")))


SQL_RESAMPLE_DAILY = GRID_CTE + """
SELECT collection, variable, y, x, CAST(date_trunc('day', time) AS TIMESTAMP) AS time,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS value
FROM grid GROUP BY collection, variable, y, x, date_trunc('day', time)
"""


def q_climatology(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — per-pixel whole-series climatology of one channel."""
    g = filters.select_variable(events_grid(spark, sf_dir), "view")
    return (g.groupBy("variable", "y", "x", "lat", "lon")
             .agg((F.sum(_dec(F.col("value"))).cast("double") /
                   F.count("value")).alias("value"),
                  F.count("value").alias("n")))


SQL_CLIMATOLOGY = GRID_CTE + """
SELECT variable, y, x, lat, lon,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS value,
       COUNT(value) AS n
FROM grid WHERE variable = 'view' GROUP BY variable, y, x, lat, lon
"""


def q_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/J6 — daily series minus per-pixel baseline, absolute + relative,
    via the broadcast anomaly join. Baseline = exact per-pixel mean."""
    g = filters.select_variable(events_grid(spark, sf_dir), "error")
    daily = (g.groupBy("variable", "y", "x",
                       F.date_trunc("day", "time").alias("time"))
              .agg((F.sum(_dec(F.col("value"))).cast("double") /
                    F.count("value")).alias("value")))
    base = (g.groupBy("variable", "y", "x")
             .agg((F.sum(_dec(F.col("value"))).cast("double") /
                   F.count("value")).alias("_base")))
    j = daily.join(F.broadcast(base), ["variable", "y", "x"], "left")
    return j.select(
        "variable", "y", "x", "time",
        (F.col("value") - F.col("_base")).alias("anomaly"),
        safe_divide(F.col("value") - F.col("_base"), F.col("_base"))
        .alias("relative_anomaly"))


SQL_ANOMALY = GRID_CTE + """
, daily AS (
  SELECT variable, y, x, CAST(date_trunc('day', time) AS TIMESTAMP) AS time,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS value
  FROM grid WHERE variable = 'error' GROUP BY variable, y, x, date_trunc('day', time)),
base AS (
  SELECT variable, y, x,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS _base
  FROM grid WHERE variable = 'error' GROUP BY variable, y, x)
SELECT d.variable, d.y, d.x, d.time,
       d.value - b._base AS anomaly,
       CASE WHEN b._base = 0 OR b._base IS NULL OR d.value IS NULL THEN NULL
            ELSE (d.value - b._base) / b._base END AS relative_anomaly
FROM daily d LEFT JOIN base b USING (variable, y, x)
"""


def q_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — per-pixel slope per day via the polyfit(deg=1) closed form
    computed from exact sums (identical expression shape both sides)."""
    g = filters.select_variable(events_grid(spark, sf_dir), "purchase")
    daily = (g.groupBy("y", "x",
                       F.date_trunc("day", "time").alias("day"))
              .agg((F.sum(_dec(F.col("value"))).cast("double") /
                    F.count("value")).alias("v")))
    t = F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")).cast("double")
    agg = (daily.select("y", "x", t.alias("t"), "v")
           .groupBy("y", "x")
           .agg(F.count(F.lit(1)).cast("double").alias("n"),
                F.sum("t").alias("st"), F.sum("v").alias("sv"),
                F.sum(F.col("t") * F.col("v")).alias("stv"),
                F.sum(F.col("t") * F.col("t")).alias("stt")))
    slope = safe_divide(
        F.col("stv") / F.col("n") - (F.col("st") / F.col("n")) * (F.col("sv") / F.col("n")),
        F.col("stt") / F.col("n") - (F.col("st") / F.col("n")) * (F.col("st") / F.col("n")))
    return agg.select("y", "x", slope.alias("slope"))


SQL_TREND = GRID_CTE + """
, daily AS (
  SELECT y, x, CAST(date_trunc('day', time) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS v
  FROM grid WHERE variable = 'purchase' GROUP BY y, x, date_trunc('day', time)),
agg AS (
  SELECT y, x, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(CAST(DATE_DIFF('day', DATE '2024-01-01', CAST(day AS DATE)) AS DOUBLE)) AS st,
         SUM(v) AS sv,
         SUM(CAST(DATE_DIFF('day', DATE '2024-01-01', CAST(day AS DATE)) AS DOUBLE) * v) AS stv,
         SUM(CAST(DATE_DIFF('day', DATE '2024-01-01', CAST(day AS DATE)) AS DOUBLE) *
             CAST(DATE_DIFF('day', DATE '2024-01-01', CAST(day AS DATE)) AS DOUBLE)) AS stt
  FROM daily GROUP BY y, x)
SELECT y, x,
  CASE WHEN (stt/n - (st/n)*(st/n)) = 0 THEN NULL
       ELSE (stv/n - (st/n)*(sv/n)) / (stt/n - (st/n)*(st/n)) END AS slope
FROM agg
"""


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/J3 — zonal statistics over box boundaries incl. a non-intersecting
    one (EMPTY_STATS all-null row) via the broadcast-geometry mask join."""
    boxes = [
        (1, 1, "west_box", -7.5, -6.0, 0.0, 6.0),
        (2, 1, "east_box", 0.0, -6.0, 7.5, 6.0),
        (3, 2, "inner_box", -2.0, -2.0, 3.0, 3.0),
        (4, 2, "faraway", 100.0, 100.0, 101.0, 101.0),
    ]
    rows = []
    for bid, level, name, w, s, e, n in boxes:
        gj = ('{"type": "Polygon", "coordinates": [[[%f, %f], [%f, %f], '
              '[%f, %f], [%f, %f], [%f, %f]]]}' % (w, s, e, s, e, n, w, n, w, s))
        rows.append((bid, level, name, gj))
    g = filters.select_variable(events_grid(spark, sf_dir), "signup")
    out = zonal.zonal_stats(g, rows, keys=("variable",), res_deg=RES)
    return out.select(
        "boundary_id", "level", "name", "variable",
        _r4("mean").alias("mean"), _r4("min").alias("min"),
        _r4("max").alias("max"), _r4("sum").alias("sum"),
        _r4("std").alias("std"), "count")


SQL_ZONAL_STATS = GRID_CTE + """
, boxes(boundary_id, level, name, w, s, e, n) AS (VALUES
  (1, 1, 'west_box', -7.5, -6.0, 0.0, 6.0),
  (2, 1, 'east_box', 0.0, -6.0, 7.5, 6.0),
  (3, 2, 'inner_box', -2.0, -2.0, 3.0, 3.0),
  (4, 2, 'faraway', 100.0, 100.0, 101.0, 101.0)),
stats AS (
  SELECT b.boundary_id, g.variable,
         AVG(g.value) AS mean, MIN(g.value) AS min, MAX(g.value) AS max,
         SUM(g.value) AS sum,
         SQRT(AVG(g.value * g.value) - AVG(g.value) * AVG(g.value)) AS std,
         COUNT(g.value) AS count
  FROM boxes b JOIN grid g
    ON g.variable = 'signup'
   AND g.lon >= b.w AND g.lon < b.e AND g.lat >= b.s AND g.lat < b.n
  GROUP BY b.boundary_id, g.variable)
SELECT b.boundary_id, b.level, b.name, s.variable,
       ROUND(s.mean, 4) AS mean, ROUND(s.min, 4) AS min, ROUND(s.max, 4) AS max,
       ROUND(s.sum, 4) AS sum, ROUND(s.std, 4) AS std, s.count
FROM boxes b LEFT JOIN stats s USING (boundary_id)
"""


def q_zonal_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + GROUPING SETS — per-boundary stats and per-admin-level
    rollups in one aggregation pass (the reference loops levels,
    analysis/zonal_stats/service.py:160-176)."""
    boxes = [
        (1, 1, "west_box", -7.5, -6.0, 0.0, 6.0),
        (2, 1, "east_box", 0.0, -6.0, 7.5, 6.0),
        (3, 2, "inner_box", -2.0, -2.0, 3.0, 3.0),
    ]
    rows = []
    for bid, level, name, w, s, e, n in boxes:
        gj = ('{"type": "Polygon", "coordinates": [[[%f, %f], [%f, %f], '
              '[%f, %f], [%f, %f], [%f, %f]]]}' % (w, s, e, s, e, n, w, n, w, s))
        rows.append((bid, level, name, gj))
    g = filters.select_variable(events_grid(spark, sf_dir), "signup")
    out = zonal.zonal_rollup(g, rows, keys=("variable",), res_deg=RES)
    return out.select(
        "level", "boundary_id", "name", "variable",
        _r4("mean").alias("mean"), _r4("sum").alias("sum"),
        _r4("std").alias("std"), "count")


SQL_ZONAL_ROLLUP = GRID_CTE + """
, boxes(boundary_id, level, name, w, s, e, n) AS (VALUES
  (1, 1, 'west_box', -7.5, -6.0, 0.0, 6.0),
  (2, 1, 'east_box', 0.0, -6.0, 7.5, 6.0),
  (3, 2, 'inner_box', -2.0, -2.0, 3.0, 3.0))
SELECT b.level, b.boundary_id, b.name, g.variable,
       ROUND(AVG(g.value), 4) AS mean, ROUND(SUM(g.value), 4) AS sum,
       ROUND(SQRT(AVG(g.value * g.value) - AVG(g.value) * AVG(g.value)), 4)
         AS std,
       COUNT(g.value) AS count
FROM boxes b JOIN grid g
  ON g.variable = 'signup'
 AND g.lon >= b.w AND g.lon < b.e AND g.lat >= b.s AND g.lat < b.n
GROUP BY GROUPING SETS ((b.level, b.boundary_id, b.name, g.variable),
                        (b.level, g.variable))
"""


def q_area_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — polygon-masked (triangle — a genuinely non-rectangular mask)
    spatial mean per day."""
    tri = ('{"type": "Polygon", "coordinates": '
           '[[[0.0, 0.0], [8.2, 0.0], [0.0, 8.2], [0.0, 0.0]]]}')
    g = filters.select_variable(events_grid(spark, sf_dir), "view")
    daily = (g.groupBy("collection", "variable", "y", "x", "lat", "lon",
                       F.date_trunc("day", "time").alias("time"))
              .agg((F.sum(_dec(F.col("value"))).cast("double") /
                    F.count("value")).alias("value")))
    return (zonal.area_timeseries(daily, tri, how="mean")
            .select("variable", "time", _r4("value").alias("value")))


SQL_AREA_TIMESERIES = GRID_CTE + """
, daily AS (
  SELECT variable, y, x, lat, lon, CAST(date_trunc('day', time) AS TIMESTAMP) AS time,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS value
  FROM grid WHERE variable = 'view'
  GROUP BY variable, y, x, lat, lon, date_trunc('day', time))
SELECT variable, time, ROUND(AVG(value), 4) AS value
FROM daily
WHERE lon >= 0.0 AND lat >= 0.0 AND lon + lat <= 8.2
GROUP BY variable, time
"""


def q_point_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — nearest-pixel point series via exact affine index arithmetic
    (no join, no shuffle; partition-prunable equi-filter)."""
    g = events_grid(spark, sf_dir)
    pt = timeseries.point_timeseries(g, lat=0.2, lon=0.3,
                                     lat0=LAT0, lon0=LON0, res=RES)
    return (pt.groupBy("variable", "y", "x",
                       F.date_trunc("day", "time").alias("time"))
              .agg((F.sum(_dec(F.col("value"))).cast("double") /
                    F.count("value")).alias("value")))


SQL_POINT_TIMESERIES = GRID_CTE + """
SELECT variable, y, x, CAST(date_trunc('day', time) AS TIMESTAMP) AS time,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS value
FROM grid
WHERE y = 6 AND x = 7
GROUP BY variable, y, x, date_trunc('day', time)
"""


def q_vector_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/J2 — u/v channel alignment join + magnitude & meteorological
    direction (ingestion/extractor.py:203-237). sqrt(u²+v²) instead of
    hypot so both engines evaluate the identical IEEE expression."""
    g = events_grid(spark, sf_dir)
    mk = lambda var, name: (
        filters.select_variable(g, var)
        .groupBy("y", "x", F.date_trunc("day", "time").alias("time"))
        .agg((F.sum(_dec(F.col("value"))).cast("double") /
              F.count("value")).alias(name)))
    u, v = mk("click", "u"), mk("view", "v")
    j = u.join(v, ["y", "x", "time"], "inner")
    return j.select(
        "y", "x", "time",
        _r4(F.sqrt(F.col("u") * F.col("u") + F.col("v") * F.col("v"))).alias("speed"),
        _r4(vector_direction(F.col("u"), F.col("v"))).alias("direction"))


SQL_VECTOR_TRANSFORM = GRID_CTE + """
, u AS (
  SELECT y, x, CAST(date_trunc('day', time) AS TIMESTAMP) AS time,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS u
  FROM grid WHERE variable = 'click' GROUP BY y, x, date_trunc('day', time)),
v AS (
  SELECT y, x, CAST(date_trunc('day', time) AS TIMESTAMP) AS time,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS v
  FROM grid WHERE variable = 'view' GROUP BY y, x, date_trunc('day', time))
SELECT y, x, time,
       ROUND(SQRT(u * u + v * v), 4) AS speed,
       ROUND(FMOD(FMOD(DEGREES(ATAN2(u, v)) + 180.0, 360.0) + 360.0, 360.0), 4) AS direction
FROM u JOIN v USING (y, x, time)
"""


def q_raster_combine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — n-ary nan-aware combine across channels per pixel-day:
    sum/min/max/mean + renormalizing weighted mean."""
    g = events_grid(spark, sf_dir).withColumn("time", F.date_trunc("day", "time"))
    weights = {"click": 3.0, "view": 1.0, "error": 2.0}
    wcol = F.coalesce(*[F.when(F.col("variable") == k, F.lit(w))
                        for k, w in weights.items()], F.lit(0.0))
    vdec = _dec(F.col("value"))
    return (g.groupBy("y", "x", "time")
             .agg(F.sum(vdec).cast("double").alias("sum"),
                  F.min("value").alias("min"),
                  F.max("value").alias("max"),
                  (F.sum(vdec).cast("double") / F.count("value")).alias("mean"),
                  safe_divide(
                      F.sum(_dec(F.col("value") * wcol, 4)).cast("double"),
                      F.sum(F.when(F.col("value").isNotNull(), wcol)
                            .otherwise(F.lit(0.0)))).alias("wmean")))


SQL_RASTER_COMBINE = GRID_CTE + """
SELECT y, x, CAST(date_trunc('day', time) AS TIMESTAMP) AS time,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum,
  MIN(value) AS min, MAX(value) AS max,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS mean,
  (CASE WHEN SUM(CASE WHEN value IS NOT NULL THEN
                (CASE variable WHEN 'click' THEN 3.0 WHEN 'view' THEN 1.0
                 WHEN 'error' THEN 2.0 ELSE 0.0 END) ELSE 0.0 END) = 0 THEN NULL
        ELSE CAST(SUM(CAST(value * (CASE variable WHEN 'click' THEN 3.0 WHEN 'view' THEN 1.0
                    WHEN 'error' THEN 2.0 ELSE 0.0 END) AS DECIMAL(18,4))) AS DOUBLE)
        / SUM(CASE WHEN value IS NOT NULL THEN
                (CASE variable WHEN 'click' THEN 3.0 WHEN 'view' THEN 1.0
                 WHEN 'error' THEN 2.0 ELSE 0.0 END) ELSE 0.0 END) END) AS wmean
FROM grid GROUP BY y, x, date_trunc('day', time)
"""


def q_unit_rescale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 + export encoding — linear unit conversion (offset units are
    trivial as column exprs) and clamp-rescale to 0-255."""
    g = filters.select_variable(events_grid(spark, sf_dir), "error")
    return g.select(
        "time", "y", "x",
        unit_conversion_expr(F.col("value"), 1.8, 32.0).alias("converted"),
        rescale_255(F.col("value"), 0.0, 20.0).alias("encoded"))


SQL_UNIT_RESCALE = GRID_CTE + """
SELECT time, y, x,
       value * 1.8 + 32.0 AS converted,
       LEAST(GREATEST((value - 0.0) / 20.0 * 255.0, 0.0), 255.0) AS encoded
FROM grid WHERE variable = 'error'
"""


def q_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — collection spatiotemporal extent rollup."""
    return stats.collection_extent(events_grid(spark, sf_dir),
                                   keys=("collection", "variable"))


SQL_EXTENT = GRID_CTE + """
SELECT collection, variable, MIN(time) AS time_min, MAX(time) AS time_max,
       MIN(lon) AS west, MAX(lon) AS east, MIN(lat) AS south, MAX(lat) AS north
FROM grid GROUP BY collection, variable
"""


def q_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — per-channel min/max/mean/std from exact sums (closed-form
    population std, matching numpy ddof=0)."""
    g = events_grid(spark, sf_dir)
    n = F.count("value").cast("double")
    s1 = F.sum(_dec(F.col("value"))).cast("double")
    s2 = F.sum(_dec(F.col("value")) * _dec(F.col("value"))).cast("double")
    return (g.groupBy("variable")
             .agg(F.min("value").alias("stats_min"),
                  F.max("value").alias("stats_max"),
                  (s1 / n).alias("stats_mean"),
                  F.sqrt(s2 / n - (s1 / n) * (s1 / n)).alias("stats_std"),
                  F.count("value").alias("valid_count")))


SQL_GLOBAL_STATS = GRID_CTE + """
SELECT variable, MIN(value) AS stats_min, MAX(value) AS stats_max,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(value) AS DOUBLE) AS stats_mean,
  SQRT(CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(value) AS DOUBLE)
        - (CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(value) AS DOUBLE))
        * (CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(value) AS DOUBLE))) AS stats_std,
  COUNT(value) AS valid_count
FROM grid GROUP BY variable
"""


def q_season_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — calendar-month season selection (DJF) + per-channel count."""
    g = filters.season_filter(events_grid(spark, sf_dir), "DJF")
    return g.groupBy("variable").agg(F.count(F.lit(1)).alias("n"))


SQL_SEASON_FILTER = GRID_CTE + """
SELECT variable, COUNT(*) AS n FROM grid
WHERE CAST(EXTRACT(MONTH FROM time) AS INTEGER) IN (12, 1, 2)
GROUP BY variable
"""


# ---------------------------------------------------------------------------
# LLM-pipeline layer: documents / embeddings
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash-groupBy (scale path: shuffle on hash,
    not on text)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_duplicates(docs)


SQL_DEDUP_EXACT = """
SELECT MD5(text) AS content_hash, MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS dup_count
FROM documents GROUP BY MD5(text)
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality scoring: token counts, avg token length, stopword
    ratio — all JVM-side higher-order array functions."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.quality_scores(docs)


SQL_TEXT_QUALITY = """
WITH toks AS (
  SELECT doc_id, lang, n_chars, string_split(text, ' ') AS tokens FROM documents)
SELECT doc_id, lang, n_chars, LEN(tokens) AS token_count,
  CAST(n_chars - LEN(tokens) + 1 AS DOUBLE) / LEN(tokens) AS avg_token_len,
  CAST(LEN(list_filter(tokens, t -> t IN ('the', 'a', 'of', 'and', 'to', 'in')))
        AS DOUBLE) / LEN(tokens) AS stopword_ratio
FROM toks
"""


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rollup per (lang, source): counts + exact char sums."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 (F.sum("n_chars").cast("double") /
                  F.count(F.lit(1))).alias("avg_chars")))


SQL_DOC_STATS = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents GROUP BY lang, source
"""


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline: query vector broadcast against
    the corpus, JVM-side zip_with/aggregate dot products, top-5."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_brute_force(emb, query_vec_id=0, k=5)


SQL_KNN_COSINE = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT e.vec_id,
    (SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
     FROM generate_series(1, 64) AS t(i)) AS dot,
    SQRT((SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
     FROM generate_series(1, 64) AS t(i))) AS na,
    SQRT((SELECT SUM(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))
     FROM generate_series(1, 64) AS t(i))) AS nb
  FROM embeddings e, q WHERE e.vec_id <> 0)
SELECT vec_id, ROUND(dot / (na * nb), 4) AS cosine
FROM sims ORDER BY dot / (na * nb) DESC, vec_id LIMIT 5
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# The correctness driver records only the FIRST 50 entries of QUERIES.
# Rotate queries that still lack a recorded green CORRECTNESS row (plus
# any just-fixed or brand-new queries) to the front; the twice-proven
# round-1 block goes to the back. Keep rotating each round until every
# query has a recorded row.
_DRIVER_PRIORITY = [
    # r5 rotation. The driver records the FIRST 50 entries of QUERIES.
    # Front: the four rows non-green in r4, each with its root-cause fix
    # landed this round (bpe_train/zarr_v3_fill: uncast DuckDB HUGEINT
    # SUM now CAST AS BIGINT; quantize_emb: array column serialized to a
    # string on both sides; approx_distinct: first real oracle — exact
    # count + within_rsd bool), plus dup_spans whose document-frequency
    # shape changed (window-on-gram -> skew-safe two-level agg + join).
    # Then the 49 queries whose latest record is r2 — the stalest — to
    # refresh the rotating window (45 fit; the tail catches r6).
    "bpe_train",
    "zarr_v3_fill",
    "quantize_emb",
    "approx_distinct",
    "dup_spans",
    "pricing_summary",
    "revenue_join",
    "time_filter",
    "keyset_page",
    "latest_per_user",
    "latest_run_steps",
    "status_rollup",
    "distinct_days",
    "anti_join",
    "semi_join",
    "safe_divide",
    "rollup_sets",
    "bbox_subset",
    "resample_daily",
    "climatology",
    "anomaly",
    "trend",
    "zonal_stats",
    "area_timeseries",
    "point_timeseries",
    "vector_transform",
    "raster_combine",
    "unit_rescale",
    "extent",
    "global_stats",
    "season_filter",
    "dedup_exact",
    "text_quality",
    "doc_stats",
    "knn_cosine",
    "rolling_window",
    "union_concat",
    "drop_duplicates",
    "regional_revenue",
    "topk_per_group",
    "cube_rollup",
    "lod_pyramid",
    "regrid_coarse",
    "json_extract",
    "checksum",
    "path_grammar",
    "tile_pack",
    "sessionize",
    "percentiles",
    "zonal_rollup",
    "ingest_geotiff",
    "ingest_netcdf",
    "ingest_grib2",
    "webmercator_tiles",
]

_BASE_QUERIES: dict[str, QueryFn] = {
    "pricing_summary": q_pricing_summary,
    "revenue_join": q_revenue_join,
    "time_filter": q_time_filter,
    "keyset_page": q_keyset_page,
    "latest_per_user": q_latest_per_user,
    "latest_run_steps": q_latest_run_steps,
    "status_rollup": q_status_rollup,
    "distinct_days": q_distinct_days,
    "anti_join": q_anti_join,
    "semi_join": q_semi_join,
    "safe_divide": q_safe_divide,
    "rollup_sets": q_rollup_sets,
    "bbox_subset": q_bbox_subset,
    "resample_daily": q_resample_daily,
    "climatology": q_climatology,
    "anomaly": q_anomaly,
    "trend": q_trend,
    "zonal_stats": q_zonal_stats,
    "zonal_rollup": q_zonal_rollup,
    "area_timeseries": q_area_timeseries,
    "point_timeseries": q_point_timeseries,
    "vector_transform": q_vector_transform,
    "raster_combine": q_raster_combine,
    "unit_rescale": q_unit_rescale,
    "extent": q_extent,
    "global_stats": q_global_stats,
    "season_filter": q_season_filter,
    "dedup_exact": q_dedup_exact,
    "text_quality": q_text_quality,
    "doc_stats": q_doc_stats,
    "knn_cosine": q_knn_cosine,
    **EXT_QUERIES,
}

QUERIES: dict[str, QueryFn] = {
    **{k: _BASE_QUERIES[k] for k in _DRIVER_PRIORITY if k in _BASE_QUERIES},
    **{k: v for k, v in _BASE_QUERIES.items() if k not in _DRIVER_PRIORITY},
}

ORACLES: dict[str, str] = {
    "pricing_summary": SQL_PRICING_SUMMARY,
    "revenue_join": SQL_REVENUE_JOIN,
    "time_filter": SQL_TIME_FILTER,
    "keyset_page": SQL_KEYSET_PAGE,
    "latest_per_user": SQL_LATEST_PER_USER,
    "latest_run_steps": SQL_LATEST_RUN_STEPS,
    "status_rollup": SQL_STATUS_ROLLUP,
    "distinct_days": SQL_DISTINCT_DAYS,
    "anti_join": SQL_ANTI_JOIN,
    "semi_join": SQL_SEMI_JOIN,
    "safe_divide": SQL_SAFE_DIVIDE,
    "rollup_sets": SQL_ROLLUP_SETS,
    "bbox_subset": SQL_BBOX_SUBSET,
    "resample_daily": SQL_RESAMPLE_DAILY,
    "climatology": SQL_CLIMATOLOGY,
    "anomaly": SQL_ANOMALY,
    "trend": SQL_TREND,
    "zonal_stats": SQL_ZONAL_STATS,
    "zonal_rollup": SQL_ZONAL_ROLLUP,
    "area_timeseries": SQL_AREA_TIMESERIES,
    "point_timeseries": SQL_POINT_TIMESERIES,
    "vector_transform": SQL_VECTOR_TRANSFORM,
    "raster_combine": SQL_RASTER_COMBINE,
    "unit_rescale": SQL_UNIT_RESCALE,
    "extent": SQL_EXTENT,
    "global_stats": SQL_GLOBAL_STATS,
    "season_filter": SQL_SEASON_FILTER,
    "dedup_exact": SQL_DEDUP_EXACT,
    "text_quality": SQL_TEXT_QUALITY,
    "doc_stats": SQL_DOC_STATS,
    "knn_cosine": SQL_KNN_COSINE,
    **EXT_ORACLES,
}
