"""Query registry extension: deeper SURVEY §2 coverage.

Oracle-checked: J5 nearest-time (min_by), W4 rolling window (decimal-exact
frame sums), U1 union-concat, U2 dropDuplicates, deep dim-chain join (Q5
shape), top-k per group, cube rollup.
Rows-only (non-SQL-expressible in DuckDB, driver records weaker check):
MinHash-LSH pairs, SimHash codes, n-gram Jaccard, language ID, winnowing
fingerprints, SRP-LSH kNN, multimodal feature extraction.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from georiva_spark.operators import dedup, multimodal as mm, similarity, textops
from georiva_spark.operators.timeseries import nearest_time
from georiva_spark.sources.synthetic import EVENTS_GRID_SQL, events_grid
from georiva_spark.sources.tables import load_table

GRID_CTE = f"WITH grid AS ({EVENTS_GRID_SQL})"


def _dec(c, scale: int = 2):
    return c.cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Oracle-checked
# ---------------------------------------------------------------------------

def q_nearest_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — per-pixel nearest-time select via min_by on (|Δt|, time)."""
    g = events_grid(spark, sf_dir)
    out = nearest_time(g, dt.datetime(2024, 1, 15, 12, 0, 0))
    return out.select("variable", "y", "x", "time", "value")


SQL_NEAREST_TIME = GRID_CTE + """
SELECT variable, y, x, time, value FROM (
  SELECT variable, y, x, time, value, ROW_NUMBER() OVER (
    PARTITION BY variable, y, x
    ORDER BY ABS(EPOCH(time) - EPOCH(TIMESTAMP '2024-01-15 12:00:00')), time
  ) AS rn FROM grid) WHERE rn = 1
"""


def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — rolling 7-day mean per pixel (CHIRPS rolling anomaly shape,
    ADR-0007): range frame over day numbers; frame sums in DECIMAL so the
    segment-tree vs sequential accumulation of the two engines can't
    diverge."""
    g = events_grid(spark, sf_dir).where(F.col("variable") == "purchase")
    daily = (g.groupBy("y", "x", F.date_trunc("day", "time").alias("day"))
              .agg(F.sum(_dec(F.col("value"))).alias("dsum"),
                   F.count("value").alias("dn")))
    daily = daily.withColumn(
        "daynum", F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")))
    w = (Window.partitionBy("y", "x").orderBy("daynum")
         .rangeBetween(-6, 0))
    return (daily.select(
        "y", "x", F.col("day").cast("timestamp").alias("day"),
        (F.sum("dsum").over(w).cast("double") /
         F.sum("dn").over(w)).alias("rolling_mean")))


SQL_ROLLING_WINDOW = GRID_CTE + """
, daily AS (
  SELECT y, x, date_trunc('day', time) AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS dsum, COUNT(value) AS dn,
         DATE_DIFF('day', DATE '2024-01-01', CAST(date_trunc('day', time) AS DATE)) AS daynum
  FROM grid WHERE variable = 'purchase' GROUP BY y, x, date_trunc('day', time))
SELECT y, x, CAST(day AS TIMESTAMP) AS day,
  CAST(SUM(dsum) OVER w AS DOUBLE) / SUM(dn) OVER w AS rolling_mean
FROM daily
WINDOW w AS (PARTITION BY y, x ORDER BY daynum RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_union_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — multi-source concat along time (xr.concat analog): two disjoint
    halves of the series unioned back, then counted per channel."""
    g = events_grid(spark, sf_dir)
    first = g.where(F.col("time") < F.lit("2024-01-15"))
    second = g.where(F.col("time") >= F.lit("2024-01-15"))
    return (first.unionByName(second)
            .groupBy("variable")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("time").alias("tmin"), F.max("time").alias("tmax")))


SQL_UNION_CONCAT = GRID_CTE + """
SELECT variable, COUNT(*) AS n, MIN(time) AS tmin, MAX(time) AS tmax
FROM (SELECT * FROM grid WHERE time < TIMESTAMP '2024-01-15'
      UNION ALL
      SELECT * FROM grid WHERE time >= TIMESTAMP '2024-01-15')
GROUP BY variable
"""


def q_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — lineage-source dedup analog: distinct (user, event_type)."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.select("user_id", "event_type")
            .dropDuplicates(["user_id", "event_type"]))


SQL_DROP_DUPLICATES = """
SELECT DISTINCT user_id, event_type FROM events
"""


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 deep dim chain (TPC-H Q5 shape): region⋈nation⋈customer⋈orders⋈
    lineitem revenue per nation. region/nation are bounded dims → explicit
    broadcast; customer/orders scale with the fact → AQE chooses (broadcast
    at small SF, shuffle join with skew split at 100 TB)."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(18,2)") - _dec(F.col("l_discount")))
    dims = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .select("c_custkey", "n_name"))
    return (li.join(o.where(F.col("o_orderdate") >= F.lit("1996-01-01")),
                    li.l_orderkey == o.o_orderkey)
              .join(dims, F.col("o_custkey") == F.col("c_custkey"))
              .groupBy("n_name")
              .agg(F.sum(rev).cast("double").alias("revenue"),
                   F.count(F.lit(1)).alias("n_items")))


SQL_REGIONAL_REVENUE = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n_name
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per user (rank-window top-k, the per-query
    pattern behind knn_all_pairs_topk)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"),
                                              F.asc("event_id"))
    return (ev.withColumn("rk", F.row_number().over(w))
              .where(F.col("rk") <= 3)
              .select("user_id", "event_id", "value", "rk"))


SQL_TOPK_PER_GROUP = """
SELECT user_id, event_id, value, rk FROM (
  SELECT user_id, event_id, value, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
  FROM events) WHERE rk <= 3
"""


def q_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, user bucket): all four grouping combinations
    (the admin-level × season rollup shape)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (ev.user_id % 3).alias("user_bucket")
    return (ev.select("event_type", bucket, "value")
            .cube("event_type", "user_bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(_dec(F.col("value"))).cast("double").alias("total")))


SQL_CUBE_ROLLUP = """
SELECT event_type, user_id % 3 AS user_bucket, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events GROUP BY CUBE(event_type, user_id % 3)
"""


def q_lod_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overview-pyramid analog (COG overviews → LOD tables, SURVEY §4):
    levels 0..2 by 2× index decimation with per-level mean."""
    from georiva_spark.operators.regrid import overview_pyramid
    g = events_grid(spark, sf_dir).where(F.col("variable") == "view")
    daily = (g.groupBy("collection", "variable", "y", "x", "lat", "lon",
                       F.date_trunc("day", "time").alias("time"))
              .agg((F.sum(_dec(F.col("value"))).cast("double") /
                    F.count("value")).alias("value")))
    pyr = overview_pyramid(daily, levels=2)
    return (pyr.groupBy("level")
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.round(F.avg("value"), 4).alias("mean_value")))


SQL_LOD_PYRAMID = GRID_CTE + """
, daily AS (
  SELECT y, x, date_trunc('day', time) AS time,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS value
  FROM grid WHERE variable = 'view' GROUP BY y, x, date_trunc('day', time)),
lvl1 AS (SELECT y // 2 AS y, x // 2 AS x, time,
                AVG(value) AS value FROM daily GROUP BY 1, 2, time),
lvl2 AS (SELECT y // 4 AS y, x // 4 AS x, time,
                AVG(value) AS value FROM daily GROUP BY 1, 2, time),
pyr AS (
  SELECT 0 AS level, value FROM daily
  UNION ALL SELECT 1, value FROM lvl1
  UNION ALL SELECT 2, value FROM lvl2)
SELECT level, COUNT(*) AS n_cells, ROUND(AVG(value), 4) AS mean_value
FROM pyr GROUP BY level
"""


def q_regrid_coarse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-regrid the events grid onto 3-degree cells (rasterio
    Resampling.average analog as a groupBy)."""
    from georiva_spark.operators.regrid import regrid_average
    g = events_grid(spark, sf_dir).withColumn("time", F.date_trunc("day", "time"))
    out = regrid_average(g.where(F.col("variable") == "click"),
                         dst=(-6.0, -7.5, 3.0))
    return out.select("variable", "time", "y", "x", "lat", "lon",
                      F.round("value", 4).alias("value"), "n_source")


SQL_REGRID_COARSE = GRID_CTE + """
SELECT variable, CAST(date_trunc('day', time) AS TIMESTAMP) AS time,
       CAST(FLOOR((lat - (-6.0)) / 3.0) AS BIGINT) AS y,
       CAST(FLOOR((lon - (-7.5)) / 3.0) AS BIGINT) AS x,
       CAST(-6.0 + (CAST(FLOOR((lat - (-6.0)) / 3.0) AS BIGINT) + 0.5) * 3.0 AS DOUBLE) AS lat,
       CAST(-7.5 + (CAST(FLOOR((lon - (-7.5)) / 3.0) AS BIGINT) + 0.5) * 3.0 AS DOUBLE) AS lon,
       ROUND(AVG(value), 4) AS value, COUNT(value) AS n_source
FROM grid WHERE variable = 'click'
GROUP BY variable, date_trunc('day', time),
         CAST(FLOOR((lat - (-6.0)) / 3.0) AS BIGINT),
         CAST(FLOOR((lon - (-7.5)) / 3.0) AS BIGINT)
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 JSON family — properties access (processing/engine.py:224-237
    reads derivation.input_hash from JSON properties)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (ev.select("event_id", k.alias("k"))
            .groupBy((F.col("k") % 10).alias("k_bucket"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("k_sum")))


SQL_JSON_EXTRACT = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum
FROM events GROUP BY 1
"""


def q_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 hash family — sha256 of a canonical field serialization
    (recipe.py:28-42 input-hash shape), checkable bit-for-bit."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 100)
    canon = F.concat_ws("|", F.col("o_orderkey").cast("string"),
                        F.col("o_orderstatus"),
                        F.date_format("o_orderdate", "yyyy-MM-dd"))
    return o.select("o_orderkey", F.sha2(canon, 256).alias("checksum"))


SQL_CHECKSUM = """
SELECT o_orderkey,
       sha256(CONCAT(CAST(o_orderkey AS VARCHAR), '|', o_orderstatus, '|',
                     strftime(o_orderdate, '%Y-%m-%d'))) AS checksum
FROM orders WHERE o_orderkey < 100
"""


def q_path_grammar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 string family — storage-path build + parse round trip
    (core/storage/manager.py:466 grammar)."""
    ev = load_table(spark, sf_dir, "events")
    path = F.concat_ws(
        "/", F.lit("default"), F.lit("t"), F.col("event_type"),
        F.lit("value"), F.date_format("ts", "yyyy/MM/dd"),
        F.concat(F.lit("f"), F.col("event_id").cast("string"), F.lit(".npz")))
    parsed = F.regexp_extract(path, r"^[^/]+/[^/]+/([^/]+)/", 1)
    return (ev.select(F.col("event_id"), path.alias("path"),
                      parsed.alias("collection_from_path"))
            .where(F.col("event_id") < 200))


SQL_PATH_GRAMMAR = """
SELECT event_id,
       CONCAT('default/t/', event_type, '/value/', strftime(ts, '%Y/%m/%d'),
              '/f', CAST(event_id AS VARCHAR), '.npz') AS path,
       regexp_extract(CONCAT('default/t/', event_type, '/value/',
                             strftime(ts, '%Y/%m/%d'), '/f',
                             CAST(event_id AS VARCHAR), '.npz'),
                      '^[^/]+/[^/]+/([^/]+)/', 1) AS collection_from_path
FROM events WHERE event_id < 200
"""


def q_tile_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-array packing (TILES_SCHEMA, COG-blocking analog): daily grid →
    4×4 tiles; per-tile valid-pixel count and sum are SQL-checkable even
    though the packed arrays themselves aren't."""
    from georiva_spark.operators.tiles import to_tiles
    g = events_grid(spark, sf_dir).where(F.col("variable") == "signup")
    daily = (g.groupBy("collection", "variable", "y", "x",
                       F.date_trunc("day", "time").alias("time"))
              .agg(F.sum(_dec(F.col("value"))).cast("double").alias("value")))
    t = to_tiles(daily, tile_size=4)
    valid = F.filter("values", lambda v: v.isNotNull())
    return t.select(
        "variable", "time", "tile_y", "tile_x",
        F.size(valid).alias("n_valid"),
        F.round(F.aggregate(valid, F.lit(0.0), lambda a, v: a + v), 4)
         .alias("tile_sum"))


SQL_TILE_PACK = GRID_CTE + """
, daily AS (
  SELECT variable, y, x, CAST(date_trunc('day', time) AS TIMESTAMP) AS time,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
  FROM grid WHERE variable = 'signup' GROUP BY variable, y, x, date_trunc('day', time))
SELECT variable, time, CAST(y // 4 AS INTEGER) AS tile_y,
       CAST(x // 4 AS INTEGER) AS tile_x,
       COUNT(value) AS n_valid, ROUND(SUM(value), 4) AS tile_sum
FROM daily GROUP BY variable, time, y // 4, x // 4
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (session_window stateful aggregation, the
    streaming-native form) checked against the LAG+cumsum SQL formulation.
    Session sums of 2-decimal values round(4)-safely (exact rationals)."""
    from georiva_spark.streaming.sessions import sessionize_declarative
    ev = load_table(spark, sf_dir, "events")
    out = sessionize_declarative(ev, gap="10 minutes")
    return out.select("user_id", "session_start", "session_end", "n_events",
                      F.round("total_value", 4).alias("total_value"))


SQL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR ts - LAG(ts) OVER w > INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts, value,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 10 MINUTE AS session_end,
       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
FROM sess GROUP BY user_id, sid
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per channel (styling-range analog of
    A8: value_min/value_max percentile clipping). Sort-based — value order,
    not accumulation order, determines the result in both engines."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.percentile("value", 0.25).alias("p25"),
                 F.percentile("value", 0.5).alias("p50"),
                 F.percentile("value", 0.9).alias("p90")))


SQL_PERCENTILES = """
SELECT event_type,
       quantile_cont(value, 0.25) AS p25,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90
FROM events GROUP BY event_type
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approx-distinct users per event type — the cardinality path at
    100 TB where exact COUNT(DISTINCT) would shuffle every key. Rows-only
    (sketch values are engine-specific); exactness is asserted separately
    in tests at small scale."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
                 F.count(F.lit(1)).alias("n")))


# ---------------------------------------------------------------------------
# Rows-only (no DuckDB equivalent; driver records rows-only check)
# ---------------------------------------------------------------------------

def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, threshold=0.3)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.2)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs)


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return textops.language_id(docs)


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (textops.fingerprint(docs)
            .select("doc_id", F.size("fingerprints").alias("n_fingerprints")))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return textops.token_count_bpe_ish(docs)


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_lsh(emb, query_vec_id=0, k=5, planes=6)


def q_knn_all_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)  # 8 query vectors
    return similarity.knn_all_pairs_topk(emb, k=3, queries=queries)


def _embeddings_as_media(spark: SparkSession, sf_dir: str,
                         kind: str) -> DataFrame:
    """Deterministic media payloads from the embeddings table: each 64-dim
    vector becomes an 8×8 RAW image / 64-sample RAW audio clip. Exercises
    the real binary-column plumbing without external decoders."""
    emb = load_table(spark, sf_dir, "embeddings")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                a = np.asarray(r["embedding"], dtype=np.float32)
                if kind == "image":
                    content = mm.encode_raw_image(a.reshape(8, 8))
                else:
                    content = mm.encode_raw_audio(a, rate=64)
                rows.append((int(r["vec_id"]), kind, content,
                             f"{kind}/raw"))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content",
                                              "mime"])

    return emb.mapInPandas(
        gen, schema="media_id long, kind string, content binary, mime string")


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _embeddings_as_media(spark, sf_dir, "image")
    return mm.image_features(media)


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _embeddings_as_media(spark, sf_dir, "image")
    return (mm.resize_images(media, 4, 4)
            .select("media_id", "height", "width", F.length("content")
                    .alias("payload_bytes")))


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _embeddings_as_media(spark, sf_dir, "audio")
    return mm.audio_features(media)


EXT_QUERIES = {
    "nearest_time": q_nearest_time,
    "rolling_window": q_rolling_window,
    "union_concat": q_union_concat,
    "drop_duplicates": q_drop_duplicates,
    "regional_revenue": q_regional_revenue,
    "topk_per_group": q_topk_per_group,
    "cube_rollup": q_cube_rollup,
    "lod_pyramid": q_lod_pyramid,
    "regrid_coarse": q_regrid_coarse,
    "json_extract": q_json_extract,
    "checksum": q_checksum,
    "path_grammar": q_path_grammar,
    "tile_pack": q_tile_pack,
    "sessionize": q_sessionize,
    "percentiles": q_percentiles,
    "approx_distinct": q_approx_distinct,
    "minhash_dedup": q_minhash_dedup,
    "ngram_jaccard": q_ngram_jaccard,
    "simhash": q_simhash,
    "language_id": q_language_id,
    "fingerprints": q_fingerprints,
    "token_counts": q_token_counts,
    "knn_lsh": q_knn_lsh,
    "knn_all_topk": q_knn_all_topk,
    "image_features": q_image_features,
    "image_resize": q_image_resize,
    "audio_features": q_audio_features,
}

EXT_ORACLES = {
    "nearest_time": SQL_NEAREST_TIME,
    "rolling_window": SQL_ROLLING_WINDOW,
    "union_concat": SQL_UNION_CONCAT,
    "drop_duplicates": SQL_DROP_DUPLICATES,
    "regional_revenue": SQL_REGIONAL_REVENUE,
    "topk_per_group": SQL_TOPK_PER_GROUP,
    "cube_rollup": SQL_CUBE_ROLLUP,
    "lod_pyramid": SQL_LOD_PYRAMID,
    "regrid_coarse": SQL_REGRID_COARSE,
    "json_extract": SQL_JSON_EXTRACT,
    "checksum": SQL_CHECKSUM,
    "path_grammar": SQL_PATH_GRAMMAR,
    "tile_pack": SQL_TILE_PACK,
    "sessionize": SQL_SESSIONIZE,
    "percentiles": SQL_PERCENTILES,
}
