"""Similarity search over embedding columns (north-star ops): brute-force
cosine top-k as the exact baseline; LSH-bucketed variant as the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from georiva_spark.functions.vectors import cosine_similarity, dot


def knn_brute_force(emb: DataFrame, query_vec_id: int, k: int = 5) -> DataFrame:
    """Exact top-k by cosine for one query vector.

    The 1-row query side is broadcast; the corpus is scanned once with a
    JVM-side dot product — at 100 TB this is a single pass, no shuffle
    except the final top-k (limit pushes partial top-k to each partition).
    """
    q = emb.where(F.col("vec_id") == query_vec_id) \
           .select(F.col("embedding").alias("qe"))
    cos = cosine_similarity(F.col("embedding"), F.col("qe"))
    return (emb.crossJoin(F.broadcast(q))
            .where(F.col("vec_id") != query_vec_id)
            .select("vec_id", cos.alias("_cos"))
            .orderBy(F.desc("_cos"), F.asc("vec_id"))
            .limit(k)
            .select("vec_id", F.round("_cos", 4).alias("cosine")))


def knn_all_pairs_topk(emb: DataFrame, k: int = 5,
                       queries: DataFrame | None = None) -> DataFrame:
    """Top-k neighbours for every query vector (defaults: corpus × corpus).

    Broadcast the smaller (query) side; rank per query with a window —
    partial aggregation keeps only k rows per query per partition.
    """
    queries = queries or emb
    q = queries.select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("qe"))
    cos = cosine_similarity(F.col("embedding"), F.col("qe"))
    scored = (emb.crossJoin(F.broadcast(q))
              .where(F.col("vec_id") != F.col("q_id"))
              .select("q_id", "vec_id", cos.alias("cosine")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k).drop("_rn"))


def random_hyperplane_buckets(emb: DataFrame, planes: int = 12,
                              seed: int = 42) -> DataFrame:
    """SRP-LSH bucketing: sign pattern against `planes` pseudo-random
    hyperplanes (deterministic hash-derived coefficients — no RNG state to
    ship to executors). Bucket id = packed sign bits."""
    dim_idx = F.sequence(F.lit(0), F.size("embedding") - 1)

    def projection(p: int):
        # hash-derived pseudo-random plane coefficients per (plane, dim)
        return F.aggregate(
            F.zip_with(F.col("embedding"), dim_idx,
                       lambda v, i: v.cast("double") *
                       F.xxhash64(F.lit(seed), F.lit(p), i).cast("double")),
            F.lit(0.0), lambda acc, x: acc + x)

    proj = [projection(p) for p in range(planes)]
    bucket = None
    for p, pr in enumerate(proj):
        bit = F.when(pr >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return emb.withColumn("bucket", bucket.cast("long"))


def knn_lsh(emb: DataFrame, query_vec_id: int, k: int = 5,
            planes: int = 8) -> DataFrame:
    """Approximate top-k: search only the query's SRP bucket. At scale the
    bucketed table is written partitioned by bucket → the probe prunes to
    1/2^planes of the corpus."""
    bucketed = random_hyperplane_buckets(emb, planes=planes)
    qrow = bucketed.where(F.col("vec_id") == query_vec_id) \
                   .select(F.col("embedding").alias("qe"),
                           F.col("bucket").alias("qb"))
    cos = cosine_similarity(F.col("embedding"), F.col("qe"))
    return (bucketed.join(F.broadcast(qrow), F.col("bucket") == F.col("qb"))
            .where(F.col("vec_id") != query_vec_id)
            .select("vec_id", cos.alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k))
