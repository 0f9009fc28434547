"""Bucketed-table co-located join: the pay-shuffle-once storage layout.
The plan assertions ARE the feature — a bucketed⋈bucketed equi-join on
the bucket key must elide every exchange. (Sort elision is NOT claimed:
Spark 3+ does not propagate bucket-file sort order into SortMergeJoin,
so the two SMJ-internal per-partition sorts remain — cheap, shuffle-free
sorts of already-clustered data.)"""

import pytest
from pyspark.sql import functions as F

from georiva_spark.sources.bucketing import drop_bucketed, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "t_buck_a", "k", 8, str(tmp_path / "a"))
    write_bucketed(b, "t_buck_b", "k", 8, str(tmp_path / "b"))
    yield spark.table("t_buck_a"), spark.table("t_buck_b")
    drop_bucketed(spark, "t_buck_a")
    drop_bucketed(spark, "t_buck_b")


def test_bucketed_join_elides_all_exchanges(spark, bucketed_pair):
    ta, tb = bucketed_pair
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = ta.join(tb, "k")
        phys = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in phys
        assert "Exchange" not in phys          # co-located: no shuffle
        # exactly the two SMJ-internal per-partition sorts and nothing
        # else (no sort above an exchange — there is no exchange)
        assert phys.count("Sort ") == 2
        # and the answer is right
        assert j.count() == 500
        row = j.where(F.col("k") == 7).head()
        assert (row.va, row.vb) == (14, 21)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_unbucketed_join_pays_the_shuffle(spark, bucketed_pair):
    """Control: the same join off plain DataFrames shuffles both sides
    — proving the elision above comes from the bucket layout."""
    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        phys = (a.join(b, "k")._jdf.queryExecution()
                .executedPlan().toString())
        assert "Exchange" in phys
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_bucketed_groupby_elides_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also reuses the layout: no
    exchange before the final agg."""
    ta, _ = bucketed_pair
    phys = (ta.groupBy("k").agg(F.sum("va").alias("s"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in phys
