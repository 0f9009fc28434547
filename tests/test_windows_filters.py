"""Window-pattern (W1-W3) and filter (P2/P3/P9/P10) operator tests."""

import datetime as dt

from pyspark.sql import functions as F

from georiva_spark.operators import filters, windows, stats


def _items(spark):
    rows = [
        # (item_id, collection, time, reference_time)
        (1, "obs", dt.datetime(2020, 1, 1), None),
        (2, "obs", dt.datetime(2020, 1, 2), None),
        (3, "obs", dt.datetime(2020, 1, 3), None),
        (4, "fc", dt.datetime(2020, 1, 1), dt.datetime(2020, 1, 1)),
        (5, "fc", dt.datetime(2020, 1, 2), dt.datetime(2020, 1, 1)),
        (6, "fc", dt.datetime(2020, 1, 2), dt.datetime(2020, 1, 2)),
        (7, "fc", dt.datetime(2020, 1, 3), dt.datetime(2020, 1, 2)),
    ]
    return spark.createDataFrame(
        rows, "item_id long, collection string, time timestamp, "
              "reference_time timestamp")


def test_latest_per_group(spark):
    out = windows.latest_per_group(_items(spark), ["collection"],
                                   tiebreak_cols=["item_id"])
    got = {r.collection: r.item_id for r in out.collect()}
    assert got == {"obs": 3, "fc": 7}


def test_latest_run_steps(spark):
    out = windows.latest_run_steps(
        _items(spark).where(F.col("collection") == "fc"), ["collection"])
    assert sorted(r.item_id for r in out.collect()) == [6, 7]


def test_keyset_pagination_walk(spark):
    df = _items(spark).where(F.col("collection") == "obs")
    p1 = windows.keyset_page(df, limit=2, tiebreak_col="item_id").collect()
    assert [r.item_id for r in p1] == [3, 2]
    token = p1[-1].time
    p2 = windows.keyset_page(df, token=token, limit=2,
                             tiebreak_col="item_id").collect()
    assert [r.item_id for r in p2] == [1]


def test_forecast_past_filter(spark):
    df = _items(spark).where(F.col("collection") == "fc")
    out = filters.forecast_past_filter(df, now=dt.datetime(2020, 1, 2))
    assert sorted(r.item_id for r in out.collect()) == [5, 6, 7]


def test_bbox_overlap_on_bounds(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 10.0, 10.0]), (2, [20.0, 20.0, 30.0, 30.0])],
        "item_id long, bounds array<double>")
    out = filters.bbox_overlap(df, west=5.0, south=5.0, east=15.0, north=15.0)
    assert [r.item_id for r in out.collect()] == [1]


def test_visibility_fail_closed(spark):
    cols = spark.createDataFrame(
        [("o1", "a", "public", True, True),
         ("o1", "b", "private", True, True),
         ("o2", "c", "public", True, True),
         ("o1", "d", "public", False, True),
         ("o1", "e", "public", True, False)],
        "org string, collection string, visibility string, "
        "is_active boolean, catalog_is_active boolean")
    pub = filters.visible_collections(cols, org="o1")
    assert [r.collection for r in pub.collect()] == ["a"]
    priv = filters.visible_collections(cols, org="o1", include_private=True)
    assert sorted(r.collection for r in priv.collect()) == ["a", "b"]
    anon = filters.visible_collections(cols)
    assert sorted(r.collection for r in anon.collect()) == ["a", "c"]


def test_status_rollup(spark):
    runs = spark.createDataFrame(
        [("completed",), ("completed",), ("failed",)], "status string")
    got = {r.status: r.n for r in stats.status_rollup(runs).collect()}
    assert got == {"completed": 2, "failed": 1}


def test_import_without_session():
    """Mirror of the reference's no-Django invariant: the operator library
    must import without a SparkSession (test_no_django.py:13-30)."""
    import importlib
    import georiva_spark.operators.filters
    import georiva_spark.operators.temporal
    import georiva_spark.functions.geo
    importlib.reload(georiva_spark.operators.filters)


def test_approx_distinct_within_documented_rsd(spark):
    """r5: the query is now oracle-able — it emits the exact distinct
    count plus `within_rsd` (HLL estimate within 5× the declared 1%
    rsd of exact, floor 5 absolute; the DuckDB oracle emits TRUE).
    This test asserts both halves independently: every within_rsd is
    True, and a raw re-computation of the sketch honors the same bound
    (catching a broken sketch off by orders of magnitude)."""
    from georiva_spark.queries import QUERIES
    sf = "/root/testdata/sf0.01"
    rows = QUERIES["approx_distinct"](spark, sf).collect()
    assert rows and all(r.within_rsd for r in rows), \
        [(r.event_type, r.exact_users) for r in rows if not r.within_rsd]
    exact = {r.event_type: r.exact_users for r in rows}
    from georiva_spark.queries_ext import load_table
    ev = load_table(spark, sf, "events")
    from pyspark.sql import functions as F
    approx = {r.event_type: r.approx for r in
              ev.groupBy("event_type")
                .agg(F.approx_count_distinct("user_id", rsd=0.01)
                     .alias("approx")).collect()}
    assert set(approx) == set(exact) and exact
    for et, ex in exact.items():
        assert abs(approx[et] - ex) <= max(5, 0.05 * ex), \
            (et, approx[et], ex)
