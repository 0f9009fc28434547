"""Catalog read-path tests (§3.3): stac_search filter composition, tenancy
fail-closed semi-join, pagination walk, EDR collection detail."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from georiva_spark import catalog


@pytest.fixture(scope="module")
def items(spark):
    rows = []
    for i in range(10):
        rows.append((i, "obs", dt.datetime(2020, 1, 1 + i), None,
                     [0.0, 0.0, 10.0, 10.0]))
    rows.append((100, "priv", dt.datetime(2020, 1, 5), None,
                 [20.0, 20.0, 30.0, 30.0]))
    return spark.createDataFrame(
        rows, "item_id long, collection string, time timestamp, "
              "reference_time timestamp, bounds array<double>")


@pytest.fixture(scope="module")
def cols_dim(spark):
    return spark.createDataFrame(
        [("o1", "obs", "public", True, True),
         ("o1", "priv", "private", True, True)],
        "org string, collection string, visibility string, "
        "is_active boolean, catalog_is_active boolean")


def test_search_visibility_fail_closed(spark, items, cols_dim):
    pub = catalog.stac_search(items, cols_dim, org="o1")
    assert {r.collection for r in pub.collect()} == {"obs"}
    both = catalog.stac_search(items, cols_dim, org="o1",
                               include_private=True, limit=50)
    assert {r.collection for r in both.collect()} == {"obs", "priv"}


def test_search_datetime_bbox_composition(spark, items, cols_dim):
    out = catalog.stac_search(
        items, cols_dim, org="o1",
        start="2020-01-03", end="2020-01-06",
        bbox=(5.0, 5.0, 15.0, 15.0))
    ids = sorted(r.item_id for r in out.collect())
    assert ids == [2, 3, 4, 5]  # days 3-6, obs bounds overlap query box


def test_search_keyset_walk(spark, items, cols_dim):
    p1 = catalog.stac_search(items, cols_dim, org="o1", limit=4).collect()
    assert [r.item_id for r in p1] == [9, 8, 7, 6]
    p2 = catalog.stac_search(items, cols_dim, org="o1", limit=4,
                             token=p1[-1].time).collect()
    assert [r.item_id for r in p2] == [5, 4, 3, 2]


def test_latest_helpers(spark, items):
    latest = catalog.latest_items(items)
    got = {r.collection: r.item_id for r in latest.collect()}
    assert got["obs"] == 9


def test_collection_detail(spark, items):
    d = catalog.collection_detail(items, "obs")
    assert d["extent"]["n_items"] == 10
    assert d["extent"]["west"] == 0.0 and d["extent"]["north"] == 10.0
    assert len(d["times"]) == 10 and d["times"][0] == dt.datetime(2020, 1, 1)
