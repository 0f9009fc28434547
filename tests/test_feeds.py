"""Source-plugin surface (§2.10): DataFeed registry, incremental windows.

Mirrors sources/source.py:68-190 (BaseDataSource + get_time_window) and
sources/models.py:201-245 (DataFeed factories, per-collection link-config
merge) driving the acquisition Loader end-to-end.
"""

import os
from datetime import datetime, timedelta

import pytest

from georiva_spark.sources.feeds import (
    BaseDataSource, DataFeed, DataFeedRegistry, HourlyHTTPSource,
    latest_item_time,
)
from georiva_spark.sources.acquisition import LocalFSStrategy


def test_source_requires_type_label():
    class Bad(BaseDataSource):
        pass

    with pytest.raises(ValueError, match="type"):
        Bad()


def test_hourly_source_generates_requests():
    src = HourlyHTTPSource({
        "url_template": "http://x/{ts:%Y%m%d%H}.grib2",
        "step_hours": 6,
    })
    reqs = list(src.generate_requests(datetime(2024, 1, 1),
                                      datetime(2024, 1, 2),
                                      variables=["tp"]))
    assert len(reqs) == 5  # 00,06,12,18,24
    assert reqs[0].filename == "2024010100.grib2"
    assert reqs[0].params["url"] == "http://x/2024010100.grib2"
    assert reqs[0].valid_time == datetime(2024, 1, 1)
    assert reqs[0].variables == ["tp"]


def test_time_window_backfill_vs_incremental():
    src = HourlyHTTPSource({})
    start, end = src.get_time_window(None)
    assert start == src.get_default_start_date()
    latest = datetime(2024, 6, 1, 12)
    start, _ = src.get_time_window(latest)
    assert start == latest  # default: resume exactly at latest

    class Pentad(HourlyHTTPSource):
        def advance_start_from_latest(self, latest):
            return latest + timedelta(days=5)

    assert Pentad({}).get_time_window(latest)[0] == latest + timedelta(days=5)


def test_registry_and_link_config_merge():
    reg = DataFeedRegistry()
    feed = reg.register(DataFeed(
        name="chirps", source_cls=HourlyHTTPSource,
        loader_config={"step_hours": 1, "url_template": "http://c/{ts}"},
        collection_links={"pentad": {"step_hours": 120}},
    ))
    assert reg.get("chirps") is feed
    assert reg.names() == ["chirps"]
    with pytest.raises(ValueError, match="Unknown data feed"):
        reg.get("nope")
    # per-collection link config overrides feed config (models.py:230-238)
    assert feed.get_data_source().config["step_hours"] == 1
    assert feed.get_data_source("pentad").config["step_hours"] == 120
    assert feed.get_data_source("daily").config["step_hours"] == 1


def test_latest_item_time(spark):
    df = spark.createDataFrame(
        [("era5", datetime(2024, 1, 1)), ("era5", datetime(2024, 3, 1)),
         ("gfs", datetime(2024, 6, 1))],
        "collection string, time timestamp")
    assert latest_item_time(df, "era5") == datetime(2024, 3, 1)
    assert latest_item_time(df, "nope") is None


def test_feed_loader_end_to_end_incremental(spark, tmp_path):
    """Feed → loader → fetch; second run's window starts at the catalog's
    latest stored time, so only newer files are requested."""
    src_dir = tmp_path / "remote"
    src_dir.mkdir()
    for h in (0, 6, 12, 18):
        (src_dir / f"20240101{h:02d}.grib2").write_bytes(b"x" * 8)

    class LocalHourly(HourlyHTTPSource):
        type = "local-hourly"
        label = "Local hourly"

        def generate_requests(self, start, end, variables=None, **kw):
            for r in super().generate_requests(start, end,
                                               variables=variables, **kw):
                r.params["path"] = os.path.join(str(src_dir), r.filename)
                yield r

    feed = DataFeed(name="test", source_cls=LocalHourly,
                    strategy_type="file",
                    loader_config={"step_hours": 6})
    kw = dict(landing_dir=str(tmp_path / "landing"),
              ledger_dir=str(tmp_path / "ledger"))
    loader = feed.get_loader(
        spark, "era5",
        window=(datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 18)), **kw)
    assert loader.run().files_fetched == 4

    # catalog knows data through 06h → incremental window fetches 06..18,
    # triage then skips the 3 already-landed files
    catalog = spark.createDataFrame(
        [("era5", datetime(2024, 1, 1, 6))], "collection string, time timestamp")

    class Bounded(LocalHourly):
        def get_default_end_date(self):
            return datetime(2024, 1, 1, 18)

    feed2 = DataFeed(name="test2", source_cls=Bounded,
                     strategy_type="file", loader_config={"step_hours": 6})
    loader2 = feed2.get_loader(spark, "era5", catalog=catalog, **kw)
    second = loader2.run()
    assert second.files_fetched == 0
    assert second.files_skipped == 3  # 06, 12, 18 already in the ledger


def test_feed_health_ladder(spark):
    """sources/health.py ladder: evaluation order ≠ rank order; RUNNING
    shadows STALE; clamp floor 30min / ceiling 48h."""
    from georiva_spark.sources.feeds import feed_health

    now = datetime(2024, 6, 10, 12, 0, 0)
    hour = 60
    rows = [
        # feed_id, active, status, last_run_at, interval_minutes
        (1, False, "complete", now - timedelta(hours=1), hour),   # inactive
        (2, True, "failed", now - timedelta(hours=1), hour),      # failed
        (3, True, "partial", now - timedelta(hours=1), hour),     # partial
        (4, True, None, None, hour),                              # new
        # overdue AND running → running shadows stale
        (5, True, "running", now - timedelta(hours=10), hour),
        (6, True, "complete", now - timedelta(hours=10), hour),   # stale
        (7, True, "complete", now - timedelta(minutes=30), hour), # ok
        # floor: 10-min feed 40 min late → 2×10=20 < floor 30 → overdue
        # only past 30 min; 25-min gap is OK
        (8, True, "complete", now - timedelta(minutes=25), 10),
        (9, True, "complete", now - timedelta(minutes=40), 10),   # stale
        # ceiling: monthly feed 3 days late → 2×43200min ≫ 48h cap → stale
        (10, True, "complete", now - timedelta(days=3), 43200),
        # same monthly feed 1 day late → under the 48h cap → ok
        (11, True, "complete", now - timedelta(days=1), 43200),
    ]
    df = spark.createDataFrame(
        [(i, a, s, t, m, now) for i, a, s, t, m in rows],
        "feed_id int, is_active boolean, last_run_status string, "
        "last_run_at timestamp, interval_minutes long, now timestamp")
    got = {r.feed_id: (r.health, r.health_rank)
           for r in feed_health(df).collect()}
    assert got == {
        1: ("inactive", 90), 2: ("failed", 10), 3: ("partial", 20),
        4: ("new", 80), 5: ("running", 50), 6: ("stale", 30),
        7: ("ok", 70), 8: ("ok", 70), 9: ("stale", 30),
        10: ("stale", 30), 11: ("ok", 70),
    }


def test_unknown_strategy_raises():
    feed = DataFeed(name="x", source_cls=HourlyHTTPSource,
                    strategy_type="carrier-pigeon")
    with pytest.raises(ValueError, match="Unknown fetch strategy"):
        feed.get_fetch_strategy()
