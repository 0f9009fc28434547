"""Source-plugin surface: data sources, feeds, registry, time windows.

The last §2.10 plugin surface, mirroring the reference's
``sources/source.py:40-190`` (``BaseDataSource`` with
``generate_requests`` + incremental time-window helpers) and
``sources/models.py:201-245`` (``DataFeed.get_data_source`` /
``get_loader`` factories with per-collection link-config merge), plus
the type-keyed registry pattern of ``sources/registry.py``.

Spark-first divergences:
- "latest stored item" (``collection.get_latest_item_date()``) is read
  from the catalog/grid DataFrame with one ``max(time)`` aggregate —
  a metadata-only scan at 100 TB when the table is partitioned by day,
  because max over a partition column prunes to the last partition.
- A feed is a frozen dataclass, not an ORM row: the engine's unit of
  configuration is code + config dicts, the web layer is a SURVEY
  non-goal.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Callable, Iterator, Optional, Type

from pyspark.sql import DataFrame, SparkSession, functions as F

from georiva_spark.sources.acquisition import (
    BaseFetchStrategy, FileRequest, Loader, STRATEGIES,
)


class BaseDataSource:
    """WHAT files exist for a time range (``sources/source.py:68-190``).

    Subclasses define ``type``/``label`` and ``generate_requests``; the
    time-window helpers implement incremental acquisition: resume from
    the latest stored timestamp, else backfill from the default start.
    """

    type: str = ""
    label: str = ""

    def __init__(self, config: Optional[dict] = None,
                 fetch_strategy: Optional[BaseFetchStrategy] = None):
        if not self.type or not self.label:
            raise ValueError(
                f"{type(self).__name__} must define 'type' and 'label'")
        self.config = config or {}
        self.fetch_strategy = fetch_strategy

    def generate_requests(self, start_time: datetime, end_time: datetime,
                          variables: Optional[list[str]] = None,
                          **kwargs) -> Iterator[FileRequest]:
        raise NotImplementedError

    def get_latest_available(self) -> Optional[datetime]:
        """Latest timestamp the remote source offers (None = unknown)."""
        return None

    # -- incremental time-window (source.py:120-190) ----------------------
    def get_default_start_date(self) -> datetime:
        now = datetime.utcnow()
        return now.replace(hour=0, minute=0, second=0, microsecond=0)

    def get_default_end_date(self) -> datetime:
        return datetime.utcnow()

    def advance_start_from_latest(self, latest: datetime) -> datetime:
        """Default: restart exactly at latest. Period-aligned sources
        (e.g. monthly/pentad) override to step to the next period so the
        same timestamp is never refetched."""
        return latest

    def get_time_window(self, latest_stored: Optional[datetime] = None
                        ) -> tuple[datetime, datetime]:
        end_time = self.get_default_end_date()
        if latest_stored is None:
            return self.get_default_start_date(), end_time
        return self.advance_start_from_latest(latest_stored), end_time


def latest_item_time(catalog: DataFrame, collection: str,
                     time_col: str = "time",
                     collection_col: str = "collection"
                     ) -> Optional[datetime]:
    """The Spark-side ``collection.get_latest_item_date()``: max stored
    timestamp for one collection. One aggregate; with day-partitioned
    storage Catalyst answers it from partition metadata, not data."""
    row = (catalog.where(F.col(collection_col) == collection)
           .agg(F.max(time_col).alias("t")).collect()[0])
    return row["t"]


@dataclass(frozen=True)
class DataFeed:
    """One configured provider feed (``sources/models.py:201-245``).

    ``collection_links`` merges per-collection config over the feed's
    loader config, exactly the link-config merge in
    ``DataFeed.get_data_source`` — CHIRPS-style feeds bake ``period``
    per collection there, so operators never see it as editable.
    """

    name: str
    source_cls: Type[BaseDataSource]
    strategy_type: str = "file"
    strategy_config: dict = field(default_factory=dict)
    loader_config: dict = field(default_factory=dict)
    collection_links: dict = field(default_factory=dict)

    def get_fetch_strategy(self) -> BaseFetchStrategy:
        try:
            cls = STRATEGIES[self.strategy_type]
        except KeyError:
            raise ValueError(f"Unknown fetch strategy: {self.strategy_type}")
        return cls(dict(self.strategy_config))

    def get_data_source(self, collection: Optional[str] = None
                        ) -> BaseDataSource:
        if not issubclass(self.source_cls, BaseDataSource):
            raise ValueError(
                f"{self.source_cls} must inherit from BaseDataSource")
        config = dict(self.loader_config)
        if collection is not None:
            config.update(self.collection_links.get(collection, {}))
        return self.source_cls(config, fetch_strategy=None)

    def get_loader(self, spark: SparkSession, collection: str, *,
                   landing_dir: str, ledger_dir: str,
                   catalog: Optional[DataFrame] = None,
                   window: Optional[tuple[datetime, datetime]] = None,
                   variables: Optional[list[str]] = None) -> Loader:
        """Fully configured Loader. The request window is, in order:
        explicit ``window`` > incremental from ``catalog``'s latest
        stored time > the source's default backfill window."""
        source = self.get_data_source(collection)
        if window is None:
            latest = (latest_item_time(catalog, collection)
                      if catalog is not None else None)
            window = source.get_time_window(latest)
        start, end = window

        def data_source(_collection: str):
            return source.generate_requests(start, end, variables=variables)

        return Loader(
            spark, collection=collection, data_source=data_source,
            fetch_strategy=self.get_fetch_strategy(),
            landing_dir=landing_dir, ledger_dir=ledger_dir,
        )


class DataFeedRegistry:
    """Type-keyed plugin registry (``sources/registry.py:6-26``)."""

    def __init__(self):
        self._feeds: dict[str, DataFeed] = {}

    def register(self, feed: DataFeed) -> DataFeed:
        if not feed.name:
            raise ValueError("feed must define 'name'")
        self._feeds[feed.name] = feed
        return feed

    def get(self, name: str) -> DataFeed:
        if name not in self._feeds:
            raise ValueError(f"Unknown data feed: {name}")
        return self._feeds[name]

    def names(self) -> list[str]:
        return sorted(self._feeds)


data_feed_registry = DataFeedRegistry()


STALE_MULTIPLIER = 2
STALE_FLOOR_MINUTES = 30
STALE_CEILING_MINUTES = 48 * 60

# (name, rank) in EVALUATION order — rank is the sort key; the two differ
# deliberately (INACTIVE evaluates first but sorts last), sources/health.py.
HEALTH_LADDER = (
    ("inactive", 90), ("failed", 10), ("partial", 20), ("new", 80),
    ("running", 50), ("stale", 30), ("ok", 70),
)


def feed_health(feeds: DataFrame, now_col="now") -> DataFrame:
    """Derived health per feed row (``sources/health.py:62-134``).

    One chained CASE/WHEN expression — the reference generates the same
    ladder as a SQL ``Case`` so "the ladder the database sorts by and the
    chip the template renders can never disagree"; here the single
    ``F.when`` chain is that same property. Declaration order is
    evaluation order; RUNNING precedes STALE so an overdue feed whose
    recovery run has started reports the recovery, not the wait.

    Expects columns: is_active (bool), last_run_status (string|null),
    last_run_at (timestamp|null), interval_minutes (long), and a ``now``
    timestamp column (injected, not ``current_timestamp()``, so results
    are deterministic and testable).

    A feed is overdue after ``interval_minutes * STALE_MULTIPLIER``
    without a run, clamped to [30 min, 48 h]: the floor stops frequent
    feeds flickering on scheduler jitter, the ceiling stops a monthly
    feed hiding a two-month outage behind a plain 2× rule.
    """
    gap_s = (F.col(now_col).cast("long")
             - F.col("last_run_at").cast("long"))
    thresh_s = F.least(
        F.greatest(F.col("interval_minutes") * F.lit(STALE_MULTIPLIER),
                   F.lit(STALE_FLOOR_MINUTES)),
        F.lit(STALE_CEILING_MINUTES)) * F.lit(60)
    overdue = gap_s > thresh_s
    rank = (
        F.when(~F.col("is_active"), F.lit(90))
        .when(F.col("last_run_status") == "failed", F.lit(10))
        .when(F.col("last_run_status") == "partial", F.lit(20))
        .when(F.col("last_run_at").isNull(), F.lit(80))
        .when(F.col("last_run_status").isin("queued", "running"), F.lit(50))
        .when(F.col("is_active") & F.col("last_run_at").isNotNull()
              & overdue, F.lit(30))
        .otherwise(F.lit(70)))
    label = F.lit(None).cast("string")
    for name, r in HEALTH_LADDER:
        label = F.when(rank == r, F.lit(name)).otherwise(label)
    return feeds.withColumn("health_rank", rank) \
                .withColumn("health", label)


class HourlyHTTPSource(BaseDataSource):
    """Example provider: one file per hour from a URL template —
    the GFS/AIFS shape (``type``/``label`` + template config), concrete
    enough to exercise the whole feed→loader→triage path in tests."""

    type = "hourly-http"
    label = "Hourly HTTP source"

    def generate_requests(self, start_time: datetime, end_time: datetime,
                          variables: Optional[list[str]] = None,
                          **kwargs) -> Iterator[FileRequest]:
        template = self.config.get(
            "url_template", "http://localhost/{ts:%Y%m%d%H}.grib2")
        step = timedelta(hours=int(self.config.get("step_hours", 1)))
        ts = start_time
        while ts <= end_time:
            filename = self.config.get(
                "filename_template", "{ts:%Y%m%d%H}.grib2").format(ts=ts)
            yield FileRequest(
                identifier=filename, filename=filename, valid_time=ts,
                params={"url": template.format(ts=ts),
                        "path": self.config.get("path_template",
                                                "{ts}").format(ts=ts)},
                variables=list(variables or []),
            )
            ts = ts + step
