"""Catalog read path (SURVEY.md §3.3): STAC-style item search and
EDR-style collection detail as composed operator-library calls.

The reference's queryset pipeline (stac/views.py:295-451: visibility →
datetime → bbox → forecast-past → order → keyset paginate) becomes one
declarative DataFrame expression per request; every filter lands in the
scan (partition pruning on the time-partitioned items table).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, functions as F

from georiva_spark.operators import filters, stats, windows

MAX_PAGE = 1000   # stac/views.py:311-312


def stac_search(items: DataFrame, collections_dim: DataFrame | None = None,
                *, org: str | None = None, include_private: bool = False,
                collection: str | None = None,
                start: dt.datetime | str | None = None,
                end: dt.datetime | str | None = None,
                bbox: tuple[float, float, float, float] | None = None,
                include_forecast_past: bool = True,
                now: dt.datetime | None = None,
                token=None, limit: int = 100) -> DataFrame:
    """STAC item search with fail-closed tenancy and keyset pagination.

    ``collections_dim`` carries serving policy (visibility/is_active);
    joined as a broadcast semi-join — the row-level policy the reference
    wraps around every serving query (P10, organisations/access.py).
    """
    out = items
    if collections_dim is not None:
        allowed = filters.visible_collections(
            collections_dim, org=org, include_private=include_private)
        out = out.join(F.broadcast(allowed.select("collection")),
                       on="collection", how="left_semi")
    if collection is not None:
        out = out.where(F.col("collection") == collection)
    out = filters.time_filter(out, start, end)
    if bbox is not None:
        out = filters.bbox_overlap(out, *bbox)
    if not include_forecast_past:
        out = filters.forecast_past_filter(out, now=now)
    return windows.keyset_page(out, order_col="time", token=token,
                               limit=min(limit, MAX_PAGE),
                               tiebreak_col="item_id")


def latest_items(items: DataFrame) -> DataFrame:
    """W1 — newest item per collection (core/models/item.py:279-285)."""
    return windows.latest_per_group(items, ["collection"],
                                    tiebreak_cols=["item_id"])


def latest_forecast_run(items: DataFrame) -> DataFrame:
    """W2 — all steps of the newest run per collection
    (core/models/item.py:286-299)."""
    return windows.latest_run_steps(items, ["collection"])


def collection_detail(items: DataFrame, collection: str,
                      max_times: int = 10_000) -> dict:
    """EDR collection metadata (edr/serializers.py:126-279): spatial +
    temporal extent and the distinct time axis. The extent is a 1-row
    aggregate; the time axis is API-shaped driver output and therefore
    capped at ``max_times`` entries (a century of hourly steps fits) —
    the one guard that keeps this endpoint from collecting unboundedly
    on a degenerate catalog."""
    sub = items.where(F.col("collection") == collection)
    extent = (sub.agg(
        F.min("time").alias("time_min"), F.max("time").alias("time_max"),
        F.min(F.col("bounds")[0]).alias("west"),
        F.min(F.col("bounds")[1]).alias("south"),
        F.max(F.col("bounds")[2]).alias("east"),
        F.max(F.col("bounds")[3]).alias("north"),
        F.count(F.lit(1)).alias("n_items")).collect()[0])
    times = [r.time for r in
             stats.distinct_times(sub, keys=()).orderBy("time")
             .limit(max_times).collect()]
    return {"collection": collection, "extent": extent.asDict(),
            "times": times}
