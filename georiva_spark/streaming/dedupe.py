"""Streaming exact deduplication (SURVEY §2.9 extension; the streaming
face of the batch dedup family in operators/dedup.py).

File-arrival and event feeds are at-least-once: re-delivered drops,
retried uploads, and replayed batches hand the engine the same logical
row twice. ``dropDuplicatesWithinWatermark`` turns that into
effectively-once: the first row with a given key is emitted, subsequent
copies are suppressed, and — unlike plain ``dropDuplicates`` on a stream,
whose state grows forever — the state store evicts a key once the
event-time watermark passes it, so state is bounded by (keys arriving
within one lateness window), not by stream length. A duplicate arriving
*later* than the watermark delay would re-emit; size the delay to the
feed's actual redelivery horizon.

Batch frames take the same call and fall back to plain dropDuplicates —
one code path for backfill and live.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(events: DataFrame, keys: Sequence[str] = ("event_id",),
                 time_col: str = "ts",
                 watermark: str = "1 hour") -> DataFrame:
    """Keep the first row per key; suppress redeliveries arriving within
    ``watermark`` of the max seen event time. State is evicted beyond
    the watermark (bounded memory on unbounded streams)."""
    if events.isStreaming:
        return (events.withWatermark(time_col, watermark)
                .dropDuplicatesWithinWatermark(list(keys)))
    return events.dropDuplicates(list(keys))
