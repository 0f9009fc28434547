"""Watermarked windowed aggregation over streaming grids (SURVEY §2.9;
Structured Streaming's canonical late-data pattern).

The reference recomputes per-timestep products as events arrive; the
streaming-native equivalent is a tumbling/sliding event-time window with
a watermark: late rows within the allowed lateness fold into their
window before it finalizes, rows older than the watermark are dropped,
and state is bounded by (keys × open windows) regardless of stream
length. Works identically on batch frames (no watermark applied)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def windowed_stats(df: DataFrame, window: str = "1 hour",
                   slide: str | None = None, watermark: str = "30 minutes",
                   time_col: str = "time",
                   keys: Sequence[str] = ("collection", "variable"),
                   value_col: str = "value") -> DataFrame:
    """Per-key tumbling (or sliding) event-time window stats.

    Streaming: append-mode emission — a window row finalizes once the
    watermark passes its end, including any late rows that arrived
    within the allowed lateness; older rows are dropped by the state
    store. Batch: same expression, evaluated directly.
    """
    g = df
    if g.isStreaming:
        g = g.withWatermark(time_col, watermark)
    w = (F.window(time_col, window, slide) if slide
         else F.window(time_col, window))
    v = F.col(value_col)
    return (g.groupBy(*keys, w.alias("w"))
            .agg(F.count(v).alias("n"), F.sum(v).alias("sum"),
                 F.min(v).alias("min"), F.max(v).alias("max"))
            .select(*keys, F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "n", "sum", "min", "max"))
