"""Stateful streaming operators (north-star §2.9 extension — the reference
has no event-time windowing, SURVEY §2.9, but a training-data event
pipeline needs it).

Two formulations of gap-based sessionization over the events stream:

- ``sessionize_declarative``: built-in ``session_window`` aggregation with
  a watermark — fully JVM-side, state store managed by Spark; the default.
- ``sessionize_custom``: ``applyInPandasWithState`` — the escape hatch for
  semantics the built-ins can't express (here: per-session value trajectory
  with custom finalization), shown with timeout handling. State size is
  O(open sessions per user), bounded by the watermark.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType, TimestampType,
)


def sessionize_declarative(events: DataFrame, gap: str = "10 minutes",
                           watermark: str = "30 minutes") -> DataFrame:
    """Gap sessionization via session_window: one stateful aggregation,
    late data bounded by the watermark. Works identically on batch frames
    (no watermark needed) and streams."""
    ev = events
    if ev.isStreaming:
        ev = ev.withWatermark("ts", watermark)
    return (ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("total_value"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "total_value"))


SESSION_STATE_SCHEMA = StructType([
    StructField("start", LongType()),      # epoch micros
    StructField("last", LongType()),
    StructField("n", IntegerType()),
    StructField("total", DoubleType()),
])

SESSION_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", IntegerType()),
    StructField("total_value", DoubleType()),
])


def sessionize_custom(events: DataFrame, gap_minutes: int = 10) -> DataFrame:
    """Custom stateful sessionization with applyInPandasWithState:
    emits a session row when the gap elapses (processing-time timeout) or
    when a new event arrives past the gap."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out = []
        if state.hasTimedOut:
            if state.exists:
                s, last, n, total = state.get
                out.append((user_id, s, last, n, total))
                state.remove()
        else:
            rows = pd.concat(list(pdfs)).reset_index(drop=True)
            ts_us = rows["ts"].astype("int64") // 1000  # ns → µs
            order = ts_us.sort_values().index
            cur = state.get if state.exists else None
            for i in order:
                t = int(ts_us[i])
                v = float(rows["value"][i])
                if cur is None:
                    cur = (t, t, 1, v)
                elif t - cur[1] > gap_us:
                    out.append((user_id, *cur))
                    cur = (t, t, 1, v)
                else:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + v)
            if cur is not None:
                state.update(cur)
                state.setTimeoutDuration(gap_minutes * 60 * 1000)
        if out:
            yield pd.DataFrame(
                [{"user_id": u,
                  "session_start": pd.Timestamp(s, unit="us"),
                  "session_end": pd.Timestamp(e, unit="us"),
                  "n_events": n, "total_value": tv}
                 for (u, s, e, n, tv) in out])

    return (events.groupBy("user_id")
            .applyInPandasWithState(
                fn, outputStructType=SESSION_OUT_SCHEMA,
                stateStructType=SESSION_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
