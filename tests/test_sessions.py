"""Stateful sessionization tests: declarative session_window on batch +
stream, custom applyInPandasWithState on a stream."""

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

from georiva_spark.streaming.sessions import (
    sessionize_custom, sessionize_declarative,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark):
    rows = [
        # user 1: two sessions separated by > 10 min
        (1, T0, 1.0), (1, T0 + dt.timedelta(minutes=2), 2.0),
        (1, T0 + dt.timedelta(minutes=30), 5.0),
        # user 2: one session
        (2, T0 + dt.timedelta(minutes=1), 10.0),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_declarative_batch_sessions(spark):
    out = sessionize_declarative(_events(spark), gap="10 minutes")
    rows = sorted([(r.user_id, r.n_events, r.total_value)
                   for r in out.collect()])
    assert rows == [(1, 1, 5.0), (1, 2, 3.0), (2, 1, 10.0)]
    s1 = [r for r in out.collect() if r.user_id == 1 and r.n_events == 2][0]
    assert s1.session_start == T0
    assert s1.session_end == T0 + dt.timedelta(minutes=12)  # last event + gap


def test_declarative_streaming_sessions(spark, tmp_path):
    src = str(tmp_path / "events_in")
    _events(spark).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double").parquet(src)
    out = sessionize_declarative(stream, gap="10 minutes",
                                 watermark="1 minute")
    q = (out.writeStream.format("memory").queryName("sess")
         .outputMode("append").option(
             "checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # append mode only emits watermark-closed sessions; with a static file
    # the watermark advances to max(ts)-1min, closing the first session
    got = {(r.user_id, r.n_events) for r in spark.sql(
        "SELECT * FROM sess").collect()}
    assert (1, 2) in got


def test_custom_stateful_sessions(spark, tmp_path):
    src = str(tmp_path / "events_in2")
    _events(spark).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double").parquet(src)
    out = sessionize_custom(stream, gap_minutes=10)
    q = (out.writeStream.format("memory").queryName("sess2")
         .outputMode("append").option(
             "checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    # the processing-time timeout keeps session state registered, and
    # this query does NOT self-terminate under availableNow within the
    # timeout — a blind awaitTermination(120) burned the full 120 s
    # (the slowest test in the suite, r14). Poll for the expected
    # in-batch-closed session instead, then stop the query.
    got: set = set()
    deadline = time.time() + 120
    while time.time() < deadline:
        if q.awaitTermination(2):
            break
        got = {(r.user_id, r.n_events, r.total_value)
               for r in spark.sql("SELECT * FROM sess2").collect()}
        if (1, 2, 3.0) in got:
            break
    q.stop()
    rows = spark.sql("SELECT * FROM sess2").collect()
    # the first user-1 session closed by the in-batch gap; open sessions
    # stay in state awaiting timeout
    got = {(r.user_id, r.n_events, r.total_value) for r in rows}
    assert (1, 2, 3.0) in got
