"""asof_join / interval_overlap_join unit goldens (the two custom
joins Spark lacks natively — merge_asof semantics and binned range
join)."""

import datetime as dt

from pyspark.sql import functions as F

from georiva_spark.operators import timeseries


def _t(m, s=0, us=0):
    return dt.datetime(2024, 1, 1, 0, m, s, us)


def test_asof_join_backward_inclusive_ties_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, 1, _t(10)), (2, 1, _t(5)), (3, 1, _t(0)),
         (4, 2, _t(10)), (5, 3, _t(10))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _t(5), 100, 1.0),      # exact tie with left event 2
         (1, _t(5), 101, 2.0),      # same ts: larger payload wins
         (1, _t(8), 102, 3.0),
         (2, _t(11), 103, 4.0)],    # after left 4 -> no match
        "user_id long, ts timestamp, event_id long, value double")
    out = {r.event_id: r for r in timeseries.asof_join(
        left, right, on="user_id",
        right_cols=["event_id", "value"]).collect()}
    assert out[1].matched_event_id == 102          # latest <= t10
    assert out[2].matched_event_id == 101          # inclusive + tie->max
    assert out[3].matched_event_id is None         # nothing before t0
    assert out[4].matched_event_id is None         # right all later
    assert out[5].matched_event_id is None         # user 3 has no rights
    assert out[1].matched_value == 3.0


def test_asof_join_tolerance_discards_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, 1, _t(30))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _t(0), 100, 1.0)],
        "user_id long, ts timestamp, event_id long, value double")
    keep = timeseries.asof_join(left, right, on="user_id",
                                right_cols=["event_id", "value"],
                                tolerance_us=31 * 60 * 1_000_000)
    drop = timeseries.asof_join(left, right, on="user_id",
                                right_cols=["event_id", "value"],
                                tolerance_us=29 * 60 * 1_000_000)
    assert keep.collect()[0].matched_event_id == 100
    assert drop.collect()[0].matched_event_id is None


def test_interval_overlap_join_golden(spark):
    mk = lambda rows: spark.createDataFrame(
        rows, "id long, start timestamp, end timestamp")
    left = mk([
        (1, _t(0), _t(10)),      # overlaps r1, touches r2 at endpoint
        (2, _t(0), _t(59, 59)),  # spans two 1h-bin boundaries? no: <1h
        (3, _t(30), _t(40)),     # no overlap with anything
    ])
    right = mk([
        (11, _t(5), _t(8)),      # inside l1
        (12, _t(10), _t(12)),    # touches l1 end (inclusive)
        (13, _t(50), _t(55)),    # inside l2 only
    ])
    got = {(r.l_id, r.r_id): r.overlap_us
           for r in timeseries.interval_overlap_join(
               left, right).collect()}
    assert (1, 11) in got and got[(1, 11)] == 3 * 60 * 1_000_000
    assert (1, 12) in got and got[(1, 12)] == 0       # inclusive touch
    assert (2, 11) in got and (2, 12) in got and (2, 13) in got
    assert (3, 11) not in got and (3, 13) not in got
    assert len(got) == 5


def test_interval_overlap_join_cross_bin_pair_emitted_once(spark):
    # both intervals span several narrow bins; the first-shared-bin
    # ownership rule must emit the pair exactly once
    mk = lambda rows: spark.createDataFrame(
        rows, "id long, start timestamp, end timestamp")
    left = mk([(1, _t(0), _t(50))])
    right = mk([(2, _t(10), _t(45))])
    rows = timeseries.interval_overlap_join(
        left, right, bin_us=60_000_000).collect()   # 1-minute bins
    assert len(rows) == 1
    assert rows[0].overlap_us == 35 * 60 * 1_000_000


def test_asof_join_forward_and_nearest_directions(spark):
    left = spark.createDataFrame(
        [(1, 1, _t(10)), (2, 1, _t(20)), (3, 1, _t(36))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _t(4), 100, 1.0),     # 6 before l1
         (1, _t(12), 101, 2.0),    # 2 after l1, 8 before l2
         (1, _t(35), 102, 3.0)],   # 1 before l3
        "user_id long, ts timestamp, event_id long, value double")

    def run(d):
        return {r.event_id: r.matched_event_id
                for r in timeseries.asof_join(
                    left, right, on="user_id",
                    right_cols=["event_id", "value"],
                    direction=d).collect()}

    fwd = run("forward")
    assert fwd[1] == 101 and fwd[2] == 102 and fwd[3] is None
    near = run("nearest")
    assert near[1] == 101        # 2 after beats 6 before
    assert near[2] == 101        # 8 before beats 15 after
    assert near[3] == 102
    # nearest tie -> the earlier (backward) match
    l2 = spark.createDataFrame([(9, 1, _t(8))],
                               "event_id long, user_id long, ts timestamp")
    r2 = spark.createDataFrame(
        [(1, _t(4), 200, 1.0), (1, _t(12), 201, 2.0)],
        "user_id long, ts timestamp, event_id long, value double")
    got = timeseries.asof_join(l2, r2, on="user_id",
                               right_cols=["event_id", "value"],
                               direction="nearest").collect()[0]
    assert got.matched_event_id == 200


def test_asof_join_forward_inclusive_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 1, _t(10))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _t(10), 300, 1.0), (1, _t(10), 301, 2.0)],
        "user_id long, ts timestamp, event_id long, value double")
    got = timeseries.asof_join(left, right, on="user_id",
                               right_cols=["event_id", "value"],
                               direction="forward").collect()[0]
    assert got.matched_event_id == 301     # inclusive + tie -> max payload
    far = spark.createDataFrame(
        [(1, _t(40), 302, 1.0)],
        "user_id long, ts timestamp, event_id long, value double")
    drop = timeseries.asof_join(left, far, on="user_id",
                                right_cols=["event_id", "value"],
                                direction="forward",
                                tolerance_us=20 * 60 * 1_000_000)
    assert drop.collect()[0].matched_event_id is None


def test_interval_overlap_join_adaptive_bins_mixed_lengths(spark):
    """Mixed interval lengths (seconds to days): the adaptive median
    bin width must keep the result exact — a fixed 1h default would
    explode the day-long intervals or funnel the short ones into one
    mega-bin."""
    import datetime as dt
    import itertools
    T0 = dt.datetime(2020, 1, 1)
    mk = lambda rows: spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), T0 + dt.timedelta(seconds=e))
         for i, s, e in rows], "id long, start timestamp, end timestamp")
    ld = [(1, 0, 5), (2, 100, 86400 * 2), (3, 50, 60), (4, 7, 8)]
    rd = [(10, 3, 10), (11, 86400, 86400 * 3), (12, 1000, 1001),
          (13, 59, 2000)]
    got = sorted((r.l_id, r.r_id) for r in
                 timeseries.interval_overlap_join(mk(ld), mk(rd)).collect())
    want = sorted((l[0], r[0]) for l, r in itertools.product(ld, rd)
                  if l[1] <= r[2] and r[1] <= l[2])
    assert got == want


def test_interval_overlap_join_reversed_interval_named_error(spark):
    import datetime as dt
    import pytest
    T0 = dt.datetime(2020, 1, 1)
    mk = lambda rows: spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), T0 + dt.timedelta(seconds=e))
         for i, s, e in rows], "id long, start timestamp, end timestamp")
    bad = mk([(1, 10, 5)])
    ok = mk([(2, 0, 10)])
    # adaptive path: plan-time scalar check
    with pytest.raises(ValueError, match="reversed interval"):
        timeseries.interval_overlap_join(bad, ok)
    # explicit-bin path: named in-plan raise_error, not an opaque
    # sequence-boundaries failure
    with pytest.raises(Exception, match="reversed interval"):
        timeseries.interval_overlap_join(bad, ok,
                                         bin_us=1_000_000).collect()


def test_interval_overlap_join_point_events_do_not_explode(spark):
    """Point events (zero-length intervals) dominate: the adaptive
    median would be 0 — the bin floor must keep the one long interval
    at ~10k bins instead of a 3.6e9-element sequence."""
    import datetime as dt
    T0 = dt.datetime(2020, 1, 1)
    mk = lambda rows: spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), T0 + dt.timedelta(seconds=e))
         for i, s, e in rows], "id long, start timestamp, end timestamp")
    pts = mk([(i, i, i) for i in range(20)])        # instants
    span = mk([(100, 0, 3600)])                     # one hour-long
    got = sorted((r.l_id, r.r_id) for r in
                 timeseries.interval_overlap_join(pts, span).collect())
    assert got == [(i, 100) for i in range(20)]
