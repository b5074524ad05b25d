"""Gap-based sessionization: hand-built boundary cases + oracle parity
+ the single-shuffle plan claim (operators/sessions.py)."""

import datetime as dt
import re

from pyspark.sql import functions as F

from geotiff_processor_spark.operators import sessions


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double")


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second)


def test_sessionize_gap_boundaries(spark):
    rows = [
        # user 1: two events 29:59 apart (same session), then one
        # exactly 30:00 later (still same: gap must EXCEED), then one
        # 30:01 later (new session)
        (0, _t(0), 1, 1.0),
        (1, _t(29, 59), 1, 2.0),
        (2, _t(59, 59), 1, 3.0),
        (3, _t(90, 0), 1, 4.0),
        # user 2: single event
        (4, _t(5), 2, 9.5),
    ]
    out = sessions.sessionize(_ev(spark, rows)).orderBy(
        "user_id", "session_idx").collect()
    assert [(r.user_id, r.session_idx, r.n_events) for r in out] == [
        (1, 1, 3), (1, 2, 1), (2, 1, 1)]
    s1 = out[0]
    assert s1.session_start == _t(0) and s1.session_end == _t(59, 59)
    assert s1.duration_us == (59 * 60 + 59) * 1_000_000
    assert s1.total_value_c == 600
    assert out[2].duration_us == 0


def test_sessionize_equal_ts_ties_deterministic(spark):
    rows = [(10, _t(0), 1, 1.0), (11, _t(0), 1, 1.0), (12, _t(0), 1, 1.0)]
    out = sessions.sessionize(_ev(spark, rows)).collect()
    assert len(out) == 1 and out[0].n_events == 3


def test_sessionize_matches_duckdb(spark, duck, sf_dir):
    got = sessions.sessionize(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).orderBy("user_id", "session_idx").collect()
    want = duck.execute(
        sessions.sql_sessionize()
        + " ORDER BY user_id, session_idx").fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g.user_id, g.session_idx, g.n_events, g.duration_us,
                g.total_value_c) == (w[0], w[1], w[4], w[5], w[6])
        assert g.session_start == w[2] and g.session_end == w[3]


def test_sessionize_single_shuffle(spark, sf_dir):
    """The per-session aggregate must reuse the window's user-keyed
    partitioning: exactly ONE exchange in the whole plan."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = sessions.sessionize(events) \
        ._jdf.queryExecution().executedPlan().toString()
    n = len(re.findall(
        r"Exchange hashpartitioning|Exchange rangepartitioning"
        r"|Exchange SinglePartition", plan))
    assert n == 1, plan[:2000]
