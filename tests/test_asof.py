"""As-of join (operators/asof.py): tie rule, left semantics, tolerance,
and the no-join single-shuffle plan shape."""

import datetime as dt
import re

import pytest
from pyspark.sql import functions as F

from geotiff_processor_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    probe = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:00:00"), "click"),
         (2, "u1", _ts("2024-01-01T12:00:00"), "view"),
         (3, "u2", _ts("2024-01-01T09:00:00"), "click"),   # no prior build
         (4, "u2", _ts("2024-01-01T11:00:00"), "click"),   # exact-tie match
         (5, "u3", _ts("2024-01-01T23:00:00"), "view")],   # stale for tol
        "event_id bigint, user_id string, ts timestamp, event_type string")
    build = spark.createDataFrame(
        [("u1", _ts("2024-01-01T09:30:00"), 10.0),
         ("u1", _ts("2024-01-01T11:30:00"), 20.0),
         ("u2", _ts("2024-01-01T11:00:00"), 30.0),
         ("u3", _ts("2024-01-01T01:00:00"), 40.0)],
        "user_id string, ts timestamp, value double")
    return probe, build


def test_latest_at_or_before_per_key(frames):
    probe, build = frames
    out = {r["event_id"]: r for r in
           asof_join(probe, build, ["user_id"], "ts", ["value"]).collect()}
    assert out[1]["asof_value"] == 10.0          # only 09:30 precedes 10:00
    assert out[2]["asof_value"] == 20.0          # 11:30 supersedes 09:30
    assert out[3]["asof_value"] is None          # left: nothing before
    assert out[3]["asof_ts"] is None
    assert out[4]["asof_value"] == 30.0          # inclusive: build AT probe ts
    assert out[4]["asof_ts"] == _ts("2024-01-01T11:00:00")
    assert out[5]["asof_value"] == 40.0
    # probe columns ride through untouched
    assert out[2]["event_type"] == "view"
    assert set(out[1].asDict()) == {
        "event_id", "user_id", "ts", "event_type", "asof_ts", "asof_value"}


def test_tolerance_nulls_stale_matches_only(frames):
    probe, build = frames
    out = {r["event_id"]: r for r in
           asof_join(probe, build, ["user_id"], "ts", ["value"],
                     tolerance_s=3600).collect()}
    assert out[5]["asof_value"] is None   # 22 h stale -> nulled
    assert out[2]["asof_value"] == 20.0   # 30 min fresh -> kept
    assert out[4]["asof_value"] == 30.0   # 0 s -> kept


def test_plan_one_shuffle_no_join(frames):
    probe, build = frames
    out = asof_join(probe, build, ["user_id"], "ts", ["value"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"Join", plan), plan
    ex = re.findall(r"Exchange hashpartitioning", plan)
    assert len(ex) == 1, plan


def test_rejects_column_clash_and_missing_keys(frames):
    probe, build = frames
    with pytest.raises(ValueError, match="must exist on both sides"):
        asof_join(probe, build, ["nope"], "ts", ["value"])
    with pytest.raises(ValueError, match="asof"):
        asof_join(probe.withColumn("asof_value", F.lit(1)),
                  build, ["user_id"], "ts", ["value"])


def test_null_build_value_is_carried_not_skipped(spark):
    """A build row whose VALUE is NULL still advances the state (ASOF
    semantics: the row matched; its value happens to be NULL) — the
    running last must not stitch asof_ts and asof_value from different
    build rows."""
    probe = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T12:00:00"), "click")],
        "event_id bigint, user_id string, ts timestamp, event_type string")
    build = spark.createDataFrame(
        [("u", _ts("2024-01-01T10:00:00"), 5.0),
         ("u", _ts("2024-01-01T11:00:00"), None)],
        "user_id string, ts timestamp, value double")
    r = asof_join(probe, build, ["user_id"], "ts", ["value"]).first()
    assert r["asof_ts"] == _ts("2024-01-01T11:00:00")
    assert r["asof_value"] is None
