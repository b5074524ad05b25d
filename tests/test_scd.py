"""SCD2 history (operators/scd.py): versioning semantics, duplicate
squash, plan shape, and consistency with the as-of join."""

import datetime as dt
import re

from pyspark.sql import functions as F

from geotiff_processor_spark.operators.asof import asof_join
from geotiff_processor_spark.operators.scd import scd2_history


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


def test_versions_and_squash(spark):
    ups = spark.createDataFrame(
        [("k1", _ts(1), "a"), ("k1", _ts(2), "a"),   # squashed
         ("k1", _ts(3), "b"), ("k1", _ts(4), "a"),   # re-change re-opens
         ("k2", _ts(5), "x")],
        "k string, ts timestamp, attr string")
    out = {(r["k"], r["valid_from"]): r for r in
           scd2_history(ups, ["k"], "ts", ["attr"]).collect()}
    assert set(out) == {("k1", _ts(1)), ("k1", _ts(3)), ("k1", _ts(4)),
                        ("k2", _ts(5))}
    assert out[("k1", _ts(1))]["valid_to"] == _ts(3)   # squash spans h2
    assert out[("k1", _ts(1))]["attr"] == "a"
    assert out[("k1", _ts(4))]["valid_to"] is None
    assert out[("k1", _ts(4))]["is_current"] is True
    assert out[("k1", _ts(3))]["is_current"] is False
    assert out[("k2", _ts(5))]["is_current"] is True


def test_duplicate_ts_keeps_max_attr(spark):
    ups = spark.createDataFrame(
        [("k", _ts(1), "a"), ("k", _ts(1), "c"), ("k", _ts(1), "b")],
        "k string, ts timestamp, attr string")
    rows = scd2_history(ups, ["k"], "ts", ["attr"]).collect()
    assert len(rows) == 1 and rows[0]["attr"] == "c"


def test_plan_single_exchange(spark):
    ups = spark.createDataFrame(
        [("k", _ts(1), "a")], "k string, ts timestamp, attr string")
    plan = scd2_history(ups, ["k"], "ts", ["attr"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "Join" not in plan


def test_consistent_with_asof_join(spark, sf_dir):
    """For any probe time, the SCD2 version whose range contains it
    carries the same attr the as-of join reports — the two operators
    are views of one temporal rule."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ups = ev.select("user_id", "ts",
                    (F.floor(F.col("value") * 10).cast("bigint") % 3)
                    .alias("tier"))
    hist = scd2_history(ups, ["user_id"], "ts", ["tier"]).select(
        F.col("user_id").alias("h_user"), F.col("tier").alias("h_tier"),
        "valid_from", "valid_to")
    probe = ev.select("event_id", "user_id", "ts").limit(300)
    enriched = asof_join(probe, ups.groupBy("user_id", "ts")
                         .agg(F.max("tier").alias("tier")),
                         ["user_id"], "ts", ["tier"])
    joined = enriched.join(
        hist,
        (enriched.user_id == F.col("h_user"))
        & (enriched.ts >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (enriched.ts < F.col("valid_to"))),
        "left")
    bad = joined.filter(
        ~F.col("asof_tier").eqNullSafe(F.col("h_tier"))).count()
    assert bad == 0
