"""MERGE upsert (operators/merge.py): matched-update / unmatched-keep /
insert semantics, deterministic duplicate policy, single-shuffle plan."""

import re

import pytest

from geotiff_processor_spark.operators.merge import merge_upsert


def test_merge_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k bigint, v string, n bigint")
    source = spark.createDataFrame(
        [(2, "B", 200), (9, "z", 90)], "k bigint, v string, n bigint")
    out = {r["k"]: (r["v"], r["n"]) for r in
           merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: ("a", 10),      # untouched survives
                   2: ("B", 200),     # matched -> source wins
                   3: ("c", 30),
                   9: ("z", 90)}      # source-only inserts


def test_duplicate_source_keys_deterministic(spark):
    target = spark.createDataFrame([(1, "a")], "k bigint, v string")
    source = spark.createDataFrame(
        [(1, "x"), (1, "y")], "k bigint, v string")
    rows = merge_upsert(target, source, ["k"]).collect()
    assert len(rows) == 1 and rows[0]["v"] == "y"  # greatest tuple wins


def test_schema_mismatch_rejected(spark):
    target = spark.createDataFrame([(1, "a")], "k bigint, v string")
    bad = spark.createDataFrame([(1, 2)], "k bigint, other bigint")
    with pytest.raises(ValueError, match="schemas differ"):
        merge_upsert(target, bad, ["k"])


def test_plan_single_shuffle_no_join(spark):
    target = spark.createDataFrame([(1, "a")], "k bigint, v string")
    source = spark.createDataFrame([(2, "b")], "k bigint, v string")
    plan = merge_upsert(target, source, ["k"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_null_keys_never_match(spark):
    """SQL MERGE's ON t.k = s.k never matches NULL: the target NULL-key
    row survives and the source NULL-key row inserts (2 rows out, not a
    merged 1)."""
    target = spark.createDataFrame([(None, "a"), (1, "t")],
                                   "k bigint, v string")
    source = spark.createDataFrame([(None, "b")], "k bigint, v string")
    rows = sorted(((r["k"], r["v"]) for r in
                   merge_upsert(target, source, ["k"]).collect()),
                  key=lambda x: (x[0] is not None, x[0] or 0, x[1]))
    assert rows == [(None, "a"), (None, "b"), (1, "t")]


def test_snapshot_diff_semantics(spark):
    from geotiff_processor_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "x")], "k bigint, v string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d"), (None, "y")], "k bigint, v string")
    got = {(r["op"], r["k"], r["v"]) for r in
           snapshot_diff(old, new, ["k"]).collect()}
    assert got == {("update", 2, "B"), ("delete", 3, "c"),
                   ("insert", 4, "d"),
                   # NULL keys never match: old deletes, new inserts
                   ("delete", None, "x"), ("insert", None, "y")}


def test_snapshot_diff_inverse_of_merge(spark, sf_dir):
    """diff(old, merge(old, changes)) == changes (when changes really
    change something) — the two operators are inverses."""
    from geotiff_processor_spark.operators.merge import (
        merge_upsert, snapshot_diff)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as FF
    ups = docs.filter(FF.col("doc_id") % 7 == 0).select(
        "doc_id", FF.upper(FF.col("text")).alias("text"), "lang",
        "source", "n_chars")
    ins = docs.filter(FF.col("doc_id") % 31 == 0).select(
        (-(FF.col("doc_id") + 1)).alias("doc_id"), "text", "lang",
        FF.lit("new").alias("source"), "n_chars")
    merged = merge_upsert(docs, ups.unionByName(ins), ["doc_id"])
    diff = snapshot_diff(docs, merged, ["doc_id"])
    ops = {r["op"]: r["n"] for r in
           diff.groupBy("op").agg(FF.count("*").alias("n")).collect()}
    assert ops.get("insert", 0) == ins.count()
    assert ops.get("delete", 0) == 0
    assert ops.get("update", 0) <= ups.count()
    assert ops.get("update", 0) == ups.join(
        docs.select("doc_id", FF.col("text").alias("_t")), "doc_id") \
        .filter(FF.col("text") != FF.col("_t")).count()
