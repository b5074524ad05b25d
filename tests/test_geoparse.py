"""Geoparse (operators/geoparse.py): extraction rule, decoy rejection,
plausibility window, and the no-UDF broadcast plan shape."""

import re

from pyspark.sql import functions as F

from geotiff_processor_spark.operators import geoparse


def test_extracts_pairs_rejects_decoys(spark):
    docs = spark.createDataFrame(
        [(1, "see 48.857,2.352 and v1.2 and id:12.34,56.78"),
         (2, "bare 12.34 , 56.78 then -0.500,-179.999"),
         (3, "no coords at all"),
         (4, "out of range 95.000,10.000 and 10.000,181.000")],
        "doc_id bigint, text string")
    out = {(r["doc_id"], r["latm"], r["lonm"])
           for r in geoparse.extract_coord_mentions(docs).collect()}
    assert out == {(1, 48857, 2352), (2, -500, -179999)}


def test_geotag_formula_counts(spark):
    docs = spark.createDataFrame(
        [(i, "w") for i in range(30)], "doc_id bigint, text string")
    tagged = docs.select(
        "doc_id",
        F.expr(geoparse.sql_geotagged_text("spark")).alias("text"))
    m = geoparse.extract_coord_mentions(tagged)
    per_doc = {r["doc_id"]: r["n"] for r in
               m.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    # every doc >= 1 mention; doc_id % 3 == 0 docs exactly 2 (modulo the
    # plausibility filter never firing: generated coords are in-window)
    assert set(per_doc) == set(range(30))
    for i in range(30):
        assert per_doc[i] == (2 if i % 3 == 0 else 1)


def test_plan_no_python_udf_and_broadcast_join(spark):
    docs = spark.createDataFrame(
        [(1, "x 10.000,20.000")], "doc_id bigint, text string")
    out = geoparse.geoparse_pip(spark, docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert re.search(r"BroadcastHashJoin", plan), plan
