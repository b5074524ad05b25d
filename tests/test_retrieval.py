"""BM25 scoring: exact arithmetic vs DuckDB, scale-shape plan checks."""

import duckdb
import math
import pytest

from geotiff_processor_spark.operators.retrieval import (
    bm25_scores, sql_bm25)

TERMS = ["join", "customer", "vector", "scan"]


def test_bm25_matches_duckdb(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_scores(docs, TERMS).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM"
            f" '{sf_dir}/documents.parquet'")
    want = dict(con.sql(sql_bm25(TERMS)).fetchall())
    assert got == want
    assert len(got) > 0


def test_bm25_hand_computed_tiny(spark):
    """Pin the formula on a 3-doc corpus computed by hand."""
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b b c"), (3, "c c c c")],
        "doc_id bigint, text string")
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_scores(docs, ["a", "c"]).collect()}
    n, avgdl = 3.0, (3 + 3 + 4) / 3.0
    k1, b = 1.2, 0.75

    def idf(df):
        return math.log(1 + (n - df + 0.5) / (df + 0.5))

    def part(tf, dl, df):
        return idf(df) * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1] == round(part(2, 3, 1), 6)          # 'a' only
    assert got[2] == round(part(1, 3, 2), 6)          # 'c' once
    assert got[3] == round(part(4, 4, 2), 6)          # 'c' x4
    assert 1 in got and 2 in got and 3 in got


def test_bm25_requires_terms(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="term"):
        bm25_scores(docs, [])


def test_bm25_plan_shape(spark, sf_dir):
    """idf joins broadcast; no cross join; the only corpus-sized
    exchange keys on (doc_id, term)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    plan = bm25_scores(docs, TERMS)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
