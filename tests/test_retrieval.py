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


def test_postings_match_duckdb(spark, sf_dir):
    from geotiff_processor_spark.operators.retrieval import (
        build_postings, sql_postings)
    from geotiff_processor_spark.testing import spark_norm, duck_norm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM"
            f" '{sf_dir}/documents.parquet'")
    sc, sr = spark_norm(build_postings(docs))
    dc, dr = duck_norm(con, sql_postings())
    assert sc == dc and sr == dr
    assert len(sr) > 0


def test_postings_segments_reconcile_and_prune(spark, sf_dir):
    """Segment sharding partitions each word's postings exactly;
    max_df prunes stopword-grade words before any list builds."""
    from geotiff_processor_spark.operators.retrieval import build_postings

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    base = {r["word"]: (r["df"], r["total_tf"], r["doc_ids"], r["tfs"])
            for r in build_postings(docs).collect()}
    seg = build_postings(docs, n_segments=4).collect()
    merged: dict = {}
    for r in seg:
        pairs = merged.setdefault(r["word"], [])
        pairs.extend(zip(r["doc_ids"], r["tfs"]))
    for w, (df, ttf, ids, tfs) in base.items():
        got = sorted(merged[w])
        assert got == list(zip(ids, tfs)), w
        assert df == len(got) and ttf == sum(t for _, t in got)
    # max_df/min_df prune EXACTLY against the unpruned df table
    dfs = {w: v[0] for w, v in base.items()}
    cut = sorted(dfs.values())[len(dfs) // 2]  # median df as threshold
    kept_hi = {r["word"] for r in
               build_postings(docs, max_df=cut).collect()}
    assert kept_hi == {w for w, d in dfs.items() if d <= cut}
    kept_lo = {r["word"] for r in
               build_postings(docs, min_df=cut + 1).collect()}
    assert kept_lo == {w for w, d in dfs.items() if d > cut}


def test_postings_plan_no_text_in_list_shuffle(spark, sf_dir):
    """The list build shuffles (word, doc_id, tf) only — document text
    must not survive past the first projection."""
    from geotiff_processor_spark.operators.retrieval import build_postings

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    plan = build_postings(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    # text appears only in the scan/explode stage, never in an exchange
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)


def test_postings_min_df_word_wide_under_segmentation(spark):
    """min_df prunes on WORD-WIDE df even when segmented: a word whose
    global df passes must keep every segment; a word whose global df
    fails must vanish entirely (per-segment df is never the criterion)."""
    from geotiff_processor_spark.operators.retrieval import build_postings

    rows = [(i, "common") for i in range(8)] + [(100, "rare")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = build_postings(df, min_df=2, n_segments=4).collect()
    words = {}
    for r in out:
        words.setdefault(r["word"], []).extend(r["doc_ids"])
    assert "rare" not in words
    assert sorted(words["common"]) == list(range(8))
