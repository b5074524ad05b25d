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
