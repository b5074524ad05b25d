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


def test_cell_prefix_recall(spark, sf_dir):
    g = _geocoded(spark, sf_dir)
    q = synth.build_knn_queries(spark)
    exact = knn.knn_exact(g, q, k=5).select("query_id", "url")
    n_exact = exact.count()
    approx0 = knn.knn_cell_prefix(g, q, k=5, prefix_level=2, ring=0) \
        .select("query_id", "url")
    approx1 = knn.knn_cell_prefix(g, q, k=5, prefix_level=2, ring=1) \
        .select("query_id", "url")
    recall0 = exact.intersect(approx0).count() / n_exact
    recall1 = exact.intersect(approx1).count() / n_exact
    # ring expansion must strictly help near cell borders
    assert recall1 >= recall0
    assert recall1 >= 0.95  # 3x3 block at level 2 covers the k-NN ball


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
