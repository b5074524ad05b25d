"""PIP join: cell-cover prefilter exactness, ray-cast path, membership."""

from pyspark.sql import functions as F

from geotiff_processor_spark.operators import pip
from geotiff_processor_spark.sources import synth


def _geocoded(spark, sf_dir):
    return synth.geocode(synth.build_pages(spark, sf_dir, with_html=False))


def _brute_force(spark, g):
    polys = synth.build_polygons(spark)
    return g.crossJoin(F.broadcast(polys)).filter(
        (F.col("lonm") >= F.col("min_lonm"))
        & (F.col("lonm") < F.col("max_lonm"))
        & (F.col("latm") >= F.col("min_latm"))
        & (F.col("latm") < F.col("max_latm"))
    ).select("url", "polygon_id")


def test_pip_equals_brute_force(spark, sf_dir):
    g = _geocoded(spark, sf_dir)
    fast = pip.pip_join(g, pip.build_cover_table(spark)) \
        .select("url", "polygon_id")
    brute = _brute_force(spark, g)
    assert fast.exceptAll(brute).count() == 0
    assert brute.exceptAll(fast).count() == 0


def test_every_uniform_page_in_exactly_one_grid_box(spark, sf_dir):
    g = _geocoded(spark, sf_dir)
    asg = pip.pip_join(g, pip.build_cover_table(spark))
    per_page = asg.filter(F.col("zone") == "grid") \
        .groupBy("url").agg(F.count(F.lit(1)).alias("n"))
    assert per_page.filter(F.col("n") != 1).count() == 0
    # hot pages additionally hit a hot polygon
    n_hot = asg.filter(F.col("zone") == "hot").count()
    assert n_hot > 0


def test_raycast_matches_box_join_on_hot_polygons(spark, sf_dir):
    g = _geocoded(spark, sf_dir)
    hot_rows = [r for r in synth.polygon_rows() if r[1] == "hot"]
    polys = [
        {"polygon_id": pid, "xs": [a, c, c, a], "ys": [b, b, d, d]}
        for pid, zone, a, b, c, d in hot_rows
    ]
    rc = pip.pip_join_raycast(g, polys).select("url", "polygon_id")
    brute = _brute_force(spark, g).filter(F.col("polygon_id") >= 64)
    assert rc.exceptAll(brute).count() == 0
    assert brute.exceptAll(rc).count() == 0


def test_pip_plan_is_broadcast(spark, sf_dir):
    g = _geocoded(spark, sf_dir)
    fast = pip.pip_join(g, pip.build_cover_table(spark))
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
