"""Pyramid: level-from-level == direct resample; count conservation."""

from pyspark.sql import functions as F

from geotiff_processor_spark.operators import pyramid
from geotiff_processor_spark.sources import synth


def _valid(spark):
    return synth.build_raster(spark).filter(F.expr(synth.SQL_RASTER_VALID))


def test_iterative_equals_direct_all_levels(spark):
    rv = _valid(spark)
    levels = pyramid.build_pyramid(rv)
    for f in pyramid.OVERVIEW_FACTORS:
        it = levels[f].select("map_id", "bx", "by", "s", "c")
        direct = pyramid.resample_aggregate(rv, f) \
            .select("map_id", "bx", "by", "s", "c")
        assert it.exceptAll(direct).count() == 0, f"factor {f}"
        assert direct.exceptAll(it).count() == 0, f"factor {f}"


def test_count_conservation(spark):
    rv = _valid(spark)
    base = rv.count()
    levels = pyramid.build_pyramid(rv)
    for f in (2, 32, 256):
        assert levels[f].agg(F.sum("c")).first()[0] == base


def test_global_avg_preserved(spark):
    """AVERAGE pyramid via (sum,count) keeps the global mean exact."""
    rv = _valid(spark)
    base = rv.agg(F.sum(F.col("elev_m")).alias("s"),
                  F.count(F.lit(1)).alias("c")).first()
    lvl = pyramid.pyramid_level(rv, 256)
    top = lvl.agg(F.sum("s"), F.sum("c")).first()
    assert top[0] == base["s"] and top[1] == base["c"]
