"""A9 adaptive stat-then-branch (geoserverRGB.py:15-16 semantics)."""

from pyspark.sql import functions as F

from geotiff_processor_spark.plans import adaptive
from geotiff_processor_spark.sources import synth


def _rv(spark):
    return synth.build_raster(spark).filter(F.expr(synth.SQL_RASTER_VALID))


def test_branch_flips_across_area_threshold(spark):
    rv = _rv(spark)
    # ~65k valid px at 0.2 m GSD = 0.26 ha < 150 => fine 10 cm, factor 2
    _, gsd_small, f_small = adaptive.adaptive_pyramid_level(
        rv, gsd_m=0.2, base_gsd_cm=5)
    # same raster at 60 m GSD = 23.6k ha > 150 => standard 20 cm, factor 4
    _, gsd_big, f_big = adaptive.adaptive_pyramid_level(
        rv, gsd_m=60.0, base_gsd_cm=5)
    assert (gsd_small, f_small) == (10, 2)
    assert (gsd_big, f_big) == (20, 4)


def test_chosen_plan_grid_matches_factor(spark):
    rv = _rv(spark)
    plan, _, factor = adaptive.adaptive_pyramid_level(
        rv, gsd_m=0.2, base_gsd_cm=5)
    assert factor == 2
    # 256x256 raster resampled by 2 => block coords in [0, 128)
    mx = plan.agg(F.max("bx"), F.max("by")).first()
    assert mx[0] == 127 and mx[1] == 127
    # exact conservation: sum over blocks == sum over valid pixels
    assert (plan.agg(F.sum("s")).first()[0]
            == rv.agg(F.sum("elev_m")).first()[0])


def test_area_measure_matches_reference_formula(spark):
    rv = _rv(spark)
    n = rv.count()
    assert adaptive.measured_area_ha(rv, 0.2) == n * 0.04 / 10000.0
