"""Sinks: partitioned writes, pruning, round-trips (S7-S14 analogs)."""

import os

from pyspark.sql import functions as F

from geotiff_processor_spark.operators import pyramid, tiling
from geotiff_processor_spark.sources import sinks, synth


def _geocoded(spark, sf_dir):
    return synth.geocode(synth.build_pages(spark, sf_dir, with_html=False))


def test_write_tiles_partitioned_and_pruned(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tiles")
    base = tiling.tile_counts(_geocoded(spark, sf_dir), zoom=6)
    levels = tiling.tile_pyramid_counts(base, down_to_zoom=4)
    allz = None
    for z, df in levels.items():
        allz = df if allz is None else allz.unionByName(df)
    sinks.write_tiles(allz, path)
    back = spark.read.parquet(path)
    assert back.count() == allz.count()
    # partition pruning: the zoom filter must land in PartitionFilters
    one = back.filter(F.col("zoom") == 5)
    plan = one._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "zoom" in pf[0]
    assert one.count() == levels[5].count()


def test_pyramid_sink_roundtrip(spark, tmp_path):
    path = str(tmp_path / "pyr")
    rv = synth.build_raster(spark).filter(F.expr(synth.SQL_RASTER_VALID))
    levels = pyramid.build_pyramid(rv, factors=[8, 64])
    sinks.write_pyramid(levels, path)
    l64 = sinks.read_pyramid_level(spark, path, 64)
    direct = pyramid.resample_aggregate(rv, 64).select("bx", "by", "s", "c")
    assert l64.select("bx", "by", "s", "c").exceptAll(direct).count() == 0


def test_sidecar_preview_quantities(spark, tmp_path):
    sinks.write_georef_sidecar(
        spark, str(tmp_path / "tfw"), "m0", 0.2, -58400, -34600)
    side = spark.read.parquet(str(tmp_path / "tfw")).first()
    assert side["px_w"] == 0.2 and side["px_h"] == -0.2

    rv = synth.build_raster(spark).filter(F.expr(synth.SQL_RASTER_VALID))
    coarse = pyramid.pyramid_level(rv, 256)
    sinks.write_preview(coarse, str(tmp_path / "prev"))
    assert spark.read.parquet(str(tmp_path / "prev")).count() == coarse.count()

    qpath = str(tmp_path / "q.txt")
    sinks.write_quantities([1.0, 2.5, 3.0, 4.0, 5.0, 6.0, 7.123456789],
                           qpath)
    with open(qpath) as f:
        vals = f.read().split(",")
    assert len(vals) == 7 and vals[-1] == "7.123457"