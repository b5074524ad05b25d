"""Hillshade: analytic cases + halo-exchange correctness across tiles."""

import math

import numpy as np
from pyspark.sql import functions as F

from geotiff_processor_spark.operators import hillshade


def _grid(spark, fn, size=40):
    rows = [("m0", x, y, float(fn(x, y)))
            for x in range(size) for y in range(size)]
    return spark.createDataFrame(rows, ["map_id", "px", "py", "elev"])


def test_flat_surface_constant_shade(spark):
    r = _grid(spark, lambda x, y: 42.0)
    hs = hillshade.hillshade(r, tile=16)
    vals = {round(v["shade"], 9) for v in hs.collect()}
    expect = 255.0 * math.cos(math.radians(45.0))
    assert len(vals) == 1
    assert abs(vals.pop() - expect) < 1e-9


def test_tilted_plane_matches_closed_form(spark):
    # z = 0.1 x => dzdx = 0.1, dzdy = 0
    r = _grid(spark, lambda x, y: 0.1 * x)
    hs = hillshade.hillshade(r, tile=16)
    zen = math.radians(45.0)
    az = math.radians(hillshade.AZIMUTH_DEG)
    dzdx, dzdy = 0.1, 0.0  # east-rising plane
    slope = math.atan(5.0 * math.sqrt(dzdx ** 2 + dzdy ** 2))
    aspect = math.atan2(dzdy, -dzdx)
    expect = 255.0 * (math.cos(zen) * math.cos(slope)
                      + math.sin(zen) * math.sin(slope)
                      * math.cos(az - math.pi / 2 - aspect))
    vals = [v["shade"] for v in hs.collect()]
    assert all(abs(v - expect) < 1e-9 for v in vals)


def test_tile_size_invariance(spark):
    """Halo exchange must make tiling invisible: tile=8 == tile=64."""
    r = _grid(spark, lambda x, y: (x * 7 + y * 13) % 50, size=32)
    a = hillshade.hillshade(r, tile=8).select("px", "py", F.round("shade", 9).alias("s"))
    b = hillshade.hillshade(r, tile=64).select("px", "py", F.round("shade", 9).alias("s"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_interior_only_and_center_mask(spark):
    size = 10
    rows = [("m0", x, y, float("nan") if (x, y) == (5, 5) else 1.0)
            for x in range(size) for y in range(size)]
    r = spark.createDataFrame(rows, ["map_id", "px", "py", "elev"])
    hs = hillshade.hillshade(r.filter(~F.isnan("elev")), tile=16)
    got = {(v["px"], v["py"]) for v in hs.collect()}
    # border pixels excluded; (5,5) and its 8 neighbors excluded
    assert all(1 <= x <= size - 2 and 1 <= y <= size - 2 for x, y in got)
    assert (5, 5) not in got
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            assert (5 + dx, 5 + dy) not in got