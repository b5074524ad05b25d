"""Mapbox/Terrarium exact identities + decode round-trips + break walk."""

import math

from pyspark.sql import functions as F

from geotiff_processor_spark.functions import encodings
from geotiff_processor_spark.operators import pyramid  # noqa: F401
from geotiff_processor_spark.sources import synth


def _valid(spark):
    return synth.build_raster(spark).filter(F.expr(synth.SQL_RASTER_VALID))


def test_mapbox_roundtrip(spark):
    """elevation = -10000 + ((r*65536 + g*256 + b) * 0.1)
    (geoserverDEM.py:96-98) recovers elev to the 0.1 m quantization."""
    r, g, b = encodings.mapbox_rgb("elev")
    df = _valid(spark).select(
        "elev", r.alias("r"), g.alias("g"), b.alias("b"))
    dec = df.withColumn(
        "elev_dec",
        (F.lit(-10000.0)
         + (F.col("r") * 65536 + F.col("g") * 256 + F.col("b")) * F.lit(0.1)))
    bad = dec.filter(F.abs(F.col("elev_dec") - F.col("elev")) > 0.05).count()
    assert bad == 0


def test_terrarium_roundtrip(spark):
    """elevation = (r*256 + g + b/256) - 32768 (geoserverDEM.py:100-102)."""
    r, g, b = encodings.terrarium_rgb("elev")
    df = _valid(spark).select(
        "elev", r.alias("r"), g.alias("g"), b.alias("b"))
    dec = df.withColumn(
        "elev_dec",
        (F.col("r") * 256 + F.col("g") + F.col("b") / F.lit(256.0))
        - F.lit(32768.0))
    bad = dec.filter(
        F.abs(F.col("elev_dec") - F.col("elev")) > 1.0 / 256).count()
    assert bad == 0


def test_mapbox_byte_range(spark):
    r, g, b = encodings.mapbox_rgb("elev")
    df = _valid(spark).select(r.alias("r"), g.alias("g"), b.alias("b"))
    row = df.agg(F.min("r"), F.max("r"), F.min("g"), F.max("g"),
                 F.min("b"), F.max("b")).first()
    assert all(0 <= v <= 255 for v in row)


def test_break_walk_matches_reference_loop():
    """The closed-form SQL multipliers equal the reference's iterative
    walk (helpers.py:124-136) to FP tolerance."""
    tmin, tmax = 12.5, 873.0
    loop = encodings.color_breaks(tmin, tmax)
    per = ((tmax / 2) - (tmin / 2)) / 7
    closed = [tmin + m * per for m in (0, 1, 3, 4, 8, 11, 14)]
    assert all(math.isclose(a, b, rel_tol=1e-12) for a, b in zip(loop, closed))
    assert len(loop) == 7


def test_quantities_format():
    """quantities.py:14-24: 7 comma-joined values rounded to 6dp."""
    vals = encodings.color_breaks(0.0, 700.0)
    s = ",".join(str(round(v, 6)) for v in vals)
    assert len(s.split(",")) == 7
