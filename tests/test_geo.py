"""Cell index properties: parent-prefix, UDF/native equivalence, covers."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from geotiff_processor_spark.functions import geo
from geotiff_processor_spark.sources import synth


def test_parent_prefix_property(spark, sf_dir):
    g = synth.geocode(synth.build_pages(spark, sf_dir, with_html=False))
    bad = g.withColumn(
        "cell4", F.expr(geo.sql_cell_id("lonm", "latm", 4))
    ).filter(
        F.substring("cell_id", 1, 4) != F.col("cell4")
    ).count()
    assert bad == 0


def test_native_equals_pandas_udf(spark, sf_dir):
    g = synth.geocode(synth.build_pages(spark, sf_dir, with_html=False))
    udf = geo.make_cell_id_pandas_udf(12)
    bad = g.withColumn("cell_udf", udf(F.col("lonm"), F.col("latm"))) \
        .filter(F.col("cell_udf") != F.col("cell_id")).count()
    assert bad == 0


@settings(max_examples=200, deadline=None)
@given(
    lonm=st.integers(-180_000, 180_000),
    latm=st.integers(-90_000, 90_000),
    level=st.integers(1, 8),
)
def test_cover_contains_point_cell(lonm, latm, level):
    """Any point inside a bbox must land in one of the bbox's cover cells."""
    cell = geo.np_cell_id(np.array([lonm]), np.array([latm]), levels=level)[0]
    cover = geo.cell_range_for_bbox(lonm, latm, lonm + 1, latm + 1, level)
    assert cell in cover


@settings(max_examples=100, deadline=None)
@given(
    min_lonm=st.integers(-180_000, 179_000),
    min_latm=st.integers(-90_000, 89_000),
    w=st.integers(1, 50_000),
    h=st.integers(1, 50_000),
    fx=st.floats(0, 0.999),
    fy=st.floats(0, 0.999),
)
def test_cover_contains_interior_points(min_lonm, min_latm, w, h, fx, fy):
    max_lonm = min(min_lonm + w, 180_000)
    max_latm = min(min_latm + h, 90_000)
    px = min_lonm + int((max_lonm - min_lonm) * fx)
    py = min_latm + int((max_latm - min_latm) * fy)
    level = 4
    cell = geo.np_cell_id(np.array([px]), np.array([py]), levels=level)[0]
    cover = geo.cell_range_for_bbox(min_lonm, min_latm, max_lonm, max_latm,
                                    level)
    assert cell in cover


def test_cell_key_matches_quadkey(spark, sf_dir):
    """Integer join key partitions identically to the string quadkey."""
    g = synth.geocode(synth.build_pages(spark, sf_dir, with_html=False))
    df = g.select(
        F.substring("cell_id", 1, 4).alias("cell4"),
        F.expr(geo.sql_cell_key("lonm", "latm", 4)).alias("key4"),
    ).distinct().collect()
    mapping = {}
    for r in df:
        assert geo.cell_key_for_quadkey(r["cell4"]) == r["key4"]
        assert mapping.setdefault(r["cell4"], r["key4"]) == r["key4"]


def test_tile_x_integer_vs_mercator_bounds(spark, sf_dir):
    g = synth.geocode(synth.build_pages(spark, sf_dir, with_html=False))
    t = g.withColumn("tx", F.expr(geo.sql_tile_x("lonm", 8))) \
         .withColumn("ty", F.expr(geo.sql_tile_y("lat", 8)))
    row = t.agg(F.min("tx"), F.max("tx"), F.min("ty"), F.max("ty")).first()
    assert row[0] >= 0 and row[1] <= 255
    assert row[2] >= 0 and row[3] <= 255
