"""Engine-vs-oracle equivalence of the synthetic sources themselves —
pins the byte-identical `text` per url invariant (BASELINE.json)."""

from geotiff_processor_spark.sources import synth
from geotiff_processor_spark.testing import assert_spark_equals_duck


def test_pages_identical_across_engines(spark, duck, sf_dir):
    df = synth.build_pages(spark, sf_dir, with_html=False)
    sql = "WITH " + synth.pages_cte("duckdb") + " SELECT * FROM pages"
    assert_spark_equals_duck(df, duck, sql, "pages")


def test_geocoded_identical_across_engines(spark, duck, sf_dir):
    df = synth.geocode(synth.build_pages(spark, sf_dir, with_html=False))
    sql = "WITH " + synth.geocoded_cte("duckdb") + " SELECT * FROM geocoded"
    assert_spark_equals_duck(df, duck, sql, "geocoded")


def test_raster_identical_across_engines(spark, duck):
    df = synth.build_raster(spark)
    sql = "WITH " + synth.raster_cte("duckdb").lstrip(",\n ") + \
        " SELECT * FROM raster"
    assert_spark_equals_duck(df, duck, sql, "raster")


def test_html_embeds_text(spark, sf_dir):
    pages = synth.build_pages(spark, sf_dir, with_html=True)
    row = pages.first()
    assert row["text"] in row["html"].decode("utf-8")
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]


def test_hot_skew_present(spark, sf_dir):
    g = synth.geocode(synth.build_pages(spark, sf_dir, with_html=False))
    n = g.count()
    from pyspark.sql import functions as F
    hot = g.filter(
        (F.abs(F.col("lonm") - (-58400)) <= 50)
        & (F.abs(F.col("latm") - (-34600)) <= 50)).count()
    # ~5% of pages across 3 cities => ~1.67% in Buenos Aires
    assert hot >= n * 0.01


def test_fast_geocode_parser_equals_regexp(spark, sf_dir):
    """Engine hot-path (substring_index) and oracle (regexp) location
    parsers must agree row-by-row, NULLs included."""
    from pyspark.sql import functions as F
    p = synth.build_pages(spark, sf_dir, with_html=False)
    bad = p.select(
        F.expr(f"({synth.SQL_GEO_LONM}) <=> ({synth.SQL_GEO_LONM_FAST})")
        .alias("e1"),
        F.expr(f"({synth.SQL_GEO_LATM}) <=> ({synth.SQL_GEO_LATM_FAST})")
        .alias("e2"),
    ).filter("not e1 or not e2")
    assert bad.count() == 0
    # and a loc-less text parses to NULL on both
    odd = spark.createDataFrame(
        [("no location here",), ("x loc=12/ y",)], ["text"])
    rows = odd.select(
        F.expr(synth.SQL_GEO_LONM_FAST).alias("f"),
        F.expr(synth.SQL_GEO_LONM).alias("r")).collect()
    assert rows[0]["f"] is None and rows[0]["r"] is None
