"""Salted aggregation: identical results, spread shuffle, skew present."""

from pyspark.sql import functions as F

from geotiff_processor_spark.operators import skew
from geotiff_processor_spark.sources import synth


def test_salted_equals_direct(spark, sf_dir):
    g = synth.geocode(synth.build_pages(spark, sf_dir, with_html=False)) \
        .withColumn("cell8", F.substring("cell_id", 1, 8))
    salted = skew.salted_counts(g.select("url", "cell8"), "cell8", "url")
    direct = g.groupBy("cell8").agg(F.count(F.lit(1)).alias("n_rows"))
    assert salted.exceptAll(direct).count() == 0
    assert direct.exceptAll(salted).count() == 0


def test_hot_cells_are_actually_skewed(spark, sf_dir):
    """The synthetic layout must exercise skew: top cell >> median."""
    g = synth.geocode(synth.build_pages(spark, sf_dir, with_html=False)) \
        .withColumn("cell8", F.substring("cell_id", 1, 8))
    counts = [r["n"] for r in
              g.groupBy("cell8").agg(F.count(F.lit(1)).alias("n"))
              .orderBy(F.desc("n")).collect()]
    assert counts[0] >= 10 * counts[len(counts) // 2]


def test_degenerate_spreader_raises_or_warns(spark, sf_dir):
    """spread_col == key_col must raise; a boolean (cardinality <= 2)
    spreader must warn — both silently defeat the salting otherwise."""
    import warnings

    import pytest

    g = synth.geocode(synth.build_pages(spark, sf_dir, with_html=False)) \
        .withColumn("cell8", F.substring("cell_id", 1, 8))
    with pytest.raises(ValueError, match="spread_col must differ"):
        skew.salted_counts(g.select("url", "cell8"), "cell8", "cell8")
    with pytest.raises(ValueError, match="not in"):
        skew.salted_counts(g.select("url", "cell8"), "cell8", "nope")
    flagged = g.select("cell8", (F.length("url") % 2 == 0).alias("flag"))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        skew.salted_counts(flagged, "cell8", "flag")
    assert any("boolean" in str(w.message) for w in caught)


def test_salted_plan_has_two_aggregation_stages(spark, sf_dir):
    g = synth.geocode(synth.build_pages(spark, sf_dir, with_html=False)) \
        .withColumn("cell8", F.substring("cell_id", 1, 8))
    salted = skew.salted_counts(g.select("url", "cell8"), "cell8", "url")
    plan = salted._jdf.queryExecution().executedPlan().toString()
    # pre-aggregation on (key, salt) then final on key
    assert plan.count("HashAggregate") >= 4