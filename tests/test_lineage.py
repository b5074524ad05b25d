"""Checkpoint/resume + partition metrics (north_rule resumability)."""

from pyspark.sql import functions as F

from geotiff_processor_spark.operators import pip
from geotiff_processor_spark.plans import lineage
from geotiff_processor_spark.sources import synth


def _geocoded(spark, sf_dir):
    return synth.geocode(synth.build_pages(spark, sf_dir, with_html=False))


def test_partition_metrics_sum_to_total(spark, sf_dir):
    g = _geocoded(spark, sf_dir)
    m = lineage.partition_metrics(
        g.withColumn("cell_pfx", F.substring("cell_id", 1, 2)),
        ["cell_pfx"], bytes_col="text")
    agg = m.agg(F.sum("n_rows"), F.sum("n_bytes")).first()
    assert agg[0] == g.count()
    assert agg[1] == g.agg(F.sum(F.length("text"))).first()[0]


def test_resume_skips_committed_partitions(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ckpt")
    g = _geocoded(spark, sf_dir).withColumn(
        "cell_pfx", F.substring("cell_id", 1, 1))
    # nothing committed yet: resume passes everything through
    assert lineage.resume_filter(g, spark, out, "geocode",
                                 ["cell_pfx"]).count() == g.count()
    lineage.checkpoint_write(g, out, "geocode", ["cell_pfx"])
    # everything committed: resume leaves nothing
    remaining = lineage.resume_filter(g, spark, out, "geocode", ["cell_pfx"])
    assert remaining.count() == 0
    # written data round-trips
    back = spark.read.parquet(f"{out}/geocode")
    assert back.count() == g.count()


def test_write_after_resume_keeps_committed_partitions(spark, sf_dir, tmp_path):
    """Checkpoint half, resume, write the rest: BOTH halves must survive
    (dynamic partition overwrite — the static default truncates)."""
    out = str(tmp_path / "ckpt3")
    g = _geocoded(spark, sf_dir).withColumn(
        "cell_pfx", F.substring("cell_id", 1, 1))
    half = g.filter(F.col("cell_pfx") < "2")
    lineage.checkpoint_write(half, out, "geocode", ["cell_pfx"])
    remaining = lineage.resume_filter(g, spark, out, "geocode", ["cell_pfx"])
    lineage.checkpoint_write(remaining, out, "geocode", ["cell_pfx"])
    back = spark.read.parquet(f"{out}/geocode")
    assert back.count() == g.count()
    assert back.filter(F.col("cell_pfx") < "2").count() == half.count()
    # done markers accumulate across the two writes
    done = lineage.completed_keys(spark, out, "geocode")
    assert done.count() == g.select("cell_pfx").distinct().count()
    # a second resume now filters everything
    assert lineage.resume_filter(g, spark, out, "geocode",
                                 ["cell_pfx"]).count() == 0


def test_resume_partial_commit(spark, sf_dir, tmp_path):
    out = str(tmp_path / "ckpt2")
    g = _geocoded(spark, sf_dir).withColumn(
        "cell_pfx", F.substring("cell_id", 1, 1))
    half = g.filter(F.col("cell_pfx") < "2")
    lineage.checkpoint_write(half, out, "geocode", ["cell_pfx"])
    remaining = lineage.resume_filter(g, spark, out, "geocode", ["cell_pfx"])
    assert remaining.count() == g.count() - half.count()
    assert remaining.filter(F.col("cell_pfx") < "2").count() == 0
