"""Structured-Streaming AvailableNow ingest: drain, checkpoint, idempotent."""

import os

from pyspark.sql import functions as F

from geotiff_processor_spark.sources import synth
from geotiff_processor_spark.streaming import ingest


def test_available_now_ingest_and_resume(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = synth.build_pages(spark, sf_dir, with_html=False)
    pages.repartition(4).write.parquet(src)

    ingest.ingest_pages_stream(spark, src, out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == pages.count()
    assert "cell_id" in first.columns
    n_files = len([f for root, _, fs in os.walk(out)
                   for f in fs if f.endswith(".parquet")])

    # rerun with same checkpoint: no new input => no new files
    ingest.ingest_pages_stream(spark, src, out, ckpt)
    again = spark.read.parquet(out)
    assert again.count() == pages.count()
    n_files2 = len([f for root, _, fs in os.walk(out)
                    for f in fs if f.endswith(".parquet")])
    assert n_files2 == n_files


def test_windowed_throughput(spark, sf_dir):
    pages = synth.build_pages(spark, sf_dir, with_html=False)
    w = ingest.windowed_throughput(pages)
    total = w.agg(F.sum("n_pages")).first()[0]
    assert total == pages.count()
