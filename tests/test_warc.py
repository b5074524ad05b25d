"""WARC source: pack/parse round trip, corruption handling."""

import pytest
from pyspark.sql import functions as F

from geotiff_processor_spark.functions.text import extract_text
from geotiff_processor_spark.sources import synth, warc


def test_warc_roundtrip_byte_exact(spark, sf_dir):
    """parse(pack(pages)) reproduces url/date/length/extracted-text
    exactly — the ISO 28500 walker against real record boundaries."""
    blobs = warc.build_warc(spark, sf_dir)
    parsed = warc.parse_warc(blobs).select(
        "url", "warc_date", "n_bytes",
        extract_text("html").alias("text"))
    pages = synth.build_pages_staged(spark, sf_dir, with_html=True) \
        .select("url",
                F.date_format("warc_ts",
                              warc.WARC_DATE_FMT_SPARK).alias("warc_date"),
                F.length("html").cast("bigint").alias("n_bytes"),
                "text")
    assert {tuple(r) for r in parsed.collect()} \
        == {tuple(r) for r in pages.collect()}
    # blobs genuinely multi-record
    per_blob = warc.parse_warc(blobs.limit(20))
    assert per_blob.count() > 20


def test_warc_parser_rejects_corruption(spark):
    good = (b"WARC/1.0\r\nWARC-Target-URI: http://a\r\n"
            b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
            b"Content-Length: 3\r\n\r\nabc\r\n\r\n")
    def run(blob):
        df = spark.createDataFrame([(bytearray(blob),)], "warc binary")
        return warc.parse_warc(df).collect()
    assert len(run(good)) == 1
    for bad, msg in (
            (good[:-4] + b"XXXX", "terminator"),  # corrupted \r\n\r\n
            (good[:-4], "truncated"),             # cut before it
            (good.replace(b"WARC/1.0", b"HTTP/1.1"), "version"),
            (good.replace(b"Content-Length: 3", b"Content-Length: 99"),
             "truncated"),
            (good.replace(b"Content-Length: 3\r\n", b""), "Content-Length"),
            (good[:20], "unterminated"),
    ):
        with pytest.raises(Exception) as ei:
            run(bad)
        assert msg in str(ei.value), msg
