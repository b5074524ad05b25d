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


def test_warc_gz_member_walk(spark):
    """Per-record gzip members AND whole-blob gzip both inflate to the
    same record stream; truncation and trailing garbage are loud."""
    recs = []
    for i, payload in enumerate((b"abc", b"defgh")):
        recs.append(
            f"WARC/1.0\r\nWARC-Target-URI: http://r{i}\r\n"
            f"WARC-Date: 2025-01-01T00:00:0{i}Z\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload + b"\r\n\r\n")
    per_member = b"".join(warc._gzip_member(r) for r in recs)
    whole_blob = warc._gzip_member(b"".join(recs))

    def run(blob):
        df = spark.createDataFrame([(bytearray(blob),)], "warc binary")
        return {(r["url"], r["n_bytes"], bytes(r["html"]))
                for r in warc.parse_warc(df).collect()}

    want = {("http://r0", 3, b"abc"), ("http://r1", 5, b"defgh")}
    assert run(per_member) == want
    assert run(whole_blob) == want
    with pytest.raises(Exception, match="truncated gzip member"):
        run(per_member[:-8])
    with pytest.raises(Exception, match="trailing non-gzip"):
        run(per_member + b"junk")


def test_warc_gz_table_matches_plain(spark, sf_dir):
    plain = warc.parse_warc(warc.build_warc(spark, sf_dir)) \
        .agg(F.count("*"), F.sum("n_bytes")).first()
    gz = warc.parse_warc(warc.build_warc_gz(spark, sf_dir)) \
        .agg(F.count("*"), F.sum("n_bytes")).first()
    assert tuple(plain) == tuple(gz)
