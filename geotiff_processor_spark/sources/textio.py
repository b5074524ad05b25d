"""Text source formats: JSONL and CSV schema-on-read paths.

Crawl-adjacent corpora arrive as JSON-lines and CSV at least as often
as parquet; these helpers stage the canonical pages table in both
formats (content-keyed, same discipline as ``_stage_media``) and read
them back with EXPLICIT schemas — schema inference is a scale
anti-pattern (it double-scans the input), so the read path pins
``.schema(...)`` + FAILFAST, the posture a production ingest runs with.
The round trip must be lossless: the differential oracle recomputes the
aggregates straight from the pages formulas, so any quoting/escaping/
timestamp-format bug in either direction breaks the hash.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .synth import build_pages_staged

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
PAGES_DDL = "url string, warc_ts timestamp, text string, lang string"


def _stage_text(spark: SparkSession, sf_dir: str, fmt: str):
    """Write pages once per (sf_dir, fmt) as JSONL or CSV; returns the
    staged path. Atomic-rename publish; unique private staging dir."""
    pages = build_pages_staged(spark, sf_dir, with_html=False)
    key = hashlib.sha256(
        f"{sf_dir}|textio|{fmt}|v1".encode()).hexdigest()[:16]
    path = os.path.join(tempfile.gettempdir(), f"gps_textio_{fmt}_{key}")
    if not os.path.exists(path):
        tmp = f"{path}.staging-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        w = pages.repartition(8).write.mode("overwrite")
        if fmt == "jsonl":
            w.option("timestampFormat", TS_FMT).json(tmp)
        else:
            (w.option("header", "true").option("quoteAll", "true")
             .option("timestampFormat", TS_FMT).csv(tmp))
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def read_pages_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_text(spark, sf_dir, "jsonl")
    return (spark.read.schema(PAGES_DDL)
            .option("timestampFormat", TS_FMT)
            .option("mode", "FAILFAST")
            .json(path))


def read_pages_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_text(spark, sf_dir, "csv")
    return (spark.read.schema(PAGES_DDL)
            .option("header", "true")
            .option("timestampFormat", TS_FMT)
            .option("mode", "FAILFAST")
            .csv(path))


def pages_digest(pages: DataFrame) -> DataFrame:
    """Loss-detection rollup: per-lang count, total text bytes, url md5
    xor-surrogate (sum of 60-bit md5 prefixes) and the max timestamp —
    any field the format layer mangles shows up here."""
    from ..operators.dedup import sql_hash60

    # % 1e9+7 keeps the SUM inside bigint under ANSI at any row count
    h_url = f"({sql_hash60('url')} % 1000000007)"
    h_ts = f"({sql_hash60('cast(warc_ts as string)')} % 1000000007)"
    return (pages.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.length("text")).alias("n_text_chars"),
        F.sum(F.expr(h_url)).alias("url_hash_sum"),
        F.sum(F.expr(h_ts)).alias("ts_hash_sum"),
    ))
