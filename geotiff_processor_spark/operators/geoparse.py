"""Geoparsing: pull coordinate mentions out of free webtext and join
them to the polygon layer — the webtext-to-geospatial bridge stage
(crawled pages cite places as "48.857,2.352"; the engine turns those
strings into PIP-joinable points).

Scale shape: extraction is a fused native-expression stage over the
text scan (regexp_extract_all + arrays_zip + explode — no UDF, no
shuffle); the polygon join is the broadcast cell-cover PIP join
(operators/pip.py), so the whole pipeline is scan -> narrow explode ->
broadcast join -> one aggregation shuffle. Reference analog: the
reference geocodes whole rasters from filename metadata
(process.py/helpers.py georef); here coordinates live INSIDE the
payload text, the web-corpus equivalent.

The synthetic geotag rule (``sql_geotagged_text``) is emitted for both
engines from one formula, so the DuckDB oracle re-runs the SAME regex
extraction over the SAME constructed text — the extraction itself is
oracle-checked, not just the downstream counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import sql_hash60
from .pip import DEFAULT_COVER_LEVEL, build_cover_table, pip_join

# exactly-3-decimals pair: matches the synthetic geotag format and
# rejects version-ish decoys ("12.34,56.78", "v1.2")
COORD_GROUP_RE = r"(-?\d+\.\d{3}),(-?\d+\.\d{3})"


def sql_coord_mdeg(seed: str, span: int, offset: int,
                   dialect: str = "spark") -> str:
    """Deterministic millidegree coordinate from doc_id: hash-uniform
    over [-offset, span-offset)."""
    h = sql_hash60(f"'{seed}:' || cast(doc_id as string)", dialect)
    return f"(({h}) % {span} - {offset})"


def sql_mdeg_str(v: str) -> str:
    """Format a millidegree integer as a 3-decimal degree string
    ("-0.500") with pure integer arithmetic — identical output in both
    engines (printf('%.3f', double) could round a near-thousandth
    differently)."""
    return (
        f"CASE WHEN ({v}) < 0 THEN '-' ELSE '' END"
        f" || cast(cast(floor(abs({v}) / 1000) as bigint) as string)"
        f" || '.' || lpad(cast(abs({v}) % 1000 as string), 3, '0')"
    )


def sql_geotagged_text(dialect: str = "spark") -> str:
    """documents.text with synthetic coordinate mentions appended:
    every doc one " geo:lat,lon" tag; every third doc a second tag;
    every fifth doc a two-decimal decoy pair the extractor must NOT
    match."""
    lat1 = sql_coord_mdeg("glat1", 120000, 60000, dialect)
    lon1 = sql_coord_mdeg("glon1", 360000, 180000, dialect)
    lat2 = sql_coord_mdeg("glat2", 120000, 60000, dialect)
    lon2 = sql_coord_mdeg("glon2", 360000, 180000, dialect)
    tag1 = (f"' geo:' || {sql_mdeg_str(lat1)} || ',' || "
            f"{sql_mdeg_str(lon1)}")
    tag2 = (f"' geo:' || {sql_mdeg_str(lat2)} || ',' || "
            f"{sql_mdeg_str(lon2)}")
    return (
        f"text || {tag1}"
        f" || CASE WHEN doc_id % 3 = 0 THEN {tag2} ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' id:12.34,56.78' ELSE '' END"
    )


def extract_coord_mentions(docs: DataFrame, text_col: str = "text",
                           key_col: str = "doc_id") -> DataFrame:
    """One row per plausible coordinate mention: (key, latm, lonm).

    Native expressions only — the regex runs inside the scan stage;
    explode is narrow. Mentions outside the plausible WGS84 window
    (|lat| > 90, |lon| >= 180) are dropped as parse noise."""
    lats = F.regexp_extract_all(F.col(text_col), F.lit(COORD_GROUP_RE), 1)
    lons = F.regexp_extract_all(F.col(text_col), F.lit(COORD_GROUP_RE), 2)
    pairs = F.explode(F.arrays_zip(lats.alias("la"), lons.alias("lo")))
    out = docs.select(F.col(key_col), pairs.alias("m")).select(
        key_col,
        F.round(F.col("m.la").cast("double") * 1000)
        .cast("bigint").alias("latm"),
        F.round(F.col("m.lo").cast("double") * 1000)
        .cast("bigint").alias("lonm"),
    )
    return out.filter((F.abs(F.col("latm")) <= 90000)
                      & (F.abs(F.col("lonm")) < 180000))


def geoparse_pip(spark: SparkSession, docs: DataFrame,
                 text_col: str = "text", key_col: str = "doc_id",
                 level: int = DEFAULT_COVER_LEVEL) -> DataFrame:
    """Mentions -> broadcast box-PIP -> per-polygon rollup:
    (polygon_id, zone, n_mentions, n_docs)."""
    mentions = extract_coord_mentions(docs, text_col, key_col)
    cover = build_cover_table(spark, level=level)
    hits = pip_join(mentions, cover, level=level)
    return hits.groupBy("polygon_id", "zone").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.countDistinct(key_col).alias("n_docs"),
    )
