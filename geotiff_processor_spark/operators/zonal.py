"""Zonal statistics (SURVEY.md J7): per-polygon aggregates over member pages.

PIP join (broadcast, no pages shuffle) then a single groupBy on
polygon_id — partial aggregation (map-side combine) means the shuffle
carries only |polygons| x |partitions| pre-aggregated rows, not pages.
Reference analog: the per-raster stats of /root/reference/helpers.py:81-138
computed per polygon instead of per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zonal_stats(pip_assignments: DataFrame) -> DataFrame:
    """Input: pip_join output (polygon_id, zone, url, lang, text, ...).

    Integer-exact aggregates (sum/count/min/max of bigints; single final
    division for the average) so the DuckDB oracle hash-matches.
    """
    return (
        pip_assignments.groupBy("polygon_id", "zone")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum(F.length("text")).alias("sum_text_chars"),
            F.min("lonm").alias("min_lonm"),
            F.max("latm").alias("max_latm"),
        )
        .withColumn(
            "avg_text_chars",
            F.round(F.col("sum_text_chars").cast("double")
                    / F.col("n_pages").cast("double"), 6),
        )
    )
