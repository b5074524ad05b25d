"""Overview pyramid + resample-as-aggregate (SURVEY.md A4/A8).

The reference materializes AVERAGE-resampled overviews at factors
[2,4,8,16,32,64,128,256] (/root/reference/helpers.py:62-70,
params.py:27). Here each level is a groupBy over the previous level —
partial-aggregate reuse: level k+1 reads level k (4 rows in), never the
base raster. Carrying (sum, count) instead of avg keeps every level
exact under nodata holes (unequal block populations) and makes
avg-of-level == avg-of-base identically — the property the DuckDB
oracle checks.

At 100 TB each level would be written to its own partition
(``partitionBy('level')``) so consumers prune to the coarsest
sufficient level — the reference's "compute on the light version" trick
(process.py:251-273) for free via partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OVERVIEW_FACTORS = [2, 4, 8, 16, 32, 64, 128, 256]  # params.py:27


def _halve(level_df: DataFrame) -> DataFrame:
    return (
        level_df.groupBy(
            "map_id",
            F.expr("cast(floor(bx / 2) as bigint)").alias("bx"),
            F.expr("cast(floor(by / 2) as bigint)").alias("by"),
        )
        .agg(F.sum("s").alias("s"), F.sum("c").alias("c"))
    )


def build_pyramid(raster_valid: DataFrame, value_col: str = "elev_m",
                  factors: list[int] | None = None) -> dict[int, DataFrame]:
    """factor -> DataFrame(map_id, bx, by, s, c, avg_val).

    ``raster_valid`` must already be nodata-filtered (P6 semantics) and
    carry map_id, px, py, and an exact-summable value column.
    """
    factors = factors or OVERVIEW_FACTORS
    cur = raster_valid.select(
        "map_id",
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
        F.col(value_col).cast("bigint").alias("s"),
        F.lit(1).cast("bigint").alias("c"),
    )
    out: dict[int, DataFrame] = {}
    reached = 1
    for f in factors:
        while reached < f:
            cur = _halve(cur)
            reached *= 2
        out[f] = cur.withColumn(
            "avg_val",
            F.col("s").cast("double") / F.col("c").cast("double"))
    return out


def pyramid_level(raster_valid: DataFrame, factor: int,
                  value_col: str = "elev_m") -> DataFrame:
    """Single materialized level (iteratively halved from the base)."""
    return build_pyramid(raster_valid, value_col, factors=[factor])[factor]


def resample_aggregate(raster_valid: DataFrame, factor: int,
                       value_col: str = "elev_m") -> DataFrame:
    """Direct one-shot resample (A8: Warp xRes/yRes analog) — single
    groupBy on floor-divided pixel coords."""
    return (
        raster_valid.groupBy(
            "map_id",
            F.expr(f"cast(floor(px / {factor}) as bigint)").alias("bx"),
            F.expr(f"cast(floor(py / {factor}) as bigint)").alias("by"),
        )
        .agg(F.sum(F.col(value_col).cast("bigint")).alias("s"),
             F.count(F.lit(1)).alias("c"))
        .withColumn("avg_val",
                    F.col("s").cast("double") / F.col("c").cast("double"))
    )
