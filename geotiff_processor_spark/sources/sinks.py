"""Sinks (SURVEY.md §2.1 S7-S14): partitioned, sorted, idempotent writes.

The reference's GTiff exports map to partitioned parquet (Iceberg-style
hidden partitioning is the production target; this container has no
Iceberg runtime, so partitioned parquet with dynamic partition overwrite
gives the same idempotent per-partition commit semantics):

- S7/S8 (tiled GTiff, JPEG/DEFLATE)  -> ``write_tiles``: partitionBy
  (zoom) + sortWithinPartitions(tile_x, tile_y) + zstd — TILED=YES ≈
  partition/tile layout, codec choice ≈ parquet compression.
- S9 (TFW world-file sidecar)        -> ``write_georef_sidecar``: tiny
  per-map georeferencing table next to the data.
- S11 (JPEG preview, width=650)      -> ``write_preview``: the coarsest
  pyramid level as one small file per map.
- S13 (gdalinfo JSON)                -> lineage.partition_metrics
- S14 (quantities TXT)               -> ``write_quantities``
- A4 per-level persistence           -> ``write_pyramid``: one partition
  per overview factor, consumers prune to the coarsest sufficient level.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


DEFAULT_MAX_RECORDS_PER_FILE = 4_000_000


def write_tiles(tiles: DataFrame, path: str,
                max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE
                ) -> None:
    """Tile table sink: partition pruning on zoom, clustered tile order
    within files (deterministic layout — the reference's TILED=YES).

    ``maxRecordsPerFile`` is the S10 file-sizing control: the reference
    flips to BIGTIFF past 4 GB (storageRGB.py:48); here oversized
    partitions split into bounded parquet files instead.
    """
    (
        tiles.repartition("zoom")
        .sortWithinPartitions("tile_x", "tile_y")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy("zoom")
        .parquet(path)
    )


def write_pyramid(levels: dict[int, DataFrame], path: str,
                  max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE
                  ) -> None:
    """One partition per overview factor (helpers.py:62-70 analog).

    The directory partition carries the level — no ``level`` data column
    is written (a literal column would conflict with the partition
    schema Spark infers when reading the pyramid root)."""
    for factor, df in levels.items():
        (
            df.drop("level")
            .sortWithinPartitions("bx", "by")
            .write.mode("overwrite")
            .option("compression", "zstd")
            .option("maxRecordsPerFile", str(max_records_per_file))
            .parquet(os.path.join(path, f"level={factor}"))
        )


def read_pyramid_level(spark: SparkSession, path: str, factor: int) -> DataFrame:
    """Consumers read the coarsest sufficient level — partition pruning
    by construction (the reference's light-version trick)."""
    return spark.read.parquet(os.path.join(path, f"level={factor}"))


def write_georef_sidecar(spark: SparkSession, path: str, map_id: str,
                         gsd_m: float, origin_lonm: int,
                         origin_latm: int) -> None:
    """TFW analog (storageRGB.py:49): 6-value affine georeferencing."""
    rows = [(map_id, gsd_m, 0.0, 0.0, -gsd_m,
             origin_lonm / 1000.0, origin_latm / 1000.0)]
    df = spark.createDataFrame(
        rows, ["map_id", "px_w", "rot_x", "rot_y", "px_h",
               "origin_lon", "origin_lat"])
    df.coalesce(1).write.mode("overwrite").parquet(path)


def write_preview(coarse_level: DataFrame, path: str) -> None:
    """S11: the preview is the coarsest aggregate, one small file."""
    coarse_level.coalesce(1).write.mode("overwrite").parquet(path)


def write_quantities(breaks: list[float], path: str) -> None:
    """S14 (quantities.py:14-24): 7 comma-joined 6dp values."""
    with open(path, "w") as f:
        f.write(",".join(str(round(v, 6)) for v in breaks))
