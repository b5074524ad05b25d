"""Per-partition lineage + metrics, checkpointed resume (north_rule).

Reference analogs: the gdalinfo JSON sink (/root/reference/gdalinfo.py:6-22
— per-output diagnostics) and the in-run processed-registry dict
(/root/reference/helpers.py:166-183 — dedup of already-done work).

Engine form:
- ``partition_metrics``: row-count + byte metrics per partition key —
  written next to every stage output so a 1000-executor run is auditable.
- ``checkpoint_write`` / ``resume_filter``: idempotent stage commits; on
  restart an anti-join against the completed-keys table skips finished
  partitions (resumable mid-tile-pyramid).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_metrics(df: DataFrame, key_cols: list[str],
                      bytes_col: str | None = None) -> DataFrame:
    """(key..., n_rows, n_bytes): byte size from an explicit payload
    column when given, else the whole-row approximation via to_json.

    The to_json fallback serializes every row — audit-grain tables
    only; ALWAYS pass bytes_col on a hot path."""
    size = (
        F.length(F.col(bytes_col)) if bytes_col is not None
        else F.length(F.to_json(F.struct(*df.columns)))
    )
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum(size).alias("n_bytes"))
    )


def checkpoint_write(df: DataFrame, out_dir: str, stage: str,
                     partition_cols: list[str]) -> DataFrame:
    """Stage output + completed-keys marker, both idempotent overwrites.

    Real deployment: Iceberg ``overwritePartitions``; here partitioned
    parquet with dynamic partition overwrite gives the same
    idempotent-per-partition semantics.

    The stage plan executes exactly ONCE (the data write); the done
    marker is derived from the COMMITTED files, not by re-running the
    plan, and doubles as the stronger invariant "marker keys == the
    partitions actually present on disk". Returns the committed stage
    as a DataFrame (explicit schema, so an empty first-run stage — zero
    data files — still reads back as an empty frame instead of failing
    parquet schema inference).
    """
    data_path = os.path.join(out_dir, stage)
    done_path = os.path.join(out_dir, f"{stage}__done")
    (
        df.write.mode("overwrite")
        # only the partitions in THIS write are replaced — a resumed
        # write must not truncate previously committed partitions
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(data_path)
    )
    committed = df.sparkSession.read.schema(df.schema).parquet(data_path)
    (
        # partition-column-only scan: file listing + footers, no row
        # groups — cheap even for a large committed stage
        committed.select(*partition_cols).distinct()
        .withColumn("stage", F.lit(stage))
        # append: earlier completed keys survive; completed_keys
        # dedupes on read
        .write.mode("append").parquet(done_path)
    )
    return committed


def completed_keys(spark: SparkSession, out_dir: str,
                   stage: str) -> DataFrame | None:
    done_path = os.path.join(out_dir, f"{stage}__done")
    try:
        return spark.read.parquet(done_path).distinct()
    except Exception:
        return None


def resume_filter(df: DataFrame, spark: SparkSession, out_dir: str,
                  stage: str, partition_cols: list[str]) -> DataFrame:
    """Anti-join away work whose partition already committed."""
    done = completed_keys(spark, out_dir, stage)
    if done is None:
        return df
    return df.join(
        F.broadcast(done.select(*partition_cols)),
        on=partition_cols, how="left_anti")
