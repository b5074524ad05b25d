"""SparkSession factory tuned for this engine.

Local-mode testing stands in for a multi-executor cluster: the same code
runs unchanged under ``spark-submit --py-files`` on a real cluster; the
confs below (AQE, skew-join, shuffle partitions sized to cores) are the
ones that matter at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "geotiff_processor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    AQE + skew-join are on (hot-cell skew handling), Arrow is on (all
    pandas UDFs are Arrow-vectorized), shuffle partitions default to the
    core count rather than 200 (local mode; a real cluster would size
    this to 2-3x total cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = master.split("[")[-1].rstrip("]")
        shuffle_partitions = int(n) if n.isdigit() else 32
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # resumable checkpoints overwrite only the partitions present in
        # the incremental write (Iceberg overwritePartitions semantics);
        # the static default would truncate the whole output path
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    return builder.getOrCreate()
