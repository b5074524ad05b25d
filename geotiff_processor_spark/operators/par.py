"""Scale-adaptive parallelism for CPU-heavy map stages.

Spark sizes scan partitions by BYTES (spark.sql.files.maxPartitionBytes)
and AQE coalesces post-shuffle partitions by BYTES too — the right call
when cost tracks data volume. Digest/codec-heavy map work breaks that
assumption: a few MB of text can carry seconds of md5/regex/DP work per
task, so a byte-sized plan runs 1-2 tasks while the rest of the cluster
idles (measured round 6: winnow's window stage ran 2 tasks at local[32]).

``spread`` widens ONLY when the input's planned parallelism is below the
cluster's core count: at real scale (100 TB => millions of scan
partitions) it is a provable no-op, so it cannot be tuned-to-local —
the target derives from ``defaultParallelism``, never a constant.
The round-robin exchange it adds moves the raw rows once (small by
premise: the case it fires in is a byte-tiny input) and is deterministic
(Spark sorts before round-robin repartition, SPARK-23207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition ``df`` to ``factor`` x defaultParallelism tasks iff
    its current plan has fewer partitions — a no-op at scale.

    (A compressed-bytes floor was tried and REVERTED in round 6:
    parquet compression makes on-disk size a poor proxy for per-row
    CPU — the sf1 documents table is ~7 MB on disk yet carries tens of
    seconds of single-task digest work, and the sub-second jitter the
    floor targeted at tiny scale turned out to be window noise.)"""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
